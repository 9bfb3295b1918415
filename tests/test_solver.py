"""Solver/schedule tests: warmup curve, multistep decay, bias LR factor."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.engine.solver import build_optimizer, make_lr_schedule


@pytest.fixture()
def cfg():
    base = dgde_run_config()
    # warmup 10 steps, decay at epochs 2 and 3 with 5 iters/epoch
    return dataclasses.replace(
        base,
        solver=dataclasses.replace(
            base.solver, warmup_steps=10, decay_epoch_steps=(2.0, 3.0), base_lr=1e-3
        ),
    )


def test_warmup_cosine_shape(cfg):
    sched = make_lr_schedule(cfg, iters_per_epoch=5)
    lrs = [float(sched(t)) for t in range(12)]
    # cosine warmup: starts at eta_min = base/10, monotonic up to base
    assert abs(lrs[0] - 1e-4) < 1e-6
    assert all(b >= a - 1e-12 for a, b in zip(lrs[:10], lrs[1:10]))
    # warmup peaks just under base_lr (cosine reaches base at t==T, which is
    # already in the decayed main branch: step 10 >= decay step 2*5)
    assert 9e-4 < lrs[9] < 1e-3
    assert abs(lrs[10] - 1e-4) < 1e-6
    assert abs(lrs[11] - 1e-4) < 1e-6


def test_multistep_decay_and_floor(cfg):
    cfg2 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, lr_warmup=False, lr_clip=5e-5)
    )
    sched = make_lr_schedule(cfg2, iters_per_epoch=5)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(10)) - 1e-4) < 1e-9  # after epoch 2
    assert abs(float(sched(15)) - 5e-5) < 1e-9  # 1e-5 floored at lr_clip


def test_bias_lr_factor(cfg):
    """Bias params must receive 2x the LR of kernel params."""
    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
    }
    cfg2 = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(
            cfg.solver, lr_warmup=False, weight_decay=0.0, grad_norm_clip=-1.0
        ),
    )
    tx = build_optimizer(cfg2, params, iters_per_epoch=1000000)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    up_kernel = float(np.asarray(updates["dense"]["kernel"]).ravel()[0])
    up_bias = float(np.asarray(updates["dense"]["bias"]).ravel()[0])
    assert abs(up_bias / up_kernel - 2.0) < 1e-3, (up_bias, up_kernel)
