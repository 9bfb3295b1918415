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


def test_onecycle_matches_reference_curve(cfg):
    """OneCycle LR + momentum curves must match the reference
    implementation (learning_schedules_fastai.py:61-85) executed directly
    with its FakeOptim. Skipped if /root/reference is absent."""
    import importlib
    import os
    import sys
    import types

    ref_dir = "/root/reference/DGDE/solver"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference tree not available")

    pkg = types.ModuleType("ref_solver_pkg")
    pkg.__path__ = [os.path.dirname(ref_dir)]
    sys.modules["ref_solver_pkg"] = pkg
    solver_pkg = types.ModuleType("ref_solver_pkg.solver")
    solver_pkg.__path__ = [ref_dir]
    sys.modules["ref_solver_pkg.solver"] = solver_pkg
    # fastai_optim does `from collections import Iterable` (py<=3.9);
    # the schedule module only references the OptimWrapper *name*
    fo = types.ModuleType("ref_solver_pkg.solver.fastai_optim")
    fo.OptimWrapper = type("OptimWrapper", (), {})
    sys.modules["ref_solver_pkg.solver.fastai_optim"] = fo
    lsf = importlib.import_module("ref_solver_pkg.solver.learning_schedules_fastai")

    from dcd_tpu.engine.solver import make_onecycle_schedules

    T, lr_max, moms, div, pct = 100, 3e-3, (0.95, 0.85), 10.0, 0.4
    c = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(
            cfg.solver, optimizer="adam_onecycle", base_lr=lr_max,
            max_iteration=T, moms=moms, div_factor=div, pct_start=pct,
        ),
    )
    lr_fn, mom_fn = make_onecycle_schedules(c)

    class FakeOptim:
        lr = 0.0
        mom = 0.0

    opt = FakeOptim()
    sched = lsf.OneCycle(opt, T, lr_max, list(moms), div, pct)
    ref_lr, ref_mom, our_lr, our_mom = [], [], [], []
    for i in range(T):
        sched.step(i)
        ref_lr.append(opt.lr)
        ref_mom.append(opt.mom)
        our_lr.append(float(lr_fn(i)))
        our_mom.append(float(mom_fn(i)))
    np.testing.assert_allclose(our_lr, ref_lr, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(our_mom, ref_mom, rtol=1e-4, atol=1e-9)


def test_onecycle_optimizer_steps(cfg):
    """adam_onecycle builds and the cycled momentum actually drives the
    update (inject_hyperparams path)."""
    c = dataclasses.replace(
        cfg,
        solver=dataclasses.replace(
            cfg.solver, optimizer="adam_onecycle", max_iteration=50,
        ),
    )
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    tx = build_optimizer(c, params, iters_per_epoch=10)
    state = tx.init(params)
    g = {"w": jnp.full((4, 4), 0.1), "bias": jnp.full((4,), 0.1)}
    for _ in range(5):
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    assert np.isfinite(np.asarray(params["w"])).all()
    lr0 = float(make_lr_schedule(c, 10)(0))
    np.testing.assert_allclose(lr0, c.solver.base_lr / c.solver.div_factor, rtol=1e-6)
