"""bf16 training numerics + pipeline determinism."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.target_encoder import collate, encode_targets
from dcd_tpu.engine.train import create_train_state, make_train_step


def _tiny_cfg(**model_kw):
    base = dgde_run_config()
    return dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        datasets=dataclasses.replace(base.datasets, max_objects=4),
        model=dataclasses.replace(
            base.model,
            head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=64),
            backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
            **model_kw,
        ),
    )


def test_bf16_train_step_finite():
    """fp16 flag (bf16 on TPU/CPU) must produce finite losses/grads with
    fp32 params."""
    cfg = _tiny_cfg(fp16=True)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    # params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.params))
    img, objs, calib = synthetic.make_scene(seed=0, num_objs=2, image_size=(90, 60))
    batch = collate([encode_targets(img, objs, calib, cfg)])
    step = jax.jit(make_train_step(cfg, model))
    state, logs = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    assert np.isfinite(float(logs["grad_norm"]))


def test_encode_deterministic():
    cfg = _tiny_cfg()
    img, objs, calib = synthetic.make_scene(seed=4, num_objs=3, image_size=(90, 60))
    a = encode_targets(img, objs, calib, cfg).targets
    b = encode_targets(img, objs, calib, cfg).targets
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_train_step_deterministic():
    cfg = _tiny_cfg()
    img, objs, calib = synthetic.make_scene(seed=1, num_objs=2, image_size=(90, 60))
    batch = collate([encode_targets(img, objs, calib, cfg)])

    def run():
        model, state = create_train_state(cfg, jax.random.PRNGKey(7))
        step = jax.jit(make_train_step(cfg, model))
        state, logs = step(state, batch)
        return float(logs["total_loss"])

    assert run() == run()
