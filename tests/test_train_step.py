"""Train-step tests: loss finiteness, gradient flow, overfit smoke,
and 8-virtual-device data-parallel sharding."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.target_encoder import collate, encode_targets
from dcd_tpu.engine.loss import compute_losses
from dcd_tpu.engine.train import create_train_state, make_train_step
from dcd_tpu.parallel import make_mesh, shard_batch, replicate


@pytest.fixture(scope="module")
def cfg():
    base = dgde_run_config()
    return dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        datasets=dataclasses.replace(base.datasets, max_objects=6),
        model=dataclasses.replace(
            base.model,
            head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=64),
            backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
        ),
    )


def _make_batch(cfg, n=2, seed0=0):
    samples = []
    for s in range(n):
        img, objs, calib = synthetic.make_scene(seed=seed0 + s, num_objs=3, image_size=(90, 60))
        samples.append(encode_targets(img, objs, calib, cfg, img_id=f"{s:06d}"))
    return collate(samples)


@pytest.fixture(scope="module")
def setup(cfg):
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = _make_batch(cfg)
    return model, state, batch


def test_loss_finite_and_positive(cfg, setup):
    model, state, batch = setup
    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["images"], batch["edge_indices"], batch["edge_len"], train=False,
    )
    total, loss_dict, log_dict = compute_losses(cfg, preds, batch)
    assert np.isfinite(float(total))
    for k, v in loss_dict.items():
        assert np.isfinite(float(v)), k
    expected = {
        "hm_loss", "bbox_loss", "depth_loss", "offset_loss", "orien_loss", "dims_loss",
        "corner_loss", "keypoint_loss", "keypoint_depth_loss", "trunc_offset_loss",
        "extra_kpts_2d_loss", "extra_kpts_3d_loss", "pairs_kpts_depth_loss",
    }
    assert set(loss_dict.keys()) == expected


def test_empty_batch_losses_finite(cfg, setup):
    """All-padding batch (no objects) must not produce NaNs."""
    model, state, batch = setup
    empty = {k: np.zeros_like(v) for k, v in batch.items()}
    empty["edge_len"] = batch["edge_len"]
    empty["edge_indices"] = batch["edge_indices"]
    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(empty["images"]), jnp.asarray(empty["edge_indices"]),
        jnp.asarray(empty["edge_len"]), train=False,
    )
    total, loss_dict, _ = compute_losses(cfg, preds, empty)
    assert np.isfinite(float(total))


def test_gradients_flow_and_finite(cfg, setup):
    model, state, batch = setup
    step = jax.jit(make_train_step(cfg, model))
    new_state, logs = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    assert np.isfinite(float(logs["grad_norm"])) and float(logs["grad_norm"]) > 0
    # every parameter leaf must receive a finite update
    deltas = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()), new_state.params, state.params)
    leaves = jax.tree.leaves(deltas)
    assert all(np.isfinite(l) for l in leaves)
    assert sum(1 for l in leaves if l > 0) > len(leaves) * 0.9


def test_overfit_smoke(cfg, setup):
    """30 steps on one batch: total loss must drop substantially."""
    model, state, batch = setup
    step = jax.jit(make_train_step(cfg, model))
    first = None
    last = None
    for i in range(30):
        state, logs = step(state, batch)
        v = float(logs["total_loss"])
        assert np.isfinite(v), (i, {k: float(x) for k, x in logs.items()})
        if first is None:
            first = v
        last = v
    assert last < first * 0.8, (first, last)


def test_data_parallel_8dev(cfg):
    """Same step on an 8-device mesh: runs, and matches single-device math."""
    assert jax.device_count() >= 8
    mesh = make_mesh(jax.devices()[:8])
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = _make_batch(cfg, n=8)
    step = jax.jit(make_train_step(cfg, model))

    sharded_batch = shard_batch(batch, mesh)
    sharded_state = replicate(state, mesh)
    new_state_sh, logs_sh = step(sharded_state, sharded_batch)

    new_state_1, logs_1 = step(state, batch)
    np.testing.assert_allclose(
        float(logs_sh["total_loss"]), float(logs_1["total_loss"]), rtol=2e-4
    )
    # params must stay in sync (replicated) after the update
    p_sh = jax.tree.leaves(new_state_sh.params)[0]
    p_1 = jax.tree.leaves(new_state_1.params)[0]
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_1), rtol=1e-3, atol=1e-5)


def test_grad_accum_matches_microbatch_oracle(cfg):
    """grad_accum_steps=2 must reproduce the manual composition exactly:
    grad on microbatch 0 with the incoming BN stats, grad on microbatch 1
    with the updated stats, average the two grads, apply ONE optimizer
    update. (Full-batch-BN equivalence is NOT claimed — batch moments are
    per-microbatch, as the make_train_step docstring states; a tiny config
    makes that loss difference several percent, by design.)"""
    from dcd_tpu.engine.train import create_train_state, make_grad_fn, make_train_step

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = _make_batch(cfg, n=4)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    cfg2 = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, grad_accum_steps=2)
    )
    step2 = jax.jit(make_train_step(cfg2, model))
    s2, logs2 = step2(state, batch)

    # oracle: same microbatch split as the scan (contiguous halves)
    grad_fn = jax.jit(make_grad_fn(cfg, model))
    mb0 = {k: v[:2] for k, v in batch.items()}
    mb1 = {k: v[2:] for k, v in batch.items()}
    (t0, (bs1, _)), g0 = grad_fn(state.params, state.batch_stats, mb0)
    (t1, (bs2, _)), g1 = grad_fn(state.params, bs1, mb1)
    grads = jax.tree.map(lambda a, b: a / 2 + b / 2, g0, g1)
    oracle = state.apply_gradients(grads=grads, batch_stats=bs2)

    import optax

    np.testing.assert_allclose(
        float(logs2["total_loss"]), (float(t0) + float(t1)) / 2, rtol=1e-5
    )
    # the accumulated grads must equal the oracle's averaged grads
    np.testing.assert_allclose(
        float(logs2["grad_norm"]), float(optax.global_norm(grads)), rtol=1e-5
    )
    # BN running stats carry through the scan exactly (pure data path)
    for a, b in zip(
        jax.tree.leaves(s2.batch_stats), jax.tree.leaves(oracle.batch_stats)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
    # Params only loosely: Adam's first-step update for near-zero gradients
    # is sign(g)-like, so fusion-level (~1e-9) grad noise between the two
    # XLA programs flips it by up to ±lr on zero-init leaves. |Adam update|
    # <= ~lr, so the two programs can differ at most ~2*lr per element;
    # anything beyond that is a real accumulation bug.
    lr = float(logs2["lr"])
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(oracle.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2.5 * lr
        )
