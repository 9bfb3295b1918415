"""Predictor detail tests: channel layout, edge-fusion scatter locality,
focal bias init."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.models.predictor import Converter_key2channel, Predictor


@pytest.fixture(scope="module")
def cfg():
    base = dgde_run_config()
    return dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        model=dataclasses.replace(
            base.model, head=dataclasses.replace(base.model.head, num_channel=16)
        ),
    )


def test_converter_layout(cfg):
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    # shipped DGDE layout (runs/DGDE.yaml:27-28)
    assert k2c("2d_dim") == slice(0, 4, 1)
    assert k2c("3d_offset") == slice(4, 6, 1)
    assert k2c("corner_offset") == slice(6, 26, 1)
    assert k2c("corner_uncertainty") == slice(26, 29, 1)
    assert k2c("3d_dim") == slice(29, 32, 1)
    assert k2c("ori_cls") == slice(32, 40, 1)
    assert k2c("ori_offset") == slice(40, 48, 1)
    assert k2c("depth") == slice(48, 49, 1)
    assert k2c("depth_uncertainty") == slice(49, 50, 1)
    assert k2c("extra_kpts_2d") == slice(50, 196, 1)
    assert k2c("extra_kpts_3d") == slice(196, 415, 1)
    total = sum(c for g in head.regression_channels for c in g)
    assert total == 415


def test_focal_bias_init(cfg):
    """Untrained heatmap must start near the focal prior p=0.01."""
    model = Predictor(cfg)
    H, W = 16, 24
    x = jnp.zeros((1, H, W, 8))
    L = (H + W) * 2
    v = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1, L, 2), jnp.int32),
                   jnp.ones((1,), jnp.int32), train=False)
    out = model.apply(v, x, jnp.zeros((1, L, 2), jnp.int32), jnp.ones((1,), jnp.int32), train=False)
    hm = np.asarray(out["cls"])
    np.testing.assert_allclose(hm, 0.01, atol=5e-3)


def test_edge_fusion_touches_only_ring(cfg):
    """With edge fusion enabled, changing edge_len must only affect outputs
    at ring positions."""
    model = Predictor(cfg)
    H, W = 16, 24
    L = (H + W) * 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, 8), jnp.float32)
    # ring along the top row
    idx = np.zeros((1, L, 2), np.int64)
    idx[0, :W, 0] = np.arange(W)
    idx[0, :W, 1] = 0
    v = model.init(jax.random.PRNGKey(1), x, jnp.asarray(idx), jnp.asarray([W], jnp.int32), train=False)

    out_full = model.apply(v, x, jnp.asarray(idx), jnp.asarray([W], jnp.int32), train=False)
    out_none = model.apply(v, x, jnp.asarray(idx), jnp.asarray([0], jnp.int32), train=False)

    # heatmap: rows below the ring identical, ring row may differ
    hm_f = np.asarray(out_full["cls"])[0]
    hm_n = np.asarray(out_none["cls"])[0]
    np.testing.assert_allclose(hm_f[1:], hm_n[1:], atol=1e-6)
    assert np.abs(hm_f[0] - hm_n[0]).max() > 0  # fusion actually did something

    # regression: only the 3d_offset channels at the ring may differ
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    r_f = np.asarray(out_full["reg"])[0]
    r_n = np.asarray(out_none["reg"])[0]
    sl = k2c("3d_offset")
    mask = np.ones(r_f.shape[-1], bool)
    mask[sl] = False
    np.testing.assert_allclose(r_f[..., mask], r_n[..., mask], atol=1e-6)
    np.testing.assert_allclose(r_f[1:, :, sl], r_n[1:, :, sl], atol=1e-6)


def test_lazy_topk_matches_dense(cfg):
    """The lazy top-K inference path (class + 3d_offset dense, every other
    regression group evaluated on 3x3 POI neighborhoods) must reproduce the
    dense path's POI rows exactly up to matmul association."""
    from dcd_tpu.ops.nms import nms_hm, select_point_of_interest, select_topk

    model = Predictor(cfg)
    B, H, W, C = 2, 16, 24, 8
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    L = (H + W) * 2
    ei = jnp.stack(
        [jnp.asarray(rng.randint(0, W, (B, L))), jnp.asarray(rng.randint(0, H, (B, L)))],
        axis=-1,
    )
    el = jnp.asarray([L - 3, L // 2], jnp.int32)
    v = model.init(jax.random.PRNGKey(0), x, ei, el, train=False)
    dense = model.apply(v, x, ei, el, train=False)
    lazy = model.apply(v, x, ei, el, train=False, lazy_topk=True)

    np.testing.assert_allclose(np.asarray(lazy["cls"]), np.asarray(dense["cls"]), atol=1e-6)
    K = cfg.test.detections_per_img
    scores, indexs, clses, ys, xs = select_topk(nms_hm(dense["cls"]), K=K)
    pois = select_point_of_interest(indexs, dense["reg"])
    np.testing.assert_allclose(np.asarray(lazy["scores"]), np.asarray(scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lazy["clses"]), np.asarray(clses), atol=0)
    np.testing.assert_allclose(
        np.asarray(lazy["points_xy"]),
        np.asarray(jnp.stack([xs, ys], axis=-1)), atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(lazy["reg_pois"]), np.asarray(pois), rtol=2e-5, atol=2e-5
    )
