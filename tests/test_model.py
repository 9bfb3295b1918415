"""Backbone/head shape and sanity tests (small spatial sizes for CPU)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.models.detector import KeypointDetector
from dcd_tpu.models.dla import DLASeg
from dcd_tpu.models.layers import BilinearUp


@pytest.fixture(scope="module")
def small_cfg():
    cfg = dgde_run_config()
    return dataclasses.replace(
        cfg, input=dataclasses.replace(cfg.input, height_train=64, width_train=128)
    )


def test_bilinear_up_constant_preserved():
    """Upsampling a constant image must stay (almost) constant inside."""
    m = BilinearUp(2)
    x = jnp.ones((1, 6, 6, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 12, 12, 4)
    inner = np.asarray(y)[0, 2:-2, 2:-2]
    np.testing.assert_allclose(inner, 1.0, rtol=1e-5)


def test_bilinear_up_matches_torch_convtranspose():
    """Cross-check against torch's ConvTranspose2d with fill_up_weights."""
    import torch
    import math

    f = 2
    C = 3
    up = torch.nn.ConvTranspose2d(C, C, f * 2, stride=f, padding=f // 2, output_padding=0, groups=C, bias=False)
    # fill_up_weights (reference dla_dcn.py:386-395)
    w = up.weight.data
    fc = math.ceil(w.size(2) / 2)
    c = (2 * fc - 1 - fc % 2) / (2.0 * fc)
    for i in range(w.size(2)):
        for j in range(w.size(3)):
            w[0, 0, i, j] = (1 - math.fabs(i / fc - c)) * (1 - math.fabs(j / fc - c))
    for ch in range(1, w.size(0)):
        w[ch, 0] = w[0, 0]

    x = np.random.RandomState(0).randn(1, C, 7, 9).astype(np.float32)
    want = up(torch.from_numpy(x)).detach().numpy()  # NCHW

    m = BilinearUp(f)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    got = np.asarray(m.apply(params, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dlaseg_output_shape():
    model = DLASeg()
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 16, 32, 64)  # stride 4, 64 channels
    # parameter count should be in the DLA-34 ballpark (~15-20M)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    assert 14e6 < n_params < 22e6, n_params


def test_detector_forward_shapes(small_cfg):
    cfg = small_cfg
    model = KeypointDetector(cfg)
    B, H, W = 2, cfg.input.height_train, cfg.input.width_train
    Ho, Wo = H // 4, W // 4
    L = (Ho + Wo) * 2
    x = jnp.zeros((B, H, W, 3))
    edge_idx = jnp.zeros((B, L, 2), jnp.int32)
    edge_len = jnp.full((B,), L // 2, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, edge_idx, edge_len, train=False)
    out = model.apply(variables, x, edge_idx, edge_len, train=False)
    assert out["cls"].shape == (B, Ho, Wo, cfg.datasets.max_classes_num)
    total_reg = sum(c for g in cfg.model.head.regression_channels for c in g)
    assert total_reg == 4 + 2 + 20 + 3 + 3 + 16 + 1 + 1 + 146 + 219
    assert out["reg"].shape == (B, Ho, Wo, total_reg)
    assert np.all(np.asarray(out["cls"]) > 0) and np.all(np.asarray(out["cls"]) < 1)


def test_detector_train_mode_updates_batch_stats(small_cfg):
    cfg = small_cfg
    model = KeypointDetector(cfg)
    x = jnp.ones((1, cfg.input.height_train, cfg.input.width_train, 3))
    Ho, Wo = cfg.input.height_train // 4, cfg.input.width_train // 4
    L = (Ho + Wo) * 2
    edge_idx = jnp.zeros((1, L, 2), jnp.int32)
    edge_len = jnp.full((1,), 4, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, edge_idx, edge_len, train=True)
    out, mutated = model.apply(
        variables, x, edge_idx, edge_len, train=True, mutable=["batch_stats"]
    )
    # running stats must move away from init
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(old, new)]
    assert max(diffs) > 0


def test_offset_capture_tool(tiny_cfg_factory=None):
    """tools/offset_stats.collect_offsets must find every DCN module's
    offset conv; at zero init all offsets are exactly zero (so the default
    dense-window radius is trivially faithful at the start of training)."""
    import dataclasses
    import importlib.util
    import os

    import jax
    import jax.numpy as jnp

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.engine.train import create_train_state

    spec = importlib.util.spec_from_file_location(
        "offset_stats",
        os.path.join(os.path.dirname(__file__), "..", "tools", "offset_stats.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    base = dgde_run_config()
    cfg = dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        datasets=dataclasses.replace(base.datasets, max_objects=4),
        model=dataclasses.replace(
            base.model,
            head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=16),
            backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
        ),
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    H, W = cfg.input.height_train, cfg.input.width_train
    L = (H // 4 + W // 4) * 2
    offs = mod.collect_offsets(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.ones((1, H, W, 3), jnp.float32),
        jnp.zeros((1, L, 2), jnp.int32),
        jnp.ones((1,), jnp.int32),
    )
    # the DLA decoder carries 6 DCN modules (3 DLAUp nodes x proj+node
    # pairs + ida_up, reference dla_dcn.py:412-465)
    assert len(offs) >= 6, sorted(offs)
    for name, off in offs.items():
        assert off.shape[-1] == 18, (name, off.shape)
        assert float(np.abs(off).max()) == 0.0, name  # zero-init
    rows = mod.report(offs)
    assert all(r["frac>|3|"] == 0.0 for r in rows)
