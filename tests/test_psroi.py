"""Deformable PSROI pooling sanity tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dcd_tpu.ops.psroi import deform_psroi_pooling

RNG = np.random.RandomState(0)


def test_constant_feature_pools_to_constant():
    B, H, W = 1, 16, 16
    out_dim, group, P = 4, 2, 4
    C = out_dim * group * group
    x = jnp.ones((B, H, W, C), jnp.float32) * 3.5
    rois = jnp.asarray([[0, 2, 2, 12, 12]], jnp.float32)
    out = deform_psroi_pooling(x, rois, None, 1.0, P, out_dim, group_size=group)
    assert out.shape == (1, P, P, out_dim)
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-5)


def test_position_sensitive_channels():
    """Each pooled bin reads its own channel group: fill group (0,0)'s
    channels with a unique value and check only the top-left bins see it."""
    out_dim, group, P = 2, 2, 4
    C = out_dim * group * group
    x = np.zeros((1, 16, 16, C), np.float32)
    x[..., 0:out_dim] = 7.0  # group (0, 0)
    out = np.asarray(
        deform_psroi_pooling(
            jnp.asarray(x), jnp.asarray([[0, 0, 0, 15, 15]], jnp.float32),
            None, 1.0, P, out_dim, group_size=group,
        )
    )[0]
    np.testing.assert_allclose(out[:2, :2], 7.0, rtol=1e-5)  # top-left bins
    np.testing.assert_allclose(out[2:, 2:], 0.0, atol=1e-6)  # bottom-right


def test_trans_shifts_sampling():
    """A gradient image pooled with a +x offset must increase."""
    out_dim, group, P = 1, 1, 2
    H = W = 20
    ramp = np.tile(np.arange(W, dtype=np.float32)[None, :, None], (H, 1, 1))
    x = jnp.asarray(ramp[None])
    rois = jnp.asarray([[0, 4, 4, 12, 12]], jnp.float32)
    base = np.asarray(deform_psroi_pooling(x, rois, None, 1.0, P, out_dim))
    trans = jnp.ones((1, P, P, 2), jnp.float32)  # shift +x, +y
    shifted = np.asarray(
        deform_psroi_pooling(x, rois, trans, 1.0, P, out_dim, trans_std=0.1)
    )
    assert (shifted > base + 1e-3).all()


def test_gradients_flow():
    out_dim, group, P = 2, 2, 4
    C = out_dim * group * group
    x = jnp.asarray(RNG.randn(1, 16, 16, C), jnp.float32)
    rois = jnp.asarray([[0, 1, 1, 14, 14]], jnp.float32)
    trans = jnp.asarray(RNG.randn(1, P, P, 2) * 0.1, jnp.float32)

    def loss(x, trans):
        return (deform_psroi_pooling(x, rois, trans, 1.0, P, out_dim, group, trans_std=0.1) ** 2).sum()

    gx, gt = jax.grad(loss, argnums=(0, 1))(x, trans)
    assert np.isfinite(np.asarray(gx)).all() and np.abs(np.asarray(gx)).max() > 0
    assert np.isfinite(np.asarray(gt)).all() and np.abs(np.asarray(gt)).max() > 0
