"""Dense (gather-free) deformable conv: equality with the gather reference
within the window radius, clamping semantics, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.ops.dcn import deform_conv2d, deform_conv2d_dense

RNG = np.random.RandomState(3)


def _inputs(B=2, H=10, W=14, C=8, Co=16, off_range=2.5):
    x = jnp.asarray(RNG.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(RNG.randn(3, 3, C, Co) * 0.1, jnp.float32)
    off = jnp.asarray(RNG.uniform(-off_range, off_range, (B, H, W, 18)), jnp.float32)
    mask = jnp.asarray(RNG.rand(B, H, W, 9), jnp.float32)
    b = jnp.asarray(RNG.randn(Co) * 0.1, jnp.float32)
    return x, off, mask, w, b


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1), (1, 2, 2)])
def test_matches_gather_within_radius(stride, padding, dilation):
    x, off, mask, w, b = _inputs()
    H, W = x.shape[1:3]
    kh = 3
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    off = off[:, :Ho, :Wo]
    mask = mask[:, :Ho, :Wo]
    want = deform_conv2d(x, off, mask, w, b, stride, padding, dilation)
    got = deform_conv2d_dense(x, off, mask, w, b, stride, padding, dilation, radius=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_clamping_matches_clipped_gather():
    x, _, mask, w, b = _inputs()
    off_big = jnp.asarray(RNG.uniform(-7, 7, (2, 10, 14, 18)), jnp.float32)
    want = deform_conv2d(x, jnp.clip(off_big, -3, 3), mask, w, b)
    got = deform_conv2d_dense(x, off_big, mask, w, b, radius=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_zero_offset_equals_conv():
    x, _, _, w, _ = _inputs()
    off = jnp.zeros((2, 10, 14, 18), jnp.float32)
    mask = jnp.ones((2, 10, 14, 9), jnp.float32)
    got = deform_conv2d_dense(x, off, mask, w, radius=2)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_gradients_flow_dense():
    x, off, mask, w, b = _inputs()

    def loss(off, x, w):
        return (deform_conv2d_dense(x, off, mask, w, b, radius=3) ** 2).sum()

    g_off, g_x, g_w = jax.grad(loss, argnums=(0, 1, 2))(off, x, w)
    for g in (g_off, g_x, g_w):
        arr = np.asarray(g)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0

    # dense gradients equal gather-path gradients inside the window
    def loss_ref(off, x, w):
        return (deform_conv2d(x, off, mask, w, b) ** 2).sum()

    r_off, r_x, r_w = jax.grad(loss_ref, argnums=(0, 1, 2))(off, x, w)
    np.testing.assert_allclose(np.asarray(g_off), np.asarray(r_off), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(r_x), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(r_w), rtol=1e-3, atol=1e-4)
