"""Deformable-conv tests mirroring the reference's two kernel checks
(DCNv2/DCN/testcuda.py): zero-offset equivalence to plain conv, and
gradient correctness by finite differences."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.test_util
import pytest

from dcd_tpu.ops.dcn import deform_conv2d

RNG = np.random.RandomState(7)


def _plain_conv(x, weight, stride=1, padding=1, dilation=1):
    return jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class TestZeroOffset:
    """check_zero_offset from testcuda.py:32: with zero offsets and unit
    masks, the deformable conv must equal a plain conv."""

    @pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1), (1, 2, 2)])
    def test_equals_conv(self, stride, padding, dilation):
        B, H, W, Cin, Cout = 2, 12, 16, 8, 16
        kh = kw = 3
        Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
        Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
        x = RNG.randn(B, H, W, Cin).astype(np.float32)
        w = RNG.randn(kh, kw, Cin, Cout).astype(np.float32) * 0.1
        offset = np.zeros((B, Ho, Wo, 2 * kh * kw), np.float32)
        mask = np.ones((B, Ho, Wo, kh * kw), np.float32)
        got = deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w),
            stride=stride, padding=padding, dilation=dilation,
        )
        want = _plain_conv(jnp.asarray(x), jnp.asarray(w), stride, padding, dilation)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_integer_shift_offset(self):
        """A constant integer offset must equal sampling a shifted image."""
        B, H, W, C = 1, 10, 10, 4
        x = RNG.randn(B, H, W, C).astype(np.float32)
        w = np.zeros((3, 3, C, C), np.float32)
        # identity kernel: only center tap, identity over channels
        w[1, 1] = np.eye(C)
        offset = np.zeros((B, H, W, 18), np.float32)
        offset[..., 2 * 4] = 0.0  # center tap dy
        offset[..., 2 * 4 + 1] = 1.0  # center tap dx: sample one to the right
        mask = np.ones((B, H, W, 9), np.float32)
        got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(w)))
        want = np.zeros_like(x)
        want[:, :, :-1] = x[:, :, 1:]  # shifted left by one (sampled right)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_half_mask_scales_output(self):
        B, H, W, C = 1, 6, 6, 4
        x = RNG.randn(B, H, W, C).astype(np.float32)
        w = RNG.randn(3, 3, C, 8).astype(np.float32)
        offset = np.zeros((B, H, W, 18), np.float32)
        full = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.ones((B, H, W, 9)), jnp.asarray(w))
        half = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), 0.5 * jnp.ones((B, H, W, 9)), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full), rtol=1e-4, atol=1e-5)


class TestGradients:
    """gradcheck from testcuda.py — finite differences in float64."""

    def test_gradcheck_all_inputs(self):
        with jax.enable_x64():
            rng = np.random.RandomState(1234)  # own stream: suite-order independent
            B, H, W, Cin, Cout = 1, 5, 6, 3, 4
            x = jnp.asarray(rng.randn(B, H, W, Cin))
            w = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.3)
            # keep sampling positions >= 0.2 away from integers: bilinear
            # sampling is non-differentiable at integer coords, which breaks
            # finite differences (the reference's gradcheck has the same
            # sensitivity)
            signs = rng.choice([-1.0, 1.0], (B, H, W, 18))
            offset = jnp.asarray(signs * rng.uniform(0.25, 0.45, (B, H, W, 18)))
            mask = jnp.asarray(rng.uniform(0.2, 0.9, (B, H, W, 9)))
            b = jnp.asarray(rng.randn(Cout) * 0.1)

            def f(x, offset, mask, w, b):
                return deform_conv2d(x, offset, mask, w, b)

            # rtol bounded by finite-difference truncation error (~1e-4)
            jax.test_util.check_grads(
                f, (x, offset, mask, w, b), order=1, modes=["rev"], atol=2e-3, rtol=2e-3
            )

    def test_grad_flows_to_offsets(self):
        B, H, W, C = 1, 6, 6, 4
        x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32))
        w = jnp.asarray(RNG.randn(3, 3, C, 4).astype(np.float32))
        offset = jnp.asarray(RNG.uniform(-0.4, 0.4, (B, H, W, 18)).astype(np.float32))
        mask = jnp.asarray(np.ones((B, H, W, 9), np.float32))
        g = jax.grad(lambda o: (deform_conv2d(x, o, mask, w) ** 2).sum())(offset)
        assert np.abs(np.asarray(g)).max() > 0


class TestPallasKernels:
    """The hand-written Pallas forward/backward kernels vs the XLA dense
    oracle, run in interpret mode on CPU (the same code compiles with
    Mosaic on TPU; tools/bench_dcn.py exercises it there). Backward
    covers all five cotangents incl. the clipped-offset regime (the TPU
    counterpart of the reference's col2im/col2im_coord CUDA backward,
    dcn_v2_cuda.cu:206-341)."""

    def _inputs(self, B, H, W, C, Cout, off_scale, seed=3):
        from dcd_tpu.ops.dcn import deform_conv2d_dense  # noqa: F401

        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        off = jnp.asarray((rng.randn(B, H, W, 18) * off_scale).astype(np.float32))
        mask = jax.nn.sigmoid(jnp.asarray(rng.randn(B, H, W, 9).astype(np.float32)))
        w = jnp.asarray((rng.randn(3, 3, C, Cout) * 0.1).astype(np.float32))
        b = jnp.asarray(rng.randn(Cout).astype(np.float32))
        return x, off, mask, w, b

    @pytest.mark.parametrize(
        "B,H,W,C,Cout,R,off_scale",
        [
            (2, 8, 16, 8, 12, 2, 0.9),   # plain
            (1, 8, 16, 8, 12, 2, 4.0),   # heavily clipped offsets
            (1, 10, 12, 4, 8, 1, 0.6),   # R=1, H not a tile multiple
        ],
    )
    def test_backward_matches_xla_oracle(self, B, H, W, C, Cout, R, off_scale):
        from dcd_tpu.ops import dcn_pallas
        from dcd_tpu.ops.dcn import deform_conv2d_dense

        x, off, mask, w, b = self._inputs(B, H, W, C, Cout, off_scale)
        g = jnp.asarray(
            np.random.RandomState(11).randn(B, H, W, Cout).astype(np.float32)
        )

        def f_d(x, off, mask, w, b):
            return deform_conv2d_dense(
                x, off, mask, w, b, stride=1, padding=1, radius=R
            )

        def f_p(x, off, mask, w, b):
            return dcn_pallas.deform_conv2d_pallas(x, off, mask, w, b, R, 4)

        out_d, vjp_d = jax.vjp(f_d, x, off, mask, w, b)
        out_p, vjp_p = jax.vjp(f_p, x, off, mask, w, b)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_d), rtol=1e-5, atol=1e-5
        )
        for name, a, want in zip(
            ["gx", "goff", "gmask", "gw", "gb"], vjp_p(g), vjp_d(g)
        ):
            scale = float(jnp.max(jnp.abs(want))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(want) / scale,
                rtol=2e-6, atol=2e-6, err_msg=name,
            )

    @pytest.mark.parametrize("layout", ["cw", "wc"])
    def test_layouts_match_dense(self, layout, monkeypatch):
        """Both walk layouts — 'cw' (round-4 channels-on-sublanes default)
        and 'wc' (the width-on-sublanes fallback incl. the lane-packed
        C==64 variant) — agree with the dense oracle fwd + bwd."""
        from dcd_tpu.ops import dcn_pallas
        from dcd_tpu.ops.dcn import deform_conv2d_dense

        monkeypatch.setattr(dcn_pallas, "_LAYOUT", layout)
        B, H, W, C, Cout, R = 1, 8, 12, 8, 8, 2
        x, off, mask, w, b = self._inputs(B, H, W, C, Cout, 0.9)
        g = jnp.asarray(
            np.random.RandomState(5).randn(B, H, W, Cout).astype(np.float32)
        )

        def f_d(*a):
            return deform_conv2d_dense(*a, stride=1, padding=1, radius=R)

        def f_p(*a):
            return dcn_pallas.deform_conv2d_pallas(*a, R, 4)

        out_d, vjp_d = jax.vjp(f_d, x, off, mask, w, b)
        out_p, vjp_p = jax.vjp(f_p, x, off, mask, w, b)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_d), rtol=1e-5, atol=1e-5)
        for a, want in zip(vjp_p(g), vjp_d(g)):
            scale = float(jnp.max(jnp.abs(want))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(want) / scale, rtol=2e-6, atol=2e-6
            )

    def test_backward_bf16_model_dtype(self):
        """The model-dtype path (bf16 x/mask/weight as under cfg.model.fp16)
        through the kernels' DMA staging + in-kernel casts, numerically
        checked against the fp32 XLA oracle with bf16-appropriate
        tolerances (ADVICE r3: this path was previously exercised only by
        the TPU throughput bench, which checks speed, not values)."""
        from dcd_tpu.ops import dcn_pallas
        from dcd_tpu.ops.dcn import deform_conv2d_dense

        B, H, W, C, Cout, R = 1, 8, 16, 8, 12, 2
        x, off, mask, w, b = self._inputs(B, H, W, C, Cout, 0.9)
        xb, mb, wb, bb = (t.astype(jnp.bfloat16) for t in (x, mask, w, b))
        g = jnp.asarray(
            np.random.RandomState(11).randn(B, H, W, Cout).astype(np.float32)
        ).astype(jnp.bfloat16)

        def f_d(x, off, mask, w, b):
            # oracle in fp32 on the bf16-rounded inputs
            return deform_conv2d_dense(
                x.astype(jnp.float32), off, mask.astype(jnp.float32),
                w.astype(jnp.float32), b.astype(jnp.float32),
                stride=1, padding=1, radius=R,
            )

        def f_p(x, off, mask, w, b):
            return dcn_pallas.deform_conv2d_pallas(x, off, mask, w, b, R, 4)

        out_d, vjp_d = jax.vjp(f_d, xb, off, mb, wb, bb)
        out_p, vjp_p = jax.vjp(f_p, xb, off, mb, wb, bb)
        np.testing.assert_allclose(
            np.asarray(out_p, np.float32), np.asarray(out_d, np.float32),
            rtol=2e-2, atol=2e-2,
        )
        for name, a, want in zip(
            ["gx", "goff", "gmask", "gw", "gb"],
            vjp_p(g.astype(out_p.dtype)), vjp_d(g.astype(jnp.float32)),
        ):
            scale = float(jnp.max(jnp.abs(np.asarray(want, np.float32)))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a, np.float32) / scale,
                np.asarray(want, np.float32) / scale,
                rtol=3e-2, atol=3e-2, err_msg=name,
            )

    @pytest.mark.parametrize("adaptive", [False, True])
    def test_packed_c64_matches_dense(self, adaptive):
        """The lane-packed (2 pixels / register) forward used for the C=64
        decoder modules is bit-compatible with the dense oracle, and the
        dispatching wrapper keeps the Pallas backward kernels correct on
        the packed path."""
        from dcd_tpu.ops import dcn_pallas
        from dcd_tpu.ops.dcn import deform_conv2d_dense

        B, H, W, C, Cout, R = 2, 8, 12, 64, 64, 3
        x, off, mask, w, b = self._inputs(B, H, W, C, Cout, 1.5)
        ref = deform_conv2d_dense(x, off, mask, w, b, stride=1, padding=1, radius=R)
        got = dcn_pallas._forward_pallas_p2(x, off, mask, w, b, R, 4, adaptive)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )

        g = jnp.asarray(
            np.random.RandomState(5).randn(B, H, W, Cout).astype(np.float32)
        )
        _, vjp_p = jax.vjp(
            lambda *a: dcn_pallas.deform_conv2d_pallas(*a, R, 4, adaptive),
            x, off, mask, w, b,
        )
        _, vjp_d = jax.vjp(
            lambda *a: deform_conv2d_dense(*a, stride=1, padding=1, radius=R),
            x, off, mask, w, b,
        )
        for name, a, want in zip(["gx", "goff", "gmask", "gw", "gb"], vjp_p(g), vjp_d(g)):
            scale = float(jnp.max(jnp.abs(want))) + 1e-9
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(want) / scale,
                rtol=2e-6, atol=2e-6, err_msg=name,
            )

    def test_xla_fallback_switch(self):
        from dcd_tpu.ops import dcn_pallas

        x, off, mask, w, b = self._inputs(1, 8, 16, 8, 8, 1.0)
        g = jnp.ones((1, 8, 16, 8), jnp.float32)

        def f(x, off, mask, w, b):
            return dcn_pallas.deform_conv2d_pallas(x, off, mask, w, b, 2, 4)

        _, vjp = jax.vjp(f, x, off, mask, w, b)
        got = vjp(g)
        prev = dcn_pallas.BACKWARD
        try:
            dcn_pallas.BACKWARD = "xla"
            _, vjp2 = jax.vjp(f, x, off, mask, w, b)
            want = vjp2(g)
        finally:
            dcn_pallas.BACKWARD = prev
        for a, bb in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-5, atol=2e-5)
