"""Pallas TPU kernel for the dense windowed deformable conv.

The XLA dense formulation (:func:`dcd_tpu.ops.dcn.deform_conv2d_dense`) is
correct but re-reads the input from HBM for every window term (~36 GB per
stride-4 module). Here each halo'd row-tile of x is staged once into VMEM
and the whole 9-tap x (2R+2)^2 window accumulation plus the tap-fused MXU
matmul run from on-chip memory.

Tiling: overlapping (TILE_H + 2R+3)-row windows cannot be expressed as
non-overlapping BlockSpec blocks, so each kernel instance DMAs its own
halo'd window straight from the padded model-dtype array in HBM
(``pltpu.make_async_copy``) and casts it to an fp32 VMEM scratch. Earlier
rounds materialized the overlapping windows via XLA as a
(B, T, TH+halo, Wp, C) fp32 tensor instead; that cost ~5x the ideal HBM
traffic (fp32 copy write+read plus the overlap factor) and was the largest
single term of the model's bytes/image.

The op carries a custom VJP backed by two more Pallas kernels (the
TPU counterpart of the reference's col2im / col2im_coord CUDA backward,
dcn_v2_cuda.cu:206-341):

* ``_bwd_pom_kernel`` — grad_offset / grad_mask / grad_weight. Recomputes
  the per-tap sampled windows from the same halo'd x staging as forward
  (recompute-gather: cheaper than saving K x-sized col tensors), forms
  g @ W_k^T on the MXU, and reduces over lanes for the offset/mask grads.
  grad_weight accumulates across the sequential TPU grid into one block.
* ``_bwd_x_kernel`` — grad_x as a *transposed gather*: for input pixel q,
  every contribution comes from output positions p = q - delta with both
  the bilinear coefficient plane and the modulated cotangent evaluated at
  p — so a halo'd tile of (g, offset, mask) suffices and there are no
  scatters (SURVEY §7.3's recompute-gather plan).

Set ``dcd_tpu.ops.dcn_pallas.BACKWARD = "xla"`` to fall back to
differentiating the XLA dense formulation instead (identical math; used
as the oracle in tests).

Replaces the reference's CUDA im2col+GEMM pipeline
(dcn_v2_cuda.cu:43-165, dcn_v2_im2col_cuda.cu:25-55) as the
performance-critical kernel of the framework.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dcn import deform_conv2d_dense

# perf probes for tools/bench_dcn.py A/B attribution ONLY (wrong numerics):
#   "aligned_slice" — replace misaligned sublane slices with aligned ones
#   "const_coeff"   — replace bilinear coefficient planes with constants
# Never set in production; guarded by an env var so the default path is
# untouched.
import os as _os

_PROBE = _os.environ.get("DCD_DCN_PROBE", "")
if _PROBE:  # pragma: no cover - bench-only path
    import sys as _sys

    print(
        f"dcd_tpu WARNING: DCD_DCN_PROBE={_PROBE!r} is set — the p2 DCN "
        "kernels now compute DELIBERATELY WRONG numerics (A/B timing probes "
        "for tools/bench_dcn.py). Unset it for any real run.",
        file=_sys.stderr,
        flush=True,
    )

# forward walk data layout: "cw" (round-4 channels-on-sublanes kernel) or
# "wc" (the earlier width-on-sublanes kernels incl. the lane-packed C==64
# variant) — env-switchable for A/B timing on hardware
_LAYOUT = _os.environ.get("DCD_DCN_LAYOUT", "cw")


def _interpret() -> bool:
    # off-TPU the kernels run in Pallas interpret mode (slow but exact) so
    # the CPU test suite can cross-check them against the XLA oracle
    return jax.default_backend() != "tpu"


# backward implementation: "pallas" (hand kernels below) or "xla"
# (autodiff of the dense formulation; the oracle the kernels are tested
# against)
BACKWARD = "pallas"

# Mosaic's default scoped-VMEM limit is 16 MB out of the chip's 128 MB;
# the dense-window kernels are VMEM-hungry (halo'd x tiles + per-tap
# scratch + unrolled-loop stack), and bigger row tiles amortize the halo
# overlap of the staged tiles — so raise the limit and size the tile
# budgets against it. The budgets are *modeled* ref bytes; Mosaic's stack
# temporaries run ~2-3x the model (measured), hence budget << limit.
VMEM_LIMIT = 64 * 1024 * 1024
_FWD_BUDGET = 20 * 1024 * 1024
_BWD_BUDGET = 10 * 1024 * 1024
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _kernel(
    x_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref,
    acc_ref, xraw_ref, xf_ref, sem,
    *, R, TH, Wo, C, Cout, kh, kw, adaptive,
):
    # x stays in HBM at model dtype; the kernel DMAs its own halo'd row
    # window into VMEM (overlapping windows can't be expressed as
    # non-overlapping BlockSpec blocks, and materializing them via XLA
    # costs ~5x the ideal HBM traffic — measured the largest single term
    # of the model's bytes/image). The tile is then cast once to an fp32
    # scratch: bf16's packed (16,128) tiling has no dynamic sublane
    # slicing; VPU FMAs run at fp32 rate either way, and the matmul casts
    # down to the model dtype.
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    dma = pltpu.make_async_copy(x_hbm.at[b_ix, pl.ds(t_ix * TH, xraw_ref.shape[0])], xraw_ref, sem)
    dma.start()
    dma.wait()
    xf_ref[:] = xraw_ref[:].astype(jnp.float32)
    dtype = jnp.float32
    off = off_ref[0]  # (TH, Wo, 2K)
    msk = mask_ref[0]  # (TH, Wo, K)

    out_acc = jnp.zeros((TH * Wo, Cout), jnp.float32)
    K = kh * kw
    win = 2 * R + 2
    for k in range(K):
        i, j = divmod(k, kw)
        # keep the trailing singleton dim: (TH, Wo, 1) stays in the walk's
        # (sublane=Wo, lane-broadcast) layout, so the per-position coeff
        # planes multiply into the (TH, Wo, C) FMAs as native lane splats.
        # A 2-D (TH, Wo) intermediate puts Wo on lanes and costs Mosaic a
        # relayout per window position (measured: the walk's biggest term).
        dy = jnp.clip(off[:, :, 2 * k : 2 * k + 1], -R, R)
        dx = jnp.clip(off[:, :, 2 * k + 1 : 2 * k + 2], -R, R)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        # loop structure tuned to the tile layout (rows, Wp-sublanes,
        # C-lanes): the vertical shift loops with a *dynamic* row index
        # (untiled dim -> cheap), while the horizontal shifts are unrolled
        # with *static* sublane slices (dynamic sublane starts force
        # relayouts). Accumulation goes through VMEM scratch refs so
        # Mosaic's stack allocator doesn't keep every unrolled slice live
        # at once (which OOMs scoped VMEM).
        #
        # adaptive=True skips window positions whose bilinear weight plane
        # is all-zero in this tile, using *scalar* per-tile min/max bounds
        # of the integer offset parts: the vertical fori_loop gets
        # data-dependent trip bounds and each unrolled horizontal slice is
        # gated by a scalar pl.when. Trained offsets concentrate near zero
        # (the offset conv is zero-init), so typical tiles touch a handful
        # of the (2R+2)^2 positions instead of all of them. Correctness
        # never depends on the bounds — positions outside them have
        # identically zero coefficient planes. (Round-1's per-position
        # vector any() gating lost to its own reduction overhead; scalar
        # bounds amortize to 4 reductions per tap.)
        acc_ref[:] = jnp.zeros((TH, Wo, C), dtype)

        if adaptive:
            a_lo = jnp.min(iy).astype(jnp.int32)
            a_hi = jnp.max(iy).astype(jnp.int32) + 1
            b_lo = jnp.min(ix).astype(jnp.int32)
            b_hi = jnp.max(ix).astype(jnp.int32) + 1
        else:
            a_lo = b_lo = jnp.int32(-R)
            a_hi = b_hi = jnp.int32(R + 1)

        def a_body(ai, carry):
            a = ai - R  # window shift in [-R, R+1]
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ).astype(dtype)  # (TH, Wo, 1)
            y0 = (i - (kh // 2)) + a + R + 1

            def v_pass():
                # direct accumulation: the combined coefficient wy*wx is a
                # thin (TH, Wo, 1) product, so each window position costs
                # one thin multiply + one lane-broadcast FMA — no separate
                # row pass / zeroing / per-a merge (measured: coefficient
                # plumbing, not the FMAs, dominated the walk)
                for bb in range(-R, R + 2):
                    wx = (
                        jnp.where(ix == bb, 1.0 - fx, 0.0)
                        + jnp.where(ix == bb - 1, fx, 0.0)
                    ).astype(dtype)  # (TH, Wo, 1)
                    x0 = (j - (kw // 2)) + bb + R + 1

                    def fma():
                        acc_ref[:] = (
                            acc_ref[:]
                            + (wy * wx) * xf_ref[pl.ds(y0, TH), x0 : x0 + Wo, :]
                        )

                    if adaptive:
                        pl.when((bb >= b_lo) & (bb <= b_hi))(fma)
                    else:
                        fma()

            # the loop keeps *static* trip bounds (dynamic trip counts stop
            # Mosaic unrolling the body — measured slower than no gating at
            # all); skipping happens via the scalar predicate instead
            if adaptive:
                pl.when((a >= a_lo) & (a <= a_hi))(v_pass)
            else:
                v_pass()
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)
        acc = acc_ref[:] * msk[..., k : k + 1].astype(dtype)
        mat_dtype = w_ref.dtype
        out_acc = out_acc + jnp.dot(
            acc.reshape(TH * Wo, C).astype(mat_dtype),
            w_ref[pl.ds(k * C, C), :],
            preferred_element_type=jnp.float32,
        )

    out = out_acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(TH, Wo, Cout).astype(out_ref.dtype)


def _kernel_p2(
    xe_hbm, xo_hbm, off_e_ref, off_o_ref, mask_e_ref, mask_o_ref, w_ref, b_ref,
    out_ref, acc_ref, xe_raw, xo_raw, xe_f, xo_f, sems,
    *, R, TH, G2, Cout, kh, kw, adaptive,
):
    """Lane-packed (pack=2) variant of :func:`_kernel` for C == 64.

    At C=64 the plain kernel pads channels to the 128-lane register and
    idles half the VPU on every window FMA — and the C=64 modules are the
    decoder's *hottest* (the two final-IDAUp node convs run at the full
    stride-4 96x320 map). Packing two horizontally adjacent pixels into
    one 128-lane register (lanes [0:64] = even pixel, [64:128] = odd)
    halves the FMA and VMEM-read work of the window walk.

    Two packed stagings of x cover both parities of the window shift
    (xe[g] = pixels (2g, 2g+1); xo[g] = (2g+1, 2g+2)); the shift parity is
    static, so each unrolled horizontal slice picks one of them. The
    bilinear coefficient / mask planes are built per parity and joined on
    the lane dim; the tap matmul uses a block-diagonal kron(I2, W_k) so
    both packed halves contract in one MXU call.
    """
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    rows = xe_raw.shape[0]
    # both parity stagings stream from HBM in model dtype (see _kernel);
    # the two DMAs run concurrently on separate semaphores
    dma_e = pltpu.make_async_copy(xe_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], xe_raw, sems.at[0])
    dma_o = pltpu.make_async_copy(xo_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], xo_raw, sems.at[1])
    dma_e.start()
    dma_o.start()
    dma_e.wait()
    dma_o.wait()
    xe_f[:] = xe_raw[:].astype(jnp.float32)
    xo_f[:] = xo_raw[:].astype(jnp.float32)
    dtype = jnp.float32
    off_e = off_e_ref[0]  # (TH, G2, 2K)
    off_o = off_o_ref[0]
    msk_e = mask_e_ref[0]  # (TH, G2, K)
    msk_o = mask_o_ref[0]
    K = kh * kw
    win = 2 * R + 2

    def pack(pe, po):
        # pe/po arrive as (TH, G2, 1): single-lane arrays in the walk's
        # sublane-major layout, so the 64-lane broadcasts are native lane
        # splats (a 2-D (TH, G2) input would sit lane-major and need a
        # relayout per call — measured as the p2 walk's biggest term)
        return jnp.concatenate(
            [
                jnp.broadcast_to(pe, (TH, G2, 64)),
                jnp.broadcast_to(po, (TH, G2, 64)),
            ],
            axis=-1,
        )

    out_acc = jnp.zeros((TH * G2, 2 * Cout), jnp.float32)
    for k in range(K):
        i, j = divmod(k, kw)
        dy_e = jnp.clip(off_e[:, :, 2 * k : 2 * k + 1], -R, R)
        dx_e = jnp.clip(off_e[:, :, 2 * k + 1 : 2 * k + 2], -R, R)
        dy_o = jnp.clip(off_o[:, :, 2 * k : 2 * k + 1], -R, R)
        dx_o = jnp.clip(off_o[:, :, 2 * k + 1 : 2 * k + 2], -R, R)
        iy_e, ix_e = jnp.floor(dy_e), jnp.floor(dx_e)
        iy_o, ix_o = jnp.floor(dy_o), jnp.floor(dx_o)
        fy_e, fx_e = dy_e - iy_e, dx_e - ix_e
        fy_o, fx_o = dy_o - iy_o, dx_o - ix_o

        acc_ref[:] = jnp.zeros((TH, G2, 128), dtype)

        if adaptive:
            a_lo = jnp.minimum(jnp.min(iy_e), jnp.min(iy_o)).astype(jnp.int32)
            a_hi = jnp.maximum(jnp.max(iy_e), jnp.max(iy_o)).astype(jnp.int32) + 1
            b_lo = jnp.minimum(jnp.min(ix_e), jnp.min(ix_o)).astype(jnp.int32)
            b_hi = jnp.maximum(jnp.max(ix_e), jnp.max(ix_o)).astype(jnp.int32) + 1
        else:
            a_lo = b_lo = jnp.int32(-R)
            a_hi = b_hi = jnp.int32(R + 1)

        def a_body(ai, carry):
            a = ai - R
            # thin (TH, G2, 1) vertical weights per parity; combined with
            # the horizontal weights below so each window position costs
            # two thin multiplies + ONE pack + one FMA (the row-pass /
            # per-a wy pack / row zeroing structure measured as ~2/3 of
            # kernel time — see docs/PERF.md round 4)
            wy_e = (
                jnp.where(iy_e == a, 1.0 - fy_e, 0.0) + jnp.where(iy_e == a - 1, fy_e, 0.0)
            ).astype(dtype)
            wy_o = (
                jnp.where(iy_o == a, 1.0 - fy_o, 0.0) + jnp.where(iy_o == a - 1, fy_o, 0.0)
            ).astype(dtype)
            y0 = (i - (kh // 2)) + a + R + 1

            def v_pass():
                for bb in range(-R, R + 2):
                    if _PROBE == "const_coeff":
                        w2 = jnp.full((TH, G2, 128), 0.25, dtype)
                    else:
                        wx_e = (
                            jnp.where(ix_e == bb, 1.0 - fx_e, 0.0)
                            + jnp.where(ix_e == bb - 1, fx_e, 0.0)
                        ).astype(dtype)
                        wx_o = (
                            jnp.where(ix_o == bb, 1.0 - fx_o, 0.0)
                            + jnp.where(ix_o == bb - 1, fx_o, 0.0)
                        ).astype(dtype)
                        w2 = pack(wy_e * wx_e, wy_o * wx_o)
                    x0 = (j - (kw // 2)) + bb + R + 1
                    g0, par = divmod(x0, 2)
                    src = xo_f if par else xe_f
                    if _PROBE == "aligned_slice":
                        g0 = 0

                    def fma():
                        acc_ref[:] = (
                            acc_ref[:]
                            + w2 * src[pl.ds(y0, TH), g0 : g0 + G2, :]
                        )

                    if adaptive:
                        pl.when((bb >= b_lo) & (bb <= b_hi))(fma)
                    else:
                        fma()

            if adaptive:
                pl.when((a >= a_lo) & (a <= a_hi))(v_pass)
            else:
                v_pass()
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)
        acc = acc_ref[:] * pack(
            msk_e[:, :, k : k + 1].astype(dtype), msk_o[:, :, k : k + 1].astype(dtype)
        )
        mat_dtype = w_ref.dtype
        out_acc = out_acc + jnp.dot(
            acc.reshape(TH * G2, 128).astype(mat_dtype),
            w_ref[pl.ds(k * 128, 128), :],
            preferred_element_type=jnp.float32,
        )

    out = out_acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(TH, G2, 2 * Cout).astype(out_ref.dtype)


def _kernel_cw(
    x_hbm, off_ref, mask_ref, w_ref, b_ref, out_ref,
    acc_ref, xraw_ref, sem,
    *, R, TH, Wo, C, Cout, kh, kw, adaptive,
):
    """Channels-on-sublanes / width-on-lanes walk (round-4 layout).

    Why this layout: the bilinear coefficient planes are per-*pixel* values
    shared across channels. With width on lanes they are 2-D lane-major
    arrays (a few vregs) and broadcast along the channel sublanes natively;
    with channels on lanes (the previous layout) every coefficient plane
    had to be materialized at (TH, W, C) size — measured at ~2/3 of kernel
    time (docs/PERF.md round 4). Horizontal window shifts become lane
    slices, vertical shifts stay dynamic row indexing, and one kernel now
    serves every channel width (the even/odd lane-packed C==64 variant and
    its dual staging are gone).

    The window DMA stays single-buffered (start + wait before the walk):
    at the hot s4 level the window is ~1 MB against ~250 us of walk per
    tile — the transfer is ~4% of step time at the measured 429 GB/s, so
    a manual double-buffer (r3 ADVICE #1) is not worth its scratch cost
    in the new layout.

    The walk runs in the MODEL dtype (round 5): the kernel is VMEM-
    bandwidth-bound on the acc read-modify-write + x reads, and the tap
    matmul casts the accumulator to the (bf16) weight dtype anyway, so a
    bf16 walk halves the dominant traffic at no extra output error of
    consequence (each output pixel sums <=4 bilinear terms per tap; the
    coefficient product is still formed in fp32 from the fp32 offsets).
    fp32 inputs keep an exact fp32 walk — the CPU/interpret oracle tests
    are unaffected.
    """
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b_ix, pl.ds(t_ix * TH, xraw_ref.shape[0])], xraw_ref, sem
    )
    dma.start()
    dma.wait()
    xf_ref = xraw_ref  # walk directly on the staged model-dtype window
    dtype = xraw_ref.dtype
    off = off_ref[0]  # (TH, 2K, Wp) — W on lanes
    msk = mask_ref[0]  # (TH, K, Wp)

    K = kh * kw
    win = 2 * R + 2
    out_acc = jnp.zeros((TH * Wo, Cout), jnp.float32)
    for k in range(K):
        i, j = divmod(k, kw)
        # 2-D lane-major coefficient math: (TH, Wo) arrays are ~Wo/128
        # vregs per row — two orders of magnitude cheaper than plane ops
        dy = jnp.clip(off[:, 2 * k, :Wo], -R, R)
        dx = jnp.clip(off[:, 2 * k + 1, :Wo], -R, R)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        acc_ref[:] = jnp.zeros((TH, C, Wo), dtype)

        if adaptive:
            a_lo = jnp.min(iy).astype(jnp.int32)
            a_hi = jnp.max(iy).astype(jnp.int32) + 1
            b_lo = jnp.min(ix).astype(jnp.int32)
            b_hi = jnp.max(ix).astype(jnp.int32) + 1
        else:
            a_lo = b_lo = jnp.int32(-R)
            a_hi = b_hi = jnp.int32(R + 1)

        # the sigmoid mask is per-pixel like the bilinear weights: fold it
        # into the 2-D coefficient product instead of multiplying the full
        # (TH, C, Wo) accumulator (one 3-D multiply per tap saved)
        mk2 = msk[:, k, :Wo].astype(jnp.float32)

        def a_body(ai, carry):
            a = ai - R  # vertical shift in [-R, R+1]
            # fp32 (TH, Wo) coefficients — cheap 2-D; only the combined
            # product is cast to the walk dtype
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ) * mk2
            y0 = (i - (kh // 2)) + a + R + 1

            def v_pass():
                for bb in range(-R, R + 2):
                    wx = (
                        jnp.where(ix == bb, 1.0 - fx, 0.0)
                        + jnp.where(ix == bb - 1, fx, 0.0)
                    )
                    x0 = (j - (kw // 2)) + bb + R + 1

                    def fma():
                        # (TH, 1, Wo) coefficient broadcast along the C
                        # sublanes — native sublane splat, no relayout
                        if _PROBE == "const_coeff":
                            w2 = jnp.full((TH, 1, Wo), 0.25, dtype)
                        else:
                            w2 = (wy * wx)[:, None, :].astype(dtype)
                        y_sl = 0 if _PROBE == "aligned_slice" else y0
                        x_sl = 0 if _PROBE == "aligned_slice" else x0
                        acc_ref[:] = (
                            acc_ref[:]
                            + w2 * xf_ref[pl.ds(y_sl, TH), :, x_sl : x_sl + Wo]
                        )

                    if adaptive:
                        pl.when((bb >= b_lo) & (bb <= b_hi))(fma)
                    else:
                        fma()

            if adaptive:
                pl.when((a >= a_lo) & (a <= a_hi))(v_pass)
            else:
                v_pass()
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)
        acc = acc_ref[:]  # mask already folded into the walk coefficients
        mat_dtype = w_ref.dtype
        # contract channels: (TH, C, Wo) x (C, Cout) -> (TH, Wo, Cout);
        # lhs contracting dim is the sublane dim (the MXU's natural A^T B)
        tap = jax.lax.dot_general(
            acc.astype(mat_dtype), w_ref[pl.ds(k * C, C), :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TH, Wo, Cout)
        out_acc = out_acc + tap.reshape(TH * Wo, Cout)

    out = out_acc + b_ref[:].astype(jnp.float32)
    out_ref[0] = out.reshape(TH, Wo, Cout).astype(out_ref.dtype)


def _forward_pallas_cw(x, offset, mask, weight, bias, radius: int, tile_h: int, adaptive: bool):
    """Launcher for the channels-on-sublanes kernel (any C, stride 1)."""
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    halo = 2 * R + 3
    Cpad = -(-C // 8) * 8  # sublane alignment
    Wl = -(-(W + halo) // 128) * 128  # lane alignment of the staged width

    itemsize = jnp.dtype(x.dtype).itemsize

    def vmem_estimate(th: int) -> int:
        # model-dtype walk: one staged x window + a model-dtype accumulator
        x_stage = (th + halo) * Cpad * Wl * itemsize
        offs = 2 * th * 3 * K * Wl * 4
        acc = th * Cpad * Wo * itemsize
        out = 2 * th * Wo * Cout * 2
        return x_stage + offs + acc + out

    TH = _pick_tile_h(Ho, tile_h, vmem_estimate, budget=_FWD_BUDGET)
    T = Ho // TH

    # HBM operands in kernel layout: x (B, Hp, C, Wl), offsets (B, H, 2K, W),
    # mask (B, H, K, W) — one XLA transpose each, amortized across the walk
    xp = jnp.pad(x, ((0, 0), (R + 1, R + 2), (R + 1, Wl - (W + R + 1)), (0, Cpad - C)))
    xp = xp.transpose(0, 1, 3, 2)  # (B, Hp, Cpad, Wl)
    off_t = offset.transpose(0, 1, 3, 2)  # (B, H, 2K, W)
    msk_t = mask.transpose(0, 1, 3, 2)  # (B, H, K, W)

    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))
    w_mat = w_pad.reshape(K * Cpad, Cout)
    bias_2d = (bias if bias is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)

    kern = functools.partial(
        _kernel_cw, R=R, TH=TH, Wo=Wo, C=Cpad, Cout=Cout, kh=kh, kw=kw, adaptive=adaptive
    )
    return pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp (HBM; kernel DMAs windows)
            pl.BlockSpec((1, TH, 2 * K, W), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, K, W), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, TH, Wo, Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH, Cpad, Wo), x.dtype),  # window accumulator
            pltpu.VMEM((TH + halo, Cpad, Wl), x.dtype),  # x DMA landing
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(xp, off_t, msk_t, w_mat, bias_2d)


def _forward_pallas_p2(x, offset, mask, weight, bias, radius: int, tile_h: int, adaptive: bool):
    """Packed (2 pixels / 128-lane register) forward for C == 64, stride 1."""
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    assert C == 64 and Wo % 2 == 0
    R = radius
    halo = 2 * R + 3
    G2 = Wo // 2
    G = G2 + R + 1  # packed groups incl. horizontal halo

    itemsize = jnp.dtype(x.dtype).itemsize
    # packed-group dim padded to the 8-sublane tile so HBM DMA slices stay
    # aligned; computed up front so the VMEM model uses the real (aligned)
    # scratch widths (ADVICE r3: estimating with unaligned G undercounts)
    Gp = -(-G // 8) * 8

    def vmem_estimate(th: int) -> int:
        # raw + fp32 staging scratches for both parities (at the aligned
        # width the scratches are actually allocated with)
        x_stage = 2 * (th + halo) * Gp * 128 * (4 + itemsize)
        offs = 2 * 2 * th * G2 * 2 * K * 4
        msks = 2 * 2 * th * G2 * K * 4
        out = 2 * th * G2 * 128 * 2
        scratch = th * G2 * 128 * 4
        return x_stage + offs + msks + out + scratch

    TH = _pick_tile_h(Ho, tile_h, vmem_estimate, budget=_FWD_BUDGET)
    T = Ho // TH
    # padded at model dtype; halo'd windows are DMA'd from HBM by the
    # kernel itself (no materialized overlapping tiles).
    extra_w = (2 * Gp + 1) - (W + halo)
    xp = jnp.pad(x, ((0, 0), (R + 1, R + 2), (R + 1, R + 2 + max(extra_w, 0)), (0, 0)))
    Hp = xp.shape[1]
    # packed parities: xe[g] = pixels (2g, 2g+1), xo[g] = (2g+1, 2g+2)
    xe = xp[:, :, : 2 * Gp].reshape(B, Hp, Gp, 128)
    xo = xp[:, :, 1 : 1 + 2 * Gp].reshape(B, Hp, Gp, 128)

    off_e, off_o = offset[:, :, 0::2], offset[:, :, 1::2]
    msk_e, msk_o = mask[:, :, 0::2].astype(jnp.float32), mask[:, :, 1::2].astype(jnp.float32)

    wk = weight.reshape(K, C, Cout)
    eye2 = jnp.eye(2, dtype=weight.dtype)
    w_blk = jax.vmap(lambda w: jnp.kron(eye2, w))(wk).reshape(K * 128, 2 * Cout)
    b = bias if bias is not None else jnp.zeros((Cout,), x.dtype)
    bias_2d = jnp.concatenate([b, b]).reshape(1, 2 * Cout)

    kern = functools.partial(
        _kernel_p2, R=R, TH=TH, G2=G2, Cout=Cout, kh=kh, kw=kw, adaptive=adaptive
    )
    out_pk = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xe (HBM; kernel DMAs windows)
            pl.BlockSpec(memory_space=pl.ANY),  # xo
            pl.BlockSpec((1, TH, G2, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, G2, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, G2, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, G2, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # block-diag weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed bias
        ],
        out_specs=pl.BlockSpec(
            (1, TH, G2, 2 * Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ho, G2, 2 * Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH, G2, 128), jnp.float32),  # window accumulator
            pltpu.VMEM((TH + halo, Gp, 128), x.dtype),  # xe DMA landing
            pltpu.VMEM((TH + halo, Gp, 128), x.dtype),  # xo DMA landing
            pltpu.VMEM((TH + halo, Gp, 128), jnp.float32),  # xe fp32
            pltpu.VMEM((TH + halo, Gp, 128), jnp.float32),  # xo fp32
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(xe, xo, off_e, off_o, msk_e, msk_o, w_blk, bias_2d)
    # unpack lanes: (B, Ho, G2, 2*Cout) -> (B, Ho, Wo, Cout)
    return out_pk.reshape(B, Ho, G2, 2, Cout).reshape(B, Ho, Wo, Cout)


def _forward_pallas(x, offset, mask, weight, bias, radius: int, tile_h: int, adaptive: bool = False):
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    assert Ho == H and Wo == W, "pallas path supports stride=1, padding=kh//2 only"
    if _LAYOUT == "cw":
        return _forward_pallas_cw(x, offset, mask, weight, bias, radius, tile_h, adaptive)
    if C == 64 and Wo % 2 == 0:
        return _forward_pallas_p2(x, offset, mask, weight, bias, radius, tile_h, adaptive)
    R = radius
    halo = 2 * R + 3

    # lane alignment: pad channels to a 128 multiple (idle lanes otherwise)
    Cpad = ((C + 127) // 128) * 128

    itemsize = jnp.dtype(x.dtype).itemsize
    # width padded to the 8-sublane tile for aligned DMA slices; computed
    # up front so the VMEM model uses the real scratch width (ADVICE r3)
    Wp = -(-(W + halo) // 8) * 8

    def vmem_estimate(th: int) -> int:
        x_stage = (th + halo) * Wp * Cpad * (4 + itemsize)  # DMA landing + f32
        off = 2 * th * W * 2 * K * 4
        msk = 2 * th * W * K * 2
        out = 2 * th * W * Cout * 2
        scratch = th * W * Cpad * 4
        acc = th * W * Cout * 4
        return x_stage + off + msk + out + scratch + acc

    TH = tile_h
    while Ho % TH != 0:
        TH //= 2
    # stay under the ~16MB scoped-VMEM budget with headroom for Mosaic's
    # stack (the stride-4 decoder level lands within 200KB of the limit
    # at TH=4 otherwise)
    # Mosaic's stack temporaries roughly double the modeled usage,
    # so the budget is conservative
    while TH > 1 and vmem_estimate(TH) > _FWD_BUDGET:
        TH //= 2
        while Ho % TH != 0 and TH > 1:
            TH //= 2
    assert TH >= 1
    T = Ho // TH
    # padded at model dtype in HBM; the kernel DMAs halo'd row windows
    xp = jnp.pad(
        x, ((0, 0), (R + 1, R + 2), (R + 1, R + 2 + (Wp - (W + halo))), (0, Cpad - C))
    )

    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))
    w_mat = w_pad.reshape(K * Cpad, Cout)
    bias_2d = (bias if bias is not None else jnp.zeros((Cout,), x.dtype)).reshape(1, Cout)

    kern = functools.partial(
        _kernel, R=R, TH=TH, Wo=Wo, C=Cpad, Cout=Cout, kh=kh, kw=kw, adaptive=adaptive
    )
    grid = (B, T)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp (HBM; kernel DMAs windows)
            pl.BlockSpec((1, TH, Wo, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (1, TH, Wo, Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # window accumulator
            pltpu.VMEM((TH + halo, Wp, Cpad), x.dtype),  # x DMA landing
            pltpu.VMEM((TH + halo, Wp, Cpad), jnp.float32),  # x fp32
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(xp, offset, mask, w_mat, bias_2d)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _pick_tile_h(Ho: int, tile_h: int, vmem_estimate, budget: int = 6 * 1024 * 1024) -> int:
    TH = tile_h
    while Ho % TH != 0:
        TH //= 2
    while TH > 1 and vmem_estimate(TH) > budget:
        TH //= 2
        while Ho % TH != 0 and TH > 1:
            TH //= 2
    assert TH >= 1
    return TH


def _bwd_pom_kernel(
    x_hbm, off_ref, mask_ref, g_ref, w_ref,
    go_ref, gm_ref, gw_ref,
    row_ref, rgx_ref, s_ref, dsy_ref, dsx_ref, gwk_ref, xraw_ref, xf_ref, sem,
    *, R, TH, Wo, C, Cout, kh, kw,
):
    """grad_offset / grad_mask / grad_weight for one (batch, row-tile).

    Recomputes the per-tap sampled window s_k and its offset derivatives
    from the same halo'd x staging as the forward kernel (recompute-gather
    — the reference's col2im_coord kernel, dcn_v2_im2col_cuda.cu's
    gradient-weight/coord-weight kernels, does the same walk on CUDA).
    grad_weight accumulates across the sequential grid into one block.
    """
    dtype = jnp.float32
    # halo'd x window streamed from HBM by the kernel (see _kernel)
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    dma = pltpu.make_async_copy(x_hbm.at[b_ix, pl.ds(t_ix * TH, xraw_ref.shape[0])], xraw_ref, sem)
    dma.start()
    dma.wait()
    xf_ref[:] = xraw_ref[:].astype(jnp.float32)
    off = off_ref[0]  # (TH, Wo, 2K)
    msk = mask_ref[0]  # (TH, Wo, K)
    g2d = g_ref[0].astype(dtype).reshape(TH * Wo, Cout)
    K = kh * kw
    win = 2 * R + 2

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)

    # per-tap results are stored to single output lanes immediately —
    # keeping all 3K planes live to stack at the end blows Mosaic's
    # scoped-VMEM stack at the stride-4 level (measured 23M > 16M)
    for k in range(K):
        i, j = divmod(k, kw)
        dyr = off[..., 2 * k]
        dxr = off[..., 2 * k + 1]
        dy = jnp.clip(dyr, -R, R)
        dx = jnp.clip(dxr, -R, R)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        # cotangent through the tap weight: gW_k = g @ W_k^T — staged in
        # scratch so the unrolled tap loop doesn't keep K of these live
        # on Mosaic's stack
        gwk_ref[:] = jax.lax.dot_general(
            g2d, w_ref[pl.ds(k * C, C), :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TH, Wo, C)

        s_ref[:] = jnp.zeros((TH, Wo, C), dtype)
        dsy_ref[:] = jnp.zeros((TH, Wo, C), dtype)
        dsx_ref[:] = jnp.zeros((TH, Wo, C), dtype)

        def a_body(ai, carry):
            a = ai - R
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ).astype(dtype)
            gy = (
                jnp.where(iy == a, -1.0, 0.0) + jnp.where(iy == a - 1, 1.0, 0.0)
            ).astype(dtype)
            y0 = (i - (kh // 2)) + a + R + 1
            row_ref[:] = jnp.zeros((TH, Wo, C), dtype)
            rgx_ref[:] = jnp.zeros((TH, Wo, C), dtype)
            for bb in range(-R, R + 2):
                wx = (
                    jnp.where(ix == bb, 1.0 - fx, 0.0)
                    + jnp.where(ix == bb - 1, fx, 0.0)
                ).astype(dtype)
                gx = (
                    jnp.where(ix == bb, -1.0, 0.0)
                    + jnp.where(ix == bb - 1, 1.0, 0.0)
                ).astype(dtype)
                x0 = (j - (kw // 2)) + bb + R + 1
                xs = xf_ref[pl.ds(y0, TH), x0 : x0 + Wo, :]
                row_ref[:] = row_ref[:] + wx[..., None] * xs
                rgx_ref[:] = rgx_ref[:] + gx[..., None] * xs
            s_ref[:] = s_ref[:] + wy[..., None] * row_ref[:]
            dsy_ref[:] = dsy_ref[:] + gy[..., None] * row_ref[:]
            dsx_ref[:] = dsx_ref[:] + wy[..., None] * rgx_ref[:]
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)

        mk = msk[..., k].astype(dtype)
        gm_ref[0, :, :, k] = jnp.sum(s_ref[:] * gwk_ref[:], axis=-1).astype(gm_ref.dtype)
        # clip passes gradient on the closed interval (matches lax.min/max
        # VJP tie-breaking: both pick the first operand on equality)
        cy = ((dyr >= -R) & (dyr <= R)).astype(dtype)
        cx = ((dxr >= -R) & (dxr <= R)).astype(dtype)
        go_ref[0, :, :, 2 * k] = (
            cy * mk * jnp.sum(dsy_ref[:] * gwk_ref[:], axis=-1)
        ).astype(go_ref.dtype)
        go_ref[0, :, :, 2 * k + 1] = (
            cx * mk * jnp.sum(dsx_ref[:] * gwk_ref[:], axis=-1)
        ).astype(go_ref.dtype)

        colk = (s_ref[:] * mk[..., None]).reshape(TH * Wo, C)
        gwk = jax.lax.dot_general(
            colk, g2d, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, Cout)
        gw_ref[pl.ds(k * C, C), :] = gw_ref[pl.ds(k * C, C), :] + gwk


def _bwd_pom_kernel_cw(
    x_hbm, off_ref, mask_ref, g_ref, w_ref,
    go_ref, gm_ref, gw_ref,
    row_ref, rgx_ref, s_ref, dsy_ref, dsx_ref, xraw_ref, xf_ref, sem,
    *, R, TH, Wo, C, Cout, kh, kw, adaptive,
):
    """grad_offset / grad_mask / grad_weight, channels-on-sublanes layout.

    Same recompute-gather as :func:`_bwd_pom_kernel`, rebuilt for the
    round-4 layout (see :func:`_kernel_cw`): 2-D lane-major coefficient
    planes, sublane-splat broadcasts, and the per-tap channel reductions
    recast as MXU contractions — gm_k = sum_o (s_k W_k) ⊙ g, so no
    (TH, W, C)-sized gWk plane is ever materialized. Also adds the
    forward's adaptive scalar window gating (the v1 backward walked all
    (2R+2)^2 positions unconditionally).

    Unlike the forward, this walk stays in fp32 (round-5 measurement):
    a bf16 walk was ~50%% SLOWER here (the packed-sublane broadcast of the
    2-D coefficient planes relayouts per FMA) and broke grad_offset —
    dsy/dsx are differences of near-equal sampled rows, and bf16 rounding
    survives the cancellation (measured 0.59 rel err at C=256).
    """
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b_ix, pl.ds(t_ix * TH, xraw_ref.shape[0])], xraw_ref, sem
    )
    dma.start()
    dma.wait()
    xf_ref[:] = xraw_ref[:].astype(jnp.float32)
    dtype = jnp.float32
    off = off_ref[0]  # (TH, 2K, W) — W on lanes
    msk = mask_ref[0]  # (TH, K, W)
    g3 = g_ref[0].astype(jnp.float32)  # (TH, Wo, Cout)
    K = kh * kw
    win = 2 * R + 2

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        gw_ref[:] = jnp.zeros_like(gw_ref)

    for k in range(K):
        i, j = divmod(k, kw)
        dyr = off[:, 2 * k, :Wo]  # (TH, Wo) 2-D lane-major
        dxr = off[:, 2 * k + 1, :Wo]
        dy = jnp.clip(dyr, -R, R)
        dx = jnp.clip(dxr, -R, R)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        s_ref[:] = jnp.zeros((TH, C, Wo), dtype)
        dsy_ref[:] = jnp.zeros((TH, C, Wo), dtype)
        dsx_ref[:] = jnp.zeros((TH, C, Wo), dtype)

        if adaptive:
            a_lo = jnp.min(iy).astype(jnp.int32)
            a_hi = jnp.max(iy).astype(jnp.int32) + 1
            b_lo = jnp.min(ix).astype(jnp.int32)
            b_hi = jnp.max(ix).astype(jnp.int32) + 1
        else:
            a_lo = b_lo = jnp.int32(-R)
            a_hi = b_hi = jnp.int32(R + 1)

        def a_body(ai, carry):
            a = ai - R
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ).astype(dtype)[:, None, :]  # (TH, 1, Wo)
            gy = (
                jnp.where(iy == a, -1.0, 0.0) + jnp.where(iy == a - 1, 1.0, 0.0)
            ).astype(dtype)[:, None, :]
            y0 = (i - (kh // 2)) + a + R + 1

            def v_pass():
                row_ref[:] = jnp.zeros((TH, C, Wo), dtype)
                rgx_ref[:] = jnp.zeros((TH, C, Wo), dtype)
                for bb in range(-R, R + 2):
                    wx = (
                        jnp.where(ix == bb, 1.0 - fx, 0.0)
                        + jnp.where(ix == bb - 1, fx, 0.0)
                    ).astype(dtype)[:, None, :]
                    gx = (
                        jnp.where(ix == bb, -1.0, 0.0)
                        + jnp.where(ix == bb - 1, 1.0, 0.0)
                    ).astype(dtype)[:, None, :]
                    x0 = (j - (kw // 2)) + bb + R + 1

                    def fma():
                        xs = xf_ref[pl.ds(y0, TH), :, x0 : x0 + Wo]
                        row_ref[:] = row_ref[:] + wx * xs
                        rgx_ref[:] = rgx_ref[:] + gx * xs

                    if adaptive:
                        pl.when((bb >= b_lo) & (bb <= b_hi))(fma)
                    else:
                        fma()
                s_ref[:] = s_ref[:] + wy * row_ref[:]
                dsy_ref[:] = dsy_ref[:] + gy * row_ref[:]
                dsx_ref[:] = dsx_ref[:] + wy * rgx_ref[:]

            if adaptive:
                pl.when((a >= a_lo) & (a <= a_hi))(v_pass)
            else:
                v_pass()
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)

        # channel reductions as MXU contractions: qW = q @ W_k for each of
        # the three walk accumulators, then a lane (Cout) reduction against
        # the incoming cotangent — (TH, Wo, 1) results write natural
        # lane-slices of the NHWC outputs
        wk = w_ref[pl.ds(k * C, C), :]

        def reduce_against_g(q_ref):
            qW = jax.lax.dot_general(
                q_ref[:], wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TH, Wo, Cout)
            return jnp.sum(qW * g3, axis=-1, keepdims=True)  # (TH, Wo, 1)

        # fp32: these scale the fp32 reduce results feeding fp32 outputs
        mk = msk[:, k, :Wo].astype(jnp.float32)[:, :, None]  # (TH, Wo, 1)
        gm_ref[0, :, :, k : k + 1] = reduce_against_g(s_ref).astype(gm_ref.dtype)
        # clip passes gradient on the closed interval (matches lax.min/max
        # VJP tie-breaking: both pick the first operand on equality)
        cy = ((dyr >= -R) & (dyr <= R)).astype(jnp.float32)[:, :, None]
        cx = ((dxr >= -R) & (dxr <= R)).astype(jnp.float32)[:, :, None]
        go_ref[0, :, :, 2 * k : 2 * k + 1] = (
            cy * mk * reduce_against_g(dsy_ref)
        ).astype(go_ref.dtype)
        go_ref[0, :, :, 2 * k + 1 : 2 * k + 2] = (
            cx * mk * reduce_against_g(dsx_ref)
        ).astype(go_ref.dtype)

        # grad_weight: sum_{t,w} (mask * s)[t,c,w] g[t,w,o] -> (C, Cout),
        # accumulated across the sequential grid. Mosaic's matmul can't
        # contract two dims at once, so the row dim is an unrolled loop of
        # plain (C, Wo) @ (Wo, Cout) dots.
        mk_cw = msk[:, k, :Wo].astype(dtype)[:, None, :]  # (TH, 1, Wo)
        sm = s_ref[:] * mk_cw
        gwk = jnp.zeros((C, Cout), jnp.float32)
        for t in range(TH):
            gwk = gwk + jax.lax.dot_general(
                sm[t], g3[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        gw_ref[pl.ds(k * C, C), :] = gw_ref[pl.ds(k * C, C), :] + gwk


def _bwd_pom_cw(x, offset, mask, g, weight, radius: int, tile_h: int, adaptive: bool = True):
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    halo = 2 * R + 3
    Cpad = -(-C // 8) * 8
    Wl = -(-(W + halo) // 128) * 128
    itemsize = jnp.dtype(x.dtype).itemsize

    def vmem_estimate(th: int) -> int:
        x_stage = (th + halo) * Cpad * Wl * (4 + itemsize)
        offs = 2 * th * 3 * K * Wl * 4
        gt = 2 * th * Wo * Cout * 4
        outs = 2 * th * Wo * 3 * K * 4 + K * Cpad * Cout * 4
        scratch = 5 * th * Cpad * Wo * 4
        return x_stage + offs + gt + outs + scratch

    TH = _pick_tile_h(Ho, tile_h, vmem_estimate, budget=_BWD_BUDGET)
    T = Ho // TH
    xp = jnp.pad(x, ((0, 0), (R + 1, R + 2), (R + 1, Wl - (W + R + 1)), (0, Cpad - C)))
    xp = xp.transpose(0, 1, 3, 2)  # (B, Hp, Cpad, Wl)
    off_t = offset.transpose(0, 1, 3, 2)  # (B, H, 2K, W)
    msk_t = mask.transpose(0, 1, 3, 2)
    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))
    w_mat = w_pad.reshape(K * Cpad, Cout)

    kern = functools.partial(
        _bwd_pom_kernel_cw, R=R, TH=TH, Wo=Wo, C=Cpad, Cout=Cout, kh=kh, kw=kw,
        adaptive=adaptive,
    )
    go, gm, gw = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp (HBM; kernel DMAs windows)
            pl.BlockSpec((1, TH, 2 * K, W), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, K, W), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=[
            pl.BlockSpec((1, TH, Wo, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            # constant index map: persists across the sequential grid and
            # accumulates grad_weight
            pl.BlockSpec((K * Cpad, Cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ho, Wo, 2 * K), jnp.float32),
            jax.ShapeDtypeStruct((B, Ho, Wo, K), jnp.float32),
            jax.ShapeDtypeStruct((K * Cpad, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH, Cpad, Wo), jnp.float32),  # row (wx pass)
            pltpu.VMEM((TH, Cpad, Wo), jnp.float32),  # row (gx pass)
            pltpu.VMEM((TH, Cpad, Wo), jnp.float32),  # s_k
            pltpu.VMEM((TH, Cpad, Wo), jnp.float32),  # ds/ddy
            pltpu.VMEM((TH, Cpad, Wo), jnp.float32),  # ds/ddx
            pltpu.VMEM((TH + halo, Cpad, Wl), x.dtype),  # x DMA landing
            pltpu.VMEM((TH + halo, Cpad, Wl), jnp.float32),  # x fp32
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(xp, off_t, msk_t, g, w_mat)
    gw = gw.reshape(K, Cpad, Cout)[:, :C, :].reshape(kh, kw, C, Cout)
    return go, gm, gw


def _bwd_pom(x, offset, mask, g, weight, radius: int, tile_h: int):
    if _LAYOUT == "cw":
        return _bwd_pom_cw(x, offset, mask, g, weight, radius, tile_h)
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    halo = 2 * R + 3
    Cpad = ((C + 127) // 128) * 128
    Wp = -(-(W + halo) // 8) * 8  # 8-sublane aligned for DMA slices

    itemsize = jnp.dtype(x.dtype).itemsize

    def vmem_estimate(th: int) -> int:
        x_stage = (th + halo) * Wp * Cpad * (4 + itemsize)  # DMA landing + f32
        off = 2 * th * W * 2 * K * 4
        msk = 2 * th * W * K * 4
        gt = 2 * th * W * Cout * 4
        outs = 2 * th * W * (3 * K) * 4 + K * Cpad * Cout * 4
        scratch = 5 * th * W * Cpad * 4
        return x_stage + off + msk + gt + outs + scratch

    # tighter budget than forward: the backward carries ~3x the live
    # values (gWk/qk matmul results, three accumulators), which land on
    # Mosaic's stack on top of the modeled refs
    TH = _pick_tile_h(Ho, tile_h, vmem_estimate, budget=_BWD_BUDGET)
    T = Ho // TH
    # model-dtype padded x in HBM; kernel DMAs its halo'd window (width
    # padded to the 8-sublane tile for DMA slice alignment)
    xp = jnp.pad(
        x, ((0, 0), (R + 1, R + 2), (R + 1, R + 2 + (Wp - (W + halo))), (0, Cpad - C))
    )
    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))
    w_mat = w_pad.reshape(K * Cpad, Cout)

    kern = functools.partial(
        _bwd_pom_kernel, R=R, TH=TH, Wo=Wo, C=Cpad, Cout=Cout, kh=kh, kw=kw
    )
    go, gm, gw = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xp (HBM; kernel DMAs windows)
            pl.BlockSpec((1, TH, Wo, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, Cout), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=[
            pl.BlockSpec((1, TH, Wo, 2 * K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TH, Wo, K), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            # constant index map: the block persists across the sequential
            # grid and accumulates grad_weight
            pl.BlockSpec((K * Cpad, Cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ho, Wo, 2 * K), jnp.float32),
            jax.ShapeDtypeStruct((B, Ho, Wo, K), jnp.float32),
            jax.ShapeDtypeStruct((K * Cpad, Cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # row (wx pass)
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # row (gx pass)
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # s_k
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # ds/ddy
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # ds/ddx
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # gW_k
            pltpu.VMEM((TH + halo, Wp, Cpad), x.dtype),  # x DMA landing
            pltpu.VMEM((TH + halo, Wp, Cpad), jnp.float32),  # x fp32
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(xp, offset, mask, g, w_mat)
    gw = gw.reshape(K, Cpad, Cout)[:, :C, :].reshape(kh, kw, C, Cout)
    return go, gm, gw


def _bwd_x_kernel(
    g_hbm, off_hbm, mask_hbm, w_ref, gx_ref,
    tk_ref, acc_ref, graw_ref, gf_ref, off_ref, mask_ref, sems,
    *, R, TH, W, Wp, C, Cout, kh, kw,
):
    """grad_x for one (batch, row-tile), as a transposed gather.

    gx[q] = sum_k sum_{a,b} coeff_k,ab(p) * mask_k(p) * (g(p) @ W_k^T)
    at p = q - delta(a, b, tap) — coefficients and cotangents both live at
    the *source* position p, so a halo'd tile of (g, offset, mask) gives
    every contribution without scatters (the TPU answer to the reference's
    col2im scatter-add, dcn_v2_cuda.cu:291).

    t_k = mask_k * (g @ W_k^T) is recomputed per (tap, vertical shift)
    from just the TH source rows that shift touches: a whole-halo t_k
    materialized per unrolled tap keeps K large values live at once and
    blows Mosaic's scoped-VMEM stack (measured 26M > 16M); the per-shift
    matmul is (TH*Wp, Cout)x(Cout, C) — more MXU launches, far less live
    memory, and the kernel is VPU/VMEM-bound anyway.
    """
    dtype = jnp.float32
    K = kh * kw
    win = 2 * R + 2
    # halo'd (g, offset, mask) windows streamed from HBM by the kernel
    # (overlapping windows; see _kernel). g is cast once to fp32; offset
    # is fp32 already; mask is read through .astype at its use sites.
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    rows = graw_ref.shape[0]
    dma_g = pltpu.make_async_copy(g_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], graw_ref, sems.at[0])
    dma_o = pltpu.make_async_copy(off_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], off_ref, sems.at[1])
    dma_m = pltpu.make_async_copy(mask_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], mask_ref, sems.at[2])
    dma_g.start()
    dma_o.start()
    dma_m.start()
    dma_g.wait()
    dma_o.wait()
    dma_m.wait()
    gf_ref[:] = graw_ref[:].astype(jnp.float32)
    acc_ref[:] = jnp.zeros((TH, W, C), dtype)
    for k in range(K):
        i, j = divmod(k, kw)

        def a_body(ai, carry):
            a = ai - R
            # source rows p_y = q_y - (a + i - kh//2); halo'd arrays are
            # padded by R+2 on top, so the slice starts at
            y0 = (R + 2) - (a + i - (kh // 2))
            g_rows = gf_ref[pl.ds(y0, TH), :, :]
            tk_ref[:] = jax.lax.dot_general(
                g_rows.reshape(TH * Wp, Cout), w_ref[pl.ds(k * C, C), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(TH, Wp, C) * (
                mask_ref[pl.ds(y0, TH), :, k].astype(dtype)[..., None]
            )
            dyr = off_ref[pl.ds(y0, TH), :, 2 * k]  # (TH, Wp)
            dy = jnp.clip(dyr, -R, R)
            iy = jnp.floor(dy)
            fy = dy - iy
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ).astype(dtype)
            dxr = off_ref[pl.ds(y0, TH), :, 2 * k + 1]
            dx = jnp.clip(dxr, -R, R)
            ix = jnp.floor(dx)
            fx = dx - ix
            for bb in range(-R, R + 2):
                x0 = (R + 2) - (bb + j - (kw // 2))
                ixs = ix[:, x0 : x0 + W]
                fxs = fx[:, x0 : x0 + W]
                wxs = (
                    jnp.where(ixs == bb, 1.0 - fxs, 0.0)
                    + jnp.where(ixs == bb - 1, fxs, 0.0)
                ).astype(dtype)
                coef = wy[:, x0 : x0 + W] * wxs
                acc_ref[:] = acc_ref[:] + coef[..., None] * tk_ref[:, x0 : x0 + W, :]
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)
    gx_ref[0] = acc_ref[:].astype(gx_ref.dtype)


def _bwd_x_kernel_cw(
    g_hbm, off_hbm, mask_hbm, w_ref, gx_ref,
    tk_ref, acc_ref, graw_ref, gf_ref, off_ref, mask_ref, sems,
    *, R, TH, W, Wl, C, Cout, kh, kw, adaptive,
):
    """grad_x transposed gather, channels-on-sublanes layout.

    Same math as :func:`_bwd_x_kernel` (no scatters; coefficients and
    cotangents evaluated at the source position p = q - delta), with the
    round-4 layout: per (tap, shift) t_k = mask ⊙ (W_k g) lands directly
    in the (C, TH, W) accumulator layout via one MXU contraction, and the
    coefficient planes are cheap 2-D lane-major arrays. Adds the adaptive
    scalar gating (bounds over the whole staged offset tile — a superset
    of every shifted window, so gating is exact).

    Like _bwd_pom_kernel_cw this walk stays fp32 (round-5 measurement: a
    bf16 walk here was ~35%% slower — the packed-sublane coefficient
    broadcasts relayout per FMA — and added grad_x noise)."""
    K = kh * kw
    win = 2 * R + 2
    b_ix = pl.program_id(0)
    t_ix = pl.program_id(1)
    rows = graw_ref.shape[0]
    dma_g = pltpu.make_async_copy(g_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], graw_ref, sems.at[0])
    dma_o = pltpu.make_async_copy(off_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], off_ref, sems.at[1])
    dma_m = pltpu.make_async_copy(mask_hbm.at[b_ix, pl.ds(t_ix * TH, rows)], mask_ref, sems.at[2])
    dma_g.start()
    dma_o.start()
    dma_m.start()
    dma_g.wait()
    dma_o.wait()
    dma_m.wait()
    gf_ref[:] = graw_ref[:].astype(jnp.float32)
    dtype = jnp.float32
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for k in range(K):
        i, j = divmod(k, kw)
        wk = w_ref[pl.ds(k * C, C), :]  # (C, Cout)

        if adaptive:
            dy_all = jnp.clip(off_ref[:, 2 * k, :], -R, R)
            dx_all = jnp.clip(off_ref[:, 2 * k + 1, :], -R, R)
            a_lo = jnp.min(jnp.floor(dy_all)).astype(jnp.int32)
            a_hi = jnp.max(jnp.floor(dy_all)).astype(jnp.int32) + 1
            b_lo = jnp.min(jnp.floor(dx_all)).astype(jnp.int32)
            b_hi = jnp.max(jnp.floor(dx_all)).astype(jnp.int32) + 1
        else:
            a_lo = b_lo = jnp.int32(-R)
            a_hi = b_hi = jnp.int32(R + 1)

        def a_body(ai, carry):
            a = ai - R
            # source rows p_y = q_y - (a + i - kh//2); halo'd arrays are
            # padded by R+2 on top, so the slice starts at
            y0 = (R + 2) - (a + i - (kh // 2))

            def v_pass():
                g_rows = gf_ref[pl.ds(y0, TH), :, :]  # (TH, Cout, Wl)
                # t_k = mask ⊙ (W_k g): (C, TH, Wl) — matches acc layout;
                # the contraction accumulates fp32, the product lands in
                # the walk dtype
                tk_ref[:] = (
                    jax.lax.dot_general(
                        wk, g_rows, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    * mask_ref[pl.ds(y0, TH), k, :].astype(jnp.float32)[None, :, :]
                ).astype(dtype)
                dyr = off_ref[pl.ds(y0, TH), 2 * k, :]  # (TH, Wl)
                dy = jnp.clip(dyr, -R, R)
                iy = jnp.floor(dy)
                fy = dy - iy
                # fp32 2-D coefficients; only the combined product is cast
                wy = jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
                dxr = off_ref[pl.ds(y0, TH), 2 * k + 1, :]
                dx = jnp.clip(dxr, -R, R)
                ix = jnp.floor(dx)
                fx = dx - ix
                for bb in range(-R, R + 2):
                    x0 = (R + 2) - (bb + j - (kw // 2))

                    def fma():
                        ixs = ix[:, x0 : x0 + W]
                        fxs = fx[:, x0 : x0 + W]
                        wxs = (
                            jnp.where(ixs == bb, 1.0 - fxs, 0.0)
                            + jnp.where(ixs == bb - 1, fxs, 0.0)
                        )
                        coef = (wy[:, x0 : x0 + W] * wxs)[None, :, :].astype(dtype)
                        acc_ref[:] = acc_ref[:] + coef * tk_ref[:, :, x0 : x0 + W]

                    if adaptive:
                        pl.when((bb >= b_lo) & (bb <= b_hi))(fma)
                    else:
                        fma()

            if adaptive:
                pl.when((a >= a_lo) & (a <= a_hi))(v_pass)
            else:
                v_pass()
            return carry

        jax.lax.fori_loop(0, win, a_body, 0)
    gx_ref[0] = acc_ref[:].astype(gx_ref.dtype)


def _bwd_x_cw(x_shape, x_dtype, g, offset, mask, weight, radius: int, tile_h: int, adaptive: bool = True):
    B, H, W, C = x_shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    R = radius
    halo = 2 * R + 3
    Cpad = -(-C // 8) * 8
    Coutp = -(-Cout // 8) * 8
    Wl = -(-(W + halo) // 128) * 128
    g_itemsize = jnp.dtype(g.dtype).itemsize

    def vmem_estimate(th: int) -> int:
        hh = th + halo
        g_stage = hh * Coutp * Wl * (4 + g_itemsize)
        offs = hh * 3 * K * Wl * 4
        out = 2 * th * Cpad * W * 4
        scratch = Cpad * th * (Wl + W) * 4
        return g_stage + offs + out + scratch

    # the (1, Cpad, TH, W) output block puts TH on the sublane dim, so TH
    # must be a multiple of 8 (or the whole H) for the Mosaic block-shape
    # rule — pick the largest fitting candidate; if nothing fits the
    # budget, the smallest legal divisor is still strictly cheaper in VMEM
    # than full H, so degrade to that instead of blowing up the estimate
    TH = H
    for cand in (32, 24, 16, 8):
        if H % cand == 0 and vmem_estimate(cand) <= _BWD_BUDGET and cand <= max(tile_h, 8):
            TH = cand
            break
    else:
        for cand in (8, 16, 24, 32):
            if H % cand == 0:
                TH = cand
                break
    T = H // TH
    # sources padded (R+2) top/left, (R+1) bottom/right — the transpose of
    # the forward x padding; g zero-pads so out-of-range contributions
    # vanish (offset/mask pad values then irrelevant)
    pad = ((0, 0), (R + 2, R + 1), (R + 2, Wl - (W + R + 2)), (0, 0))
    # channel dims padded to the 8-sublane tile so the kernel's HBM window
    # DMAs slice full (aligned) dims
    K2p = -(-2 * K // 8) * 8
    Kp = -(-K // 8) * 8
    gp = jnp.pad(g, (pad[0], pad[1], pad[2], (0, Coutp - Cout))).transpose(0, 1, 3, 2)
    op = jnp.pad(offset, (pad[0], pad[1], pad[2], (0, K2p - 2 * K))).transpose(0, 1, 3, 2)
    mp = jnp.pad(mask, (pad[0], pad[1], pad[2], (0, Kp - K))).transpose(0, 1, 3, 2)
    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, Coutp - Cout)))
    w_mat = w_pad.reshape(K * Cpad, Coutp)

    kern = functools.partial(
        _bwd_x_kernel_cw, R=R, TH=TH, W=W, Wl=Wl, C=Cpad, Cout=Coutp, kh=kh, kw=kw,
        adaptive=adaptive,
    )
    gx = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # g (HBM; kernel DMAs windows)
            pl.BlockSpec(memory_space=pl.ANY),  # offset
            pl.BlockSpec(memory_space=pl.ANY),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec(
            (1, Cpad, TH, W), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Cpad, H, W), x_dtype),
        scratch_shapes=[
            pltpu.VMEM((Cpad, TH, Wl), jnp.float32),  # t_k for one shift
            pltpu.VMEM((Cpad, TH, W), jnp.float32),  # gx accumulator
            pltpu.VMEM((TH + halo, Coutp, Wl), g.dtype),  # g DMA landing
            pltpu.VMEM((TH + halo, Coutp, Wl), jnp.float32),  # g fp32
            pltpu.VMEM((TH + halo, K2p, Wl), offset.dtype),  # offset window
            pltpu.VMEM((TH + halo, Kp, Wl), mask.dtype),  # mask window
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(gp, op, mp, w_mat)
    return gx[:, :C].transpose(0, 2, 3, 1)  # (B, H, W, C)


def _bwd_x(x_shape, x_dtype, g, offset, mask, weight, radius: int, tile_h: int):
    if _LAYOUT == "cw":
        return _bwd_x_cw(x_shape, x_dtype, g, offset, mask, weight, radius, tile_h)
    B, H, W, C = x_shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    R = radius
    halo = 2 * R + 3
    Cpad = ((C + 127) // 128) * 128
    Wp = -(-(W + halo) // 8) * 8  # 8-sublane aligned for DMA slices
    g_itemsize = jnp.dtype(g.dtype).itemsize

    def vmem_estimate(th: int) -> int:
        hh = th + halo
        g_stage = hh * Wp * Cout * (4 + g_itemsize)
        off = hh * Wp * 2 * K * 4
        msk = hh * Wp * K * jnp.dtype(mask.dtype).itemsize
        out = 2 * th * W * Cpad * 4
        scratch = hh * Wp * Cpad * 4 + th * W * Cpad * 4
        return g_stage + off + msk + out + scratch

    TH = _pick_tile_h(H, tile_h, vmem_estimate, budget=_BWD_BUDGET)
    T = H // TH
    # sources padded (R+2) top/left, (R+1) bottom/right — the transpose of
    # the forward x padding. g pads with zeros so out-of-range
    # contributions vanish; offset/mask padding values are then irrelevant.
    # Right pad extends to the 8-aligned Wp; halo'd windows are DMA'd from
    # HBM by the kernel (no materialized overlapping tiles).
    pad = ((0, 0), (R + 2, R + 1), (R + 2, R + 1 + (Wp - (W + halo))), (0, 0))
    gp = jnp.pad(g, pad)
    op = jnp.pad(offset, pad)
    mp = jnp.pad(mask, pad)
    w_pad = jnp.pad(weight, ((0, 0), (0, 0), (0, Cpad - C), (0, 0)))
    w_mat = w_pad.reshape(K * Cpad, Cout)

    kern = functools.partial(
        _bwd_x_kernel, R=R, TH=TH, W=W, Wp=Wp, C=Cpad, Cout=Cout, kh=kh, kw=kw
    )
    gx = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # g (HBM; kernel DMAs windows)
            pl.BlockSpec(memory_space=pl.ANY),  # offset
            pl.BlockSpec(memory_space=pl.ANY),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, Cpad), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cpad), x_dtype),
        scratch_shapes=[
            pltpu.VMEM((TH, Wp, Cpad), jnp.float32),  # t_k rows for one shift
            pltpu.VMEM((TH, W, Cpad), jnp.float32),  # gx accumulator
            pltpu.VMEM((TH + halo, Wp, Cout), g.dtype),  # g DMA landing
            pltpu.VMEM((TH + halo, Wp, Cout), jnp.float32),  # g fp32
            pltpu.VMEM((TH + halo, Wp, 2 * K), offset.dtype),  # offset window
            pltpu.VMEM((TH + halo, Wp, K), mask.dtype),  # mask window
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(gp, op, mp, w_mat)
    return gx[..., :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def deform_conv2d_pallas(
    x, offset, mask, weight, bias, radius: int = 3, tile_h: int = 8, adaptive: bool = True
):
    """Stride-1 modulated deformable conv via the Pallas dense-window
    kernel. Numerics match :func:`deform_conv2d_dense` (same clamping).

    ``adaptive`` gates window positions on scalar per-tile offset bounds
    (identical output either way; faster when trained offsets are small)."""
    return _forward_pallas(x, offset, mask, weight, bias, radius, tile_h, adaptive)


def _fwd(x, offset, mask, weight, bias, radius, tile_h, adaptive):
    out = _forward_pallas(x, offset, mask, weight, bias, radius, tile_h, adaptive)
    return out, (x, offset, mask, weight, bias)


def _bwd(radius, tile_h, adaptive, res, g):
    x, offset, mask, weight, bias = res
    if BACKWARD != "pallas":
        # identical math through XLA; autodiff gives the backward (the
        # oracle the Pallas kernels are tested against)
        def f(x, offset, mask, weight, bias):
            return deform_conv2d_dense(
                x, offset, mask, weight, bias, stride=1,
                padding=weight.shape[0] // 2, dilation=1, radius=radius,
            )

        _, vjp = jax.vjp(f, x, offset, mask, weight, bias)
        return vjp(g)
    go, gm, gw = _bwd_pom(x, offset, mask, g, weight, radius, tile_h)
    gx = _bwd_x(x.shape, x.dtype, g, offset, mask, weight, radius, tile_h)
    gb = None if bias is None else jnp.sum(g, axis=(0, 1, 2)).astype(bias.dtype)
    return (
        gx,
        go.astype(offset.dtype),
        gm.astype(mask.dtype),
        gw.astype(weight.dtype),
        gb,
    )


deform_conv2d_pallas.defvjp(_fwd, _bwd)
