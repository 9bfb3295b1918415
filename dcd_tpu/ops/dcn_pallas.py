"""Pallas TPU kernel for the dense windowed deformable conv.

The XLA dense formulation (:func:`dcd_tpu.ops.dcn.deform_conv2d_dense`) is
correct but re-reads the input from HBM for every window term (~36 GB per
stride-4 module). Here each halo'd row-tile of x is staged once into VMEM
and the whole 9-tap x (2R+2)^2 window accumulation plus the tap-fused MXU
matmul run from on-chip memory.

Tiling: overlapping (TILE_H + 2R+3)-row windows of the padded input are
materialized by XLA as a (B, T, TH+halo, Wp, C) tensor (one extra
HBM-bandwidth copy, ~1.7x of x) so the standard Pallas pipeline — with its
automatic double-buffering — streams them; no manual DMA/semaphores needed.

Forward only; the op carries a custom VJP whose backward differentiates
the XLA dense formulation (identical math, so gradients agree with the
kernel's output).

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


def _kernel(x_ref, off_ref, mask_ref, w_ref, b_ref, out_ref, row_ref, acc_ref, *, R, TH, Wo, C, Cout, kh, kw, adaptive):
    # the x tile is staged fp32 regardless of model dtype: bf16's packed
    # (16,128) tiling has no dynamic sublane slicing; VPU FMAs run at fp32
    # rate either way, and the matmul casts down to the model dtype
    dtype = jnp.float32
    off = off_ref[0]  # (TH, Wo, 2K)
    msk = mask_ref[0]  # (TH, Wo, K)

    out_acc = jnp.zeros((TH * Wo, Cout), jnp.float32)
    K = kh * kw
    win = 2 * R + 2
    for k in range(K):
        i, j = divmod(k, kw)
        dy = jnp.clip(off[..., 2 * k], -R, R)
        dx = jnp.clip(off[..., 2 * k + 1], -R, R)
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
        # (adaptive=True gates each position on its weight plane being
        # nonzero via pl.when; measured slower in practice — the any()
        # reductions and predication overhead exceed the skipped work —
        # so it defaults off.)
        acc_ref[:] = jnp.zeros((TH, Wo, C), dtype)

        def a_body(ai, carry):
            a = ai - R  # window shift in [-R, R+1]
            wy = (
                jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            ).astype(dtype)
            y0 = (i - (kh // 2)) + a + R + 1

            def inner():
                row_ref[:] = jnp.zeros((TH, Wo, C), dtype)
                for bb in range(-R, R + 2):
                    wx = (
                        jnp.where(ix == bb, 1.0 - fx, 0.0)
                        + jnp.where(ix == bb - 1, fx, 0.0)
                    ).astype(dtype)
                    x0 = (j - (kw // 2)) + bb + R + 1

                    def fma():
                        row_ref[:] = (
                            row_ref[:]
                            + wx[..., None] * x_ref[0, 0, pl.ds(y0, TH), x0 : x0 + Wo, :]
                        )

                    if adaptive:
                        pl.when(jnp.any(wx > 0.0))(fma)
                    else:
                        fma()

                acc_ref[:] = acc_ref[:] + wy[..., None] * row_ref[:]

            if adaptive:
                pl.when(jnp.any(wy > 0.0))(inner)
            else:
                inner()

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


def _forward_pallas(x, offset, mask, weight, bias, radius: int, tile_h: int, adaptive: bool = False):
    B, H, W, C = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    assert Ho == H and Wo == W, "pallas path supports stride=1, padding=kh//2 only"
    R = radius
    halo = 2 * R + 3

    # lane alignment: pad channels to a 128 multiple (idle lanes otherwise)
    Cpad = ((C + 127) // 128) * 128

    def vmem_estimate(th: int) -> int:
        wp = W + halo
        x_tiles = 2 * (th + halo) * wp * Cpad * 4  # f32, double-buffered
        off = 2 * th * W * 2 * K * 4
        msk = 2 * th * W * K * 2
        out = 2 * th * W * Cout * 2
        scratch = 2 * th * W * Cpad * 4
        acc = th * W * Cout * 4
        return x_tiles + off + msk + out + scratch + acc

    TH = tile_h
    while Ho % TH != 0:
        TH //= 2
    # stay under the ~16MB scoped-VMEM budget with headroom for Mosaic's
    # stack (the stride-4 decoder level lands within 200KB of the limit
    # at TH=4 otherwise)
    # Mosaic's stack temporaries roughly double the modeled usage,
    # so the budget is conservative
    while TH > 1 and vmem_estimate(TH) > 6 * 1024 * 1024:
        TH //= 2
        while Ho % TH != 0 and TH > 1:
            TH //= 2
    assert TH >= 1
    T = Ho // TH
    xp = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (R + 1, R + 2), (R + 1, R + 2), (0, Cpad - C))
    )
    Wp = W + halo
    # overlapping row windows: (B, T, TH+halo, Wp, Cpad)
    tiles = jnp.stack([xp[:, t * TH : t * TH + TH + halo] for t in range(T)], axis=1)

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
            pl.BlockSpec(
                (1, 1, TH + halo, Wp, Cpad), lambda b, t: (b, t, 0, 0, 0), memory_space=pltpu.VMEM
            ),
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
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # row accumulator
            pltpu.VMEM((TH, Wo, Cpad), jnp.float32),  # window accumulator
        ],
    )(tiles, offset, mask, w_mat, bias_2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def deform_conv2d_pallas(x, offset, mask, weight, bias, radius: int = 3, tile_h: int = 8):
    """Stride-1 modulated deformable conv via the Pallas dense-window
    kernel. Numerics match :func:`deform_conv2d_dense` (same clamping)."""
    return _forward_pallas(x, offset, mask, weight, bias, radius, tile_h)


def _fwd(x, offset, mask, weight, bias, radius, tile_h):
    out = _forward_pallas(x, offset, mask, weight, bias, radius, tile_h)
    return out, (x, offset, mask, weight, bias)


def _bwd(radius, tile_h, res, g):
    x, offset, mask, weight, bias = res
    # identical math through XLA; autodiff gives the backward
    def f(x, offset, mask, weight, bias):
        return deform_conv2d_dense(
            x, offset, mask, weight, bias, stride=1, padding=weight.shape[0] // 2,
            dilation=1, radius=radius,
        )

    _, vjp = jax.vjp(f, x, offset, mask, weight, bias)
    return vjp(g)


deform_conv2d_pallas.defvjp(_fwd, _bwd)
