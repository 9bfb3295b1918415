"""Modulated deformable convolution (DCNv2) for TPU.

Replaces the reference's CUDA extension
(``DGDE/model/backbone/DCNv2/DCN/src/cuda/dcn_v2_cuda.cu:43-341`` and the
im2col kernels in ``dcn_v2_im2col_cuda.cu``) with a TPU-native formulation:

* **XLA path** (:func:`deform_conv2d`): per-tap bilinear gather x sigmoid-mask,
  accumulated through one MXU matmul per tap. The gather autodiffs into
  scatter-adds, so backward (= the reference's col2im / col2im_coord kernels,
  dcn_v2_cuda.cu:279-301) comes from ``jax.grad`` with identical math.
* **Pallas path** (:mod:`dcd_tpu.ops.dcn_pallas`): hand-tiled forward kernel
  for the inference hot loop.

Sampling semantics match ``dmcn_im2col_bilinear_cuda``
(dcn_v2_im2col_cuda.cu:25-55): zero padding outside the image, bilinear
interpolation with per-corner boundary masking.

Layout is NHWC (channels-last = TPU lane dimension). Offsets are (dy, dx)
pairs per kernel tap, ordered row-major over the kernel window — the same
channel layout the reference's offset-predicting conv produces
(DCN/dcn_v2.py:118-122 chunks conv output into o1, o2, mask).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_gather(
    x: jnp.ndarray,  # (B, H, W, C)
    pos_y: jnp.ndarray,  # (B, Ho, Wo)
    pos_x: jnp.ndarray,  # (B, Ho, Wo)
) -> jnp.ndarray:
    """Sample x at fractional positions with zero padding outside.

    Returns (B, Ho, Wo, C).
    """
    B, H, W, C = x.shape
    y0 = jnp.floor(pos_y)
    x0 = jnp.floor(pos_x)
    wy1 = pos_y - y0  # weight for y0+1
    wx1 = pos_x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = x.reshape(B, H * W, C)

    def corner(yc, xc, w):
        inb = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        idx = (yi * W + xi).reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx[:, :, None], axis=1)
        vals = vals.reshape(*yc.shape, C)
        w = jnp.where(inb, w, 0.0)
        return vals * w[..., None]

    out = (
        corner(y0, x0, wy0 * wx0)
        + corner(y0, x0 + 1, wy0 * wx1)
        + corner(y0 + 1, x0, wy1 * wx0)
        + corner(y0 + 1, x0 + 1, wy1 * wx1)
    )
    return out


def deform_conv2d(
    x: jnp.ndarray,  # (B, H, W, Cin)
    offset: jnp.ndarray,  # (B, Ho, Wo, 2*K) (dy, dx) per tap
    mask: jnp.ndarray,  # (B, Ho, Wo, K) post-sigmoid modulation
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,  # (Cout,)
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv, NHWC.

    Equivalent to ``_ext.dcn_v2_forward`` (src/cuda/dcn_v2_cuda.cu:43-165)
    with deformable_groups=1: for output pixel p and tap k at kernel
    position (i, j),

        sample_k(p) = bilinear(x, p*stride - pad + (i,j)*dilation + off_k(p))
        out(p) = sum_k (sample_k(p) * sigmoid_mask_k(p)) . W_k + b
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]

    base_y = jnp.arange(Ho, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(Wo, dtype=x.dtype) * stride - padding
    grid_y = base_y[None, :, None]
    grid_x = base_x[None, None, :]

    out = jnp.zeros((B, Ho, Wo, Cout), dtype=jnp.promote_types(x.dtype, jnp.float32))
    compute_dtype = x.dtype
    for k in range(K):
        i, j = divmod(k, kw)
        dy = offset[..., 2 * k]
        dx = offset[..., 2 * k + 1]
        pos_y = grid_y + i * dilation + dy
        pos_x = grid_x + j * dilation + dx
        sampled = _bilinear_gather(x, pos_y, pos_x)  # (B, Ho, Wo, Cin)
        sampled = sampled * mask[..., k : k + 1]
        wk = weight[i, j]  # (Cin, Cout)
        out = out + jnp.dot(
            sampled.astype(compute_dtype), wk.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def deform_conv2d_dense(
    x: jnp.ndarray,  # (B, H, W, Cin)
    offset: jnp.ndarray,  # (B, Ho, Wo, 2*K) (dy, dx) per tap
    mask: jnp.ndarray,  # (B, Ho, Wo, K)
    weight: jnp.ndarray,  # (kh, kw, Cin, Cout)
    bias: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    radius: int = 3,
) -> jnp.ndarray:
    """Gather-free modulated deformable conv (TPU hot path).

    XLA lowers per-element gathers on TPU to ~1 GB/s scalar loops, which
    made the direct formulation 40x slower than a plain conv. This version
    clamps offsets to ``[-radius, radius]`` and enumerates every integer
    displacement in the window as a *static* shift of x, weighting each by
    a bilinear-coefficient plane computed from the offsets:

        sampled_k(p) = sum_{a,b in [-R, R+1]} c_k,ab(p) * x(p + t_k + (a, b))

    where c has at most 4 nonzeros per pixel (the bilinear corners). All
    ops are pads/slices + VPU FMAs + one MXU matmul per tap, so it runs at
    tensor-core speed. Exactly equal to :func:`deform_conv2d` whenever
    |offset| <= radius (tests assert this); larger offsets saturate — a
    documented deviation from the reference CUDA kernel's unbounded
    sampling, sized so the decoder's learned offsets (typically ~1-2 px at
    these strides) stay in the exact regime.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho, Wo = offset.shape[1], offset.shape[2]
    R = radius
    compute_dtype = x.dtype

    # pad once for the union of all shifts: tap in [-pad, kh-1-pad] (dilated)
    # plus window [-R, R+1]
    max_tap = dilation * (kh - 1)
    pad_lo = R + padding  # most negative total displacement
    pad_hi = R + 1 + max_tap - padding  # most positive
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))


    def window_slice(total_dy: int, total_dx: int) -> jnp.ndarray:
        """x sampled at (out*stride - pad + total_d) for every output pixel."""
        y0 = pad_lo - padding + total_dy
        x0 = pad_lo - padding + total_dx
        return jax.lax.slice(
            xp,
            (0, y0, x0, 0),
            (B, y0 + (Ho - 1) * stride + 1, x0 + (Wo - 1) * stride + 1, Cin),
            (1, stride, stride, 1),
        )

    sampled_all = []
    for k in range(K):
        i, j = divmod(k, kw)
        dy = jnp.clip(offset[..., 2 * k], -R, R)
        dx = jnp.clip(offset[..., 2 * k + 1], -R, R)
        iy = jnp.floor(dy)
        ix = jnp.floor(dx)
        fy = dy - iy
        fx = dx - ix

        # per-axis weight planes for each integer shift in the window
        wy = {}
        wx = {}
        for a in range(-R, R + 2):
            wy[a] = jnp.where(iy == a, 1.0 - fy, 0.0) + jnp.where(iy == a - 1, fy, 0.0)
            wx[a] = jnp.where(ix == a, 1.0 - fx, 0.0) + jnp.where(ix == a - 1, fx, 0.0)

        acc = jnp.zeros((B, Ho, Wo, Cin), dtype=compute_dtype)
        for a in range(-R, R + 2):
            # horizontal pass for this vertical shift
            row = jnp.zeros((B, Ho, Wo, Cin), dtype=compute_dtype)
            for b in range(-R, R + 2):
                shifted = window_slice(i * dilation + a, j * dilation + b)
                row = row + wx[b].astype(compute_dtype)[..., None] * shifted
            acc = acc + wy[a].astype(compute_dtype)[..., None] * row
        sampled_all.append(acc * mask[..., k : k + 1].astype(compute_dtype))

    # one fused MXU matmul over all taps: (B, Ho, Wo, K*Cin) @ (K*Cin, Cout)
    cols = jnp.concatenate(sampled_all, axis=-1)
    # tap-major (K, Cin) blocks matching the sampled concat order
    w_mat = weight.reshape(K * Cin, Cout)
    out = jnp.dot(
        cols.astype(compute_dtype), w_mat.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
