"""Deformable position-sensitive ROI pooling.

Completes the DCNv2 extension's public API surface: the reference ships
``dcn_v2_psroi_pooling_forward/backward`` CUDA+CPU kernels
(``DGDE/model/backbone/DCNv2/DCN/src/cuda/dcn_v2_psroi_pooling_cuda.cu``,
exposed as ``DCNPooling``/``DCNv2Pooling`` in DCN/dcn_v2.py:132-303) even
though the DCD pipeline never calls it. This is the TPU-native equivalent:
pure jnp (vmapped bilinear sampling; autodiff backward), following the
deformable PSROI pooling definition of Dai et al., "Deformable
Convolutional Networks" (2017).

Layout: NHWC features, rois (N, 5) = [batch_idx, x1, y1, x2, y2].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def deform_psroi_pooling(
    features: jnp.ndarray,  # (B, H, W, C)
    rois: jnp.ndarray,  # (N, 5) [batch, x1, y1, x2, y2] in image coords
    trans: Optional[jnp.ndarray],  # (N, P, P, 2) normalized offsets or None
    spatial_scale: float,
    out_size: int,  # pooled P
    out_dim: int,  # output channels
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jnp.ndarray:
    """Returns (N, P, P, out_dim).

    For each roi bin, samples ``sample_per_part^2`` points bilinearly from
    the position-sensitive channel group of that bin and averages the
    in-bounds ones; ``trans`` shifts each part by a fraction of the roi
    size (the deformable variant; ``no_trans`` == trans None/zeros).
    """
    B, H, W, C = features.shape
    P = out_size
    part = part_size or P
    N = rois.shape[0]

    batch_idx = rois[:, 0].astype(jnp.int32)
    # roi corners in feature coords (the CUDA kernel rounds and pads by 0.5)
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / P  # (N,)
    bin_h = roi_h / P
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    ph = jnp.arange(P)
    pw = jnp.arange(P)
    # part index for the trans lookup
    part_h = jnp.floor(ph[None, :] / P * part).astype(jnp.int32)  # (1, P)
    part_w = jnp.floor(pw[None, :] / P * part).astype(jnp.int32)

    if trans is None:
        trans = jnp.zeros((N, part, part, 2), features.dtype)

    def pool_one(b, x1n, y1n, bw, bh, sw, sh, trans_n):
        fm = features[b]  # (H, W, C)

        def bin_val(phi, pwi):
            tx = trans_n[part_h[0, phi], part_w[0, pwi], 0] * trans_std
            ty = trans_n[part_h[0, phi], part_w[0, pwi], 1] * trans_std
            start_x = x1n + pwi * bw + tx * bw * P  # offset scaled by roi
            start_y = y1n + phi * bh + ty * bh * P
            ih = jnp.arange(sample_per_part)
            iw = jnp.arange(sample_per_part)
            sx = start_x + (iw[None, :] + 0.5) * sw  # (1, s)
            sy = start_y + (ih[:, None] + 0.5) * sh  # (s, 1)
            sx = jnp.broadcast_to(sx, (sample_per_part, sample_per_part))
            sy = jnp.broadcast_to(sy, (sample_per_part, sample_per_part))
            inb = (sx >= -0.5) & (sx <= W - 0.5) & (sy >= -0.5) & (sy <= H - 0.5)
            sxc = jnp.clip(sx, 0, W - 1)
            syc = jnp.clip(sy, 0, H - 1)
            x0 = jnp.floor(sxc).astype(jnp.int32)
            y0 = jnp.floor(syc).astype(jnp.int32)
            x1i = jnp.minimum(x0 + 1, W - 1)
            y1i = jnp.minimum(y0 + 1, H - 1)
            fx = sxc - x0
            fy = syc - y0
            # position-sensitive channel group for this bin
            gw = jnp.clip(pwi * group_size // P, 0, group_size - 1)
            gh = jnp.clip(phi * group_size // P, 0, group_size - 1)
            cbase = (gh * group_size + gw) * out_dim
            ch = cbase + jnp.arange(out_dim)  # (out_dim,)

            def g(yy, xx):
                return fm[yy, xx][..., ch]  # (s, s, out_dim)

            val = (
                g(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
                + g(y0, x1i) * ((1 - fy) * fx)[..., None]
                + g(y1i, x0) * (fy * (1 - fx))[..., None]
                + g(y1i, x1i) * (fy * fx)[..., None]
            )
            val = val * inb[..., None]
            count = jnp.maximum(inb.sum(), 1)
            return val.sum(axis=(0, 1)) / count

        return jax.vmap(lambda phi: jax.vmap(lambda pwi: bin_val(phi, pwi))(pw))(ph)

    return jax.vmap(pool_one)(batch_idx, x1, y1, bin_w, bin_h, sub_w, sub_h, trans)
