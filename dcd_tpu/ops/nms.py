"""Heatmap NMS / top-k / point-of-interest gather.

Rewrites of ``DGDE/model/layers/utils.py`` (sigmoid_hm :39, nms_hm :45,
select_topk :61, select_point_of_interest :120) for NHWC layout and
static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sigmoid_hm(hm_features: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid clamped away from {0, 1} (reference layers/utils.py:39-43)."""
    return jnp.clip(jax.nn.sigmoid(hm_features), 1e-4, 1.0 - 1e-4)


def nms_hm(heat_map: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Max-pool NMS: keep only local maxima (reference layers/utils.py:45-58).

    heat_map: (B, H, W, C) NHWC.
    """
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat_map,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return heat_map * (hmax == heat_map).astype(heat_map.dtype)


def select_topk(
    heat_map: jnp.ndarray, K: int = 100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K peaks across all classes.

    heat_map: (B, H, W, C). Returns (scores, flat_hw_index, cls, ys, xs),
    each (B, K). Two-stage top-k as in the reference (layers/utils.py:61-100):
    per-class top-K then global top-K over the C*K candidates.
    """
    B, H, W, C = heat_map.shape
    hm = heat_map.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    topk_scores_all, topk_inds_all = jax.lax.top_k(hm, K)  # (B, C, K)
    topk_ys = (topk_inds_all // W).astype(jnp.float32)
    topk_xs = (topk_inds_all % W).astype(jnp.float32)

    flat_scores = topk_scores_all.reshape(B, C * K)
    topk_scores, topk_inds = jax.lax.top_k(flat_scores, K)  # (B, K)
    topk_clses = (topk_inds // K).astype(jnp.float32)

    def gather_bk(x):
        return jnp.take_along_axis(x.reshape(B, C * K), topk_inds, axis=1)

    inds = gather_bk(topk_inds_all)
    ys = gather_bk(topk_ys)
    xs = gather_bk(topk_xs)
    return topk_scores, inds, topk_clses, ys, xs


def select_point_of_interest(index: jnp.ndarray, feature_maps: jnp.ndarray) -> jnp.ndarray:
    """Gather per-object feature vectors at integer feature-map points.

    index: (B, K, 2) as (x, y) points or (B, K) flat indices;
    feature_maps: (B, H, W, C) NHWC. Returns (B, K, C).
    Reference: layers/utils.py:120-145 (select_point_of_interest).
    """
    B, H, W, C = feature_maps.shape
    if index.ndim == 3:
        index = index[:, :, 1] * W + index[:, :, 0]
    index = index.reshape(B, -1).astype(jnp.int32)
    flat = feature_maps.reshape(B, H * W, C)
    # gather in the map's dtype, cast the few POI rows to fp32 for the
    # geometry decode (casting the full map costs ~10 ms/step at batch 64)
    return jnp.take_along_axis(flat, index[:, :, None], axis=1).astype(jnp.float32)
