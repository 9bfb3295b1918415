"""GMW — Graph Matching Weighting network (stage 2).

TPU rewrite of ``GMW/model/model.py`` + ``GMW/model/yi2018cvpr``:

* keypoints -> edges: every i<j pair concatenates both endpoint features
  (``edge_expand`` model.py:153-163) — 73 kpts -> 2628 edges of dim 4 (2D)
  and 6 (3D).
* two 12-block Conv1d residual towers with global-context normalization
  (yi2018cvpr/ops.py:7-19 ``gcn``: per-channel standardize over the point
  axis, torch-style unbiased variance). 1x1 convs over points are plain
  per-point MLPs, so they run as batched matmuls on the MXU.
* pairwise-L2 cost matrix (model.py:17-36) -> Sinkhorn transport ``P`` and
  ``reg_weights = 1 / diag(M)`` (graph_extract :165-168).

Plus the stage-2 loss pieces (GMW/main.py): ``compute_z`` closed-form edge
depths (:373-416, clamp [0.1, 80], top-1500 by |dV|), ``compute_reg_loss``
softmax-weighted depth (:364-371), and ``correspondenceLoss``
(lib/losses.py:22-26,115).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.codec import triu_pair_indices
from ..ops.sinkhorn import regularised_transport


def gcn_norm(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Global-context norm over the points axis (B, N, C), torch unbiased
    variance (yi2018cvpr/ops.py:13-19)."""
    m = x.mean(axis=1, keepdims=True)
    v = x.var(axis=1, keepdims=True, ddof=1)
    return (x - m) / jnp.sqrt(v + eps)


class Conv1dResnetBlock(nn.Module):
    """preconv -> conv+gcn -> conv+gcn -> relu -> +residual
    (yi2018cvpr/ops.py:72-131 with the shipped config: ksize=1, no BN)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        xorg = x
        x = nn.Dense(self.features, dtype=self.dtype, name="preconv")(x)
        x = nn.Dense(self.features, dtype=self.dtype, name="conv1")(x)
        x = gcn_norm(x)
        x = nn.Dense(self.features, dtype=self.dtype, name="conv2")(x)
        x = gcn_norm(x)
        return nn.relu(x) + xorg


class FeatureTower(nn.Module):
    """conv_in + net_depth residual blocks (yi2018cvpr/model.py:6-69;
    config: depth 12, 128 channels)."""

    features: int = 128
    depth: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype, name="conv_in")(x)
        for i in range(self.depth):
            x = Conv1dResnetBlock(self.features, dtype=self.dtype, name=f"conv_{i}")(x)
        return x


def pairwise_l2_dist(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """res[b, i, j] = ||x1[b, i] - x2[b, j]|| (model.py:17-36)."""
    x1n = (x1**2).sum(-1, keepdims=True)
    x2n = (x2**2).sum(-1, keepdims=True)
    acc = jnp.promote_types(x1.dtype, jnp.float32)  # >= fp32 accumulate
    d2 = x1n + x2n.transpose(0, 2, 1) - 2.0 * jnp.einsum(
        "bic,bjc->bij", x1, x2, preferred_element_type=acc
    )
    return jnp.sqrt(jnp.clip(d2, 1e-30))


def edge_expand(f: jnp.ndarray) -> jnp.ndarray:
    """(B, n, c) -> (B, n(n-1)/2, 2c): concat(f_i, f_j) for i<j
    (model.py:153-163)."""
    n = f.shape[1]
    i_idx, j_idx = triu_pair_indices(n)
    return jnp.concatenate([f[:, jnp.asarray(i_idx)], f[:, jnp.asarray(j_idx)]], axis=-1)


class GMW(nn.Module):
    num_kpts: int = 73
    features: int = 128
    depth: int = 12
    sinkhorn_lambda: float = 10.0
    sinkhorn_tolerance: float = 1e-9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, kpts_2d: jnp.ndarray, kpts_3d: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """kpts_2d (B, n, 2) normalized image coords; kpts_3d (B, n, 3).

        Returns (reg_weights (B, E), edge_P (B, E, E)) like model.py:195-207.
        """
        f4d = edge_expand(kpts_2d)  # (B, E, 4)
        f6d = edge_expand(kpts_3d)  # (B, E, 6)

        f4 = FeatureTower(self.features, self.depth, self.dtype, name="FeatureExtractor4d")(f4d)
        f6 = FeatureTower(self.features, self.depth, self.dtype, name="FeatureExtractor6d")(f6d)

        f4 = f4 / jnp.clip(jnp.linalg.norm(f4, axis=-1, keepdims=True), 1e-12)
        f6 = f6 / jnp.clip(jnp.linalg.norm(f6, axis=-1, keepdims=True), 1e-12)

        M = pairwise_l2_dist(f4.astype(jnp.float32), f6.astype(jnp.float32))
        diag = jnp.diagonal(M, axis1=-2, axis2=-1)
        reg_weights = 1.0 / diag  # graph_extract (model.py:165-168)

        b, m, n = M.shape
        r = jnp.full((b, m), 1.0 / m, M.dtype)
        c = jnp.full((b, n), 1.0 / n, M.dtype)
        P = regularised_transport(M, r, c, self.sinkhorn_lambda, self.sinkhorn_tolerance, 100)
        return reg_weights, P


# ---------------------------------------------------------------------------
# stage-2 geometry + losses (GMW/main.py)
# ---------------------------------------------------------------------------


def compute_z(
    kpts_2d: jnp.ndarray, kpts_3d: jnp.ndarray, pred_rot: jnp.ndarray, topk: int = 1500
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form edge depths from *normalized* 2D keypoints
    (GMW/main.py:373-416). Returns (depths (B, E), good_idx (B, topk)).
    Clamp [0.1, 80] (vs the DGDE-side [2, 80])."""
    n = kpts_2d.shape[1]
    y_n = kpts_2d[..., 1]
    X, Y, Z = kpts_3d[..., 0], kpts_3d[..., 1], kpts_3d[..., 2]
    rot = pred_rot.reshape(-1, 1)
    C = X * jnp.sin(rot) - Z * jnp.cos(rot)
    h = Y + y_n * C
    i_idx, j_idx = triu_pair_indices(n)
    i_idx, j_idx = jnp.asarray(i_idx), jnp.asarray(j_idx)
    dH = h[:, i_idx] - h[:, j_idx]
    dV = y_n[:, i_idx] - y_n[:, j_idx]
    z = jnp.abs(dH) / jnp.maximum(jnp.abs(dV), 1e-10)
    z = jnp.clip(z, 0.1, 80.0)
    _, good_idx = jax.lax.top_k(jnp.abs(dV), topk)
    return z, good_idx


def compute_reg_loss(
    pre_depths: jnp.ndarray, edge_weight: jnp.ndarray, gt_depth: jnp.ndarray, good_idx: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax-weighted depth over the selected edges (GMW/main.py:364-371).
    Returns (loss scalar, predicted depth (B,))."""
    d = jnp.take_along_axis(pre_depths, good_idx, axis=-1)
    w = jnp.take_along_axis(edge_weight, good_idx, axis=-1)
    w = jax.nn.softmax(w, axis=-1)
    z = (d * w).sum(-1)
    return jnp.abs(z - gt_depth).mean(), z


def correspondence_loss(P: jnp.ndarray, C_gt: jnp.ndarray) -> jnp.ndarray:
    """((1 - 2C) * P).sum over the matrix, batch mean
    (GMW/lib/losses.py:22-26,115)."""
    return ((1.0 - 2.0 * C_gt) * P).sum(axis=(-2, -1)).mean()
