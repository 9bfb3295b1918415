"""3D pose geometry: angle-axis rotations, bearings, pose error measures.

Covers the reference's ``GMW/utilities/geometry_utilities.py`` (Rodrigues
angle-axis -> R :3-57, transform/normalize points, bearings :59-111) and
the pose error/loss family of ``GMW/lib/losses.py`` (rotation/translation/
reprojection/reconstruction errors :36-127, correspondence matrices
:7-34). The shipped pipeline only uses correspondenceLoss, but these are
the declarative-PnP toolkit the GMW codebase exposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def angle_axis_to_rotation_matrix(angle_axis: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) angle-axis -> (..., 3, 3) rotation (Rodrigues), with the
    first-order Taylor branch near zero angle."""
    theta2 = (angle_axis**2).sum(-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-24))
    wxyz = angle_axis / theta
    wx, wy, wz = wxyz[..., 0], wxyz[..., 1], wxyz[..., 2]
    cos = jnp.cos(theta[..., 0])
    sin = jnp.sin(theta[..., 0])
    r = jnp.stack(
        [
            cos + wx * wx * (1 - cos),
            wx * wy * (1 - cos) - wz * sin,
            wy * sin + wx * wz * (1 - cos),
            wz * sin + wx * wy * (1 - cos),
            cos + wy * wy * (1 - cos),
            -wx * sin + wy * wz * (1 - cos),
            -wy * sin + wx * wz * (1 - cos),
            wx * sin + wy * wz * (1 - cos),
            cos + wz * wz * (1 - cos),
        ],
        axis=-1,
    ).reshape(angle_axis.shape[:-1] + (3, 3))
    # near-zero: I + skew(w)
    ax, ay, az = angle_axis[..., 0], angle_axis[..., 1], angle_axis[..., 2]
    ones = jnp.ones_like(ax)
    r_taylor = jnp.stack(
        [ones, -az, ay, az, ones, -ax, -ay, ax, ones], axis=-1
    ).reshape(angle_axis.shape[:-1] + (3, 3))
    use_taylor = (theta2[..., 0] < 1e-12)[..., None, None]
    return jnp.where(use_taylor, r_taylor, r)


def transform_points(p: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 3) points through (..., 3, 3) R and (..., 3) t."""
    return jnp.einsum("...ij,...nj->...ni", R, p) + t[..., None, :]


def normalize_points(p: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return p / jnp.clip(jnp.linalg.norm(p, axis=-1, keepdims=True), eps)


def points_to_bearings(p2d: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) normalized image points -> (..., N, 3) unit bearings."""
    ones = jnp.ones(p2d.shape[:-1] + (1,), p2d.dtype)
    return normalize_points(jnp.concatenate([p2d, ones], axis=-1))


def transform_and_normalise_points(p3d, R, t):
    return normalize_points(transform_points(p3d, R, t))


# ---------------------------------------------------------------------------
# error / loss measures (GMW/lib/losses.py)
# ---------------------------------------------------------------------------


def correspondence_matrices(R, t, p2d, p3d, threshold: float) -> jnp.ndarray:
    """Boolean inlier matrix from a pose: bearing agreement within an
    angular threshold (losses.py:7-13)."""
    b2 = points_to_bearings(p2d)
    b3 = transform_and_normalise_points(p3d, R, t)
    dot = jnp.einsum("...md,...nd->...mn", b2, b3)
    return (dot >= jnp.cos(threshold)).astype(jnp.float32)


def rotation_errors(R, R_gt, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic angle between rotations (losses.py:36-40)."""
    m = 1.0 - eps
    c = 0.5 * ((R * R_gt).sum(axis=(-2, -1)) - 1.0)
    return jnp.arccos(jnp.clip(c, -m, m))


def translation_errors(t, t_gt) -> jnp.ndarray:
    return jnp.linalg.norm(t - t_gt, axis=-1)


def reprojection_errors(R, t, p2d, p3d, P) -> jnp.ndarray:
    """Transport-weighted angular reprojection error (losses.py:~100):
    sum_{m,n} P_mn * (1 - <bearing_2d_m, bearing_3d_n>)."""
    b2 = points_to_bearings(p2d)
    b3 = transform_and_normalise_points(p3d, R, t)
    dot = jnp.einsum("...md,...nd->...mn", b2, b3)
    return ((1.0 - dot) * P).sum(axis=(-2, -1))


def reconstruction_errors(R, t, R_gt, t_gt, p) -> jnp.ndarray:
    """Mean distance between points under the two poses."""
    a = transform_points(p, R, t)
    b = transform_points(p, R_gt, t_gt)
    return jnp.linalg.norm(a - b, axis=-1).mean(-1)
