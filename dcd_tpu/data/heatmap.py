"""Host-side heatmap target encoding (vectorized NumPy).

Reference: ``DGDE/model/heatmap_coder.py`` (gaussian_radius :37-56,
draw_umich_gaussian :83-106, draw_umich_gaussian_2D :108-124). The splats run
in the input pipeline, so they are NumPy; the math is identical but the
gaussian is evaluated over index grids instead of python-sliced patches,
which keeps it branch-free and lets one call handle clipped borders.
"""

from __future__ import annotations

import numpy as np


def gaussian_radius(height: float, width: float, min_overlap: float = 0.7) -> float:
    """CenterNet 3-case quadratic radius (reference heatmap_coder.py:37-56)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1**2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2**2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3**2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


def _gaussian2d_patch(radius_y: int, radius_x: int, sigma_x: float, sigma_y: float) -> np.ndarray:
    y, x = np.ogrid[-radius_y : radius_y + 1, -radius_x : radius_x + 1]
    h = np.exp(-(x * x) / (2 * sigma_x * sigma_x) - (y * y) / (2 * sigma_y * sigma_y))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_umich_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0) -> np.ndarray:
    """Max-splat an isotropic gaussian (reference heatmap_coder.py:83-106)."""
    diameter = 2 * radius + 1
    gaussian = _gaussian2d_patch(radius, radius, diameter / 6.0, diameter / 6.0)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]

    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if min(left + right, top + bottom) > 0:
        masked = heatmap[y - top : y + bottom, x - left : x + right]
        patch = gaussian[radius - top : radius + bottom, radius - left : radius + right]
        np.maximum(masked, patch * k, out=masked)
    return heatmap


def draw_umich_gaussian_2d(
    heatmap: np.ndarray, center, radius_x: int, radius_y: int, k: float = 1.0
) -> np.ndarray:
    """Max-splat an axis-aligned elliptic gaussian — used for truncated
    objects whose center sits on the image border
    (reference heatmap_coder.py:108-124)."""
    dx, dy = 2 * radius_x + 1, 2 * radius_y + 1
    gaussian = _gaussian2d_patch(radius_y, radius_x, dx / 6.0, dy / 6.0)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]

    left, right = min(x, radius_x), min(width - x, radius_x + 1)
    top, bottom = min(y, radius_y), min(height - y, radius_y + 1)
    if min(left + right, top + bottom) > 0:
        masked = heatmap[y - top : y + bottom, x - left : x + right]
        patch = gaussian[radius_y - top : radius_y + bottom, radius_x - left : radius_x + right]
        np.maximum(masked, patch * k, out=masked)
    return heatmap


def draw_gaussian_1d(edgemap: np.ndarray, center: int, radius: int) -> np.ndarray:
    """Max-splat a 1D gaussian onto an edge map
    (reference heatmap_coder.py:68-81). Shipped for API parity: the
    reference imports it in kitti.py but the shipped config never calls
    it (same as here)."""
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    grid = np.arange(-radius, radius + 1)
    gaussian = np.exp(-(grid * grid) / (2 * sigma * sigma))
    center = int(center)
    left, right = min(center, radius), min(len(edgemap) - center, radius + 1)
    if left + right > 0:
        masked = edgemap[center - left : center + right]
        np.maximum(masked, gaussian[radius - left : radius + right], out=masked)
    return edgemap


def draw_ellip_gaussian(
    heatmap: np.ndarray, center, box2d, ratio: float = 0.5, k: float = 1.0
) -> np.ndarray:
    """Elliptic gaussian with radii taken from the one-sided box extent
    around the center (reference heatmap_coder.py:139-159; shipped-unused
    there and here — the wired truncated-object path is
    :func:`draw_umich_gaussian_2d`)."""
    bbox_width = min(center[0] - box2d[0], box2d[2] - center[0])
    bbox_height = min(center[1] - box2d[1], box2d[3] - center[1])
    radius_x, radius_y = int(bbox_width * ratio), int(bbox_height * ratio)
    return draw_umich_gaussian_2d(heatmap, center, radius_x, radius_y, k)
