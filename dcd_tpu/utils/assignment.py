"""Assignment utilities (vestigial-parity for GMW).

The reference ships a Hungarian + RANSAC-P3P helper
(``GMW/utilities/hungarian_algorithm.py``, scipy linear_sum_assignment +
cv2 solvePnPRansac) that its pipeline never calls. The assignment half is
provided here (scipy is available); the cv2 P3P solver has no counterpart
in this image and is intentionally out of scope — the declarative
:mod:`dcd_tpu.models.blind_pnp` covers pose solving.
"""

from __future__ import annotations

import numpy as np


def hungarian_assignment(cost: np.ndarray):
    """Min-cost bipartite assignment. Returns (row_idx, col_idx)."""
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(np.asarray(cost))


def assignment_from_transport(P: np.ndarray):
    """Hard correspondence from a transport matrix (maximize mass)."""
    return hungarian_assignment(-np.asarray(P))
