"""Stage-2 GMW parity vs the reference torch implementation (CI-sized).

The full-scale (73-kpt / 2628-edge) run lives in tools/parity_gmw.py and
writes PARITY_GMW.md; this test runs the same harness at a reduced
keypoint count so the round-trip through ``import_torch_gmw`` (the
released-stage-2-weights loader, utils/checkpoint.py) and every
intermediate tap (towers, cost matrix M, reg_weights, Sinkhorn P,
implicit dL/dM, end-to-end f64 input grads) is exercised on every CI
run against the live reference model (GMW/model/model.py:103-207,
GMW/lib/optimal_transport.py:26-232).

Skipped when /root/reference is not present (e.g. a user checkout).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/GMW/model"),
    reason="reference tree not available",
)

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _run(kpts, f64):
    if TOOLS not in sys.path:
        sys.path.insert(0, TOOLS)
    from parity_gmw import run_parity

    return run_parity(kpts, batch=2, f64=f64)


def test_gmw_parity_fp32_taps():
    rows = _run(16, f64=False)
    taps = {name: err for name, err in rows}
    # forward taps + the isolated implicit VJP must agree tightly; the
    # [fp32] end-to-end grads are conditioning-limited (see PARITY_GMW.md)
    for name, err in taps.items():
        if name.startswith("[fp32] d loss"):
            continue
        assert err < 1e-4, f"{name}: {err:.3e}"


def test_gmw_parity_f64_end_to_end_grads():
    rows = _run(16, f64=True)
    # both sides iterate Sinkhorn to tol 1e-9; the residual fixed-point
    # mismatch bounds agreement at ~1e-6 even in f64
    for name, err in rows:
        assert err < 1e-5, f"{name}: {err:.3e}"
