#!/usr/bin/env python
"""AP-parity check against the reference's released DGDE weights.

Imports a reference torch checkpoint (full detector: DLA trunk + DCN
decoder + heads, see utils/checkpoint.import_torch_dgde), runs full-split
inference on real KITTI, computes AP|R40, and — when a directory of
reference-produced result txts is given — diffs the two result sets
box-for-box. Writes ``PARITY_AP.md``.

This sandbox has no network egress and ships neither KITTI nor the
released weights, so this tool is the *harness*: run it wherever both are
present:

  python tools/parity_check.py --ref_ckpt dcd.pth \
      --data_root KITTI/training [--ref_results ref_inference_dir] \
      [--split val]

Reference counterpart: tools/plain_train_net.py --eval --ckpt (inference
loop engine/inference.py:94) + the numba evaluator.
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def diff_result_dirs(ours: str, theirs: str):
    """Box-level diff of two KITTI result dirs. Returns (n_common_files,
    stats dict) with per-field max abs deltas over score-matched rows."""
    import glob

    fields = ["score", "depth", "x", "y", "dims", "roty", "box2d"]
    worst = {f: 0.0 for f in fields}
    n_files = 0
    n_rows_ours = n_rows_theirs = 0
    for path in sorted(glob.glob(os.path.join(ours, "*.txt"))):
        other = os.path.join(theirs, os.path.basename(path))
        if not os.path.exists(other):
            continue
        n_files += 1

        def rows(p):
            out = []
            with open(p) as f:
                for line in f:
                    t = line.split()
                    if len(t) >= 16:
                        out.append((t[0], np.array([float(v) for v in t[1:16]])))
            return out

        a, b = rows(path), rows(other)
        n_rows_ours += len(a)
        n_rows_theirs += len(b)
        # match rows greedily by 2D box IoU-ish proximity (center distance)
        for cls_a, va in a:
            best, bestd = None, 1e18
            for cls_b, vb in b:
                if cls_b != cls_a:
                    continue
                d = float(np.sum((va[3:7] - vb[3:7]) ** 2))
                if d < bestd:
                    bestd, best = d, vb
            if best is None:
                continue
            worst["box2d"] = max(worst["box2d"], float(np.max(np.abs(va[3:7] - best[3:7]))))
            worst["dims"] = max(worst["dims"], float(np.max(np.abs(va[7:10] - best[7:10]))))
            worst["x"] = max(worst["x"], abs(float(va[10] - best[10])))
            worst["y"] = max(worst["y"], abs(float(va[11] - best[11])))
            worst["depth"] = max(worst["depth"], abs(float(va[12] - best[12])))
            worst["roty"] = max(worst["roty"], abs(float(va[13] - best[13])))
            worst["score"] = max(worst["score"], abs(float(va[14] - best[14])))
    return n_files, dict(worst, rows_ours=n_rows_ours, rows_theirs=n_rows_theirs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref_ckpt", required=True, help="reference torch .pth checkpoint")
    p.add_argument("--data_root", required=True, help="KITTI training dir")
    p.add_argument("--ref_results", default=None,
                   help="dir of reference-produced KITTI result txts to diff against")
    p.add_argument("--output", default="./output/parity")
    p.add_argument("--report", default="PARITY_AP.md")
    args = p.parse_args()

    import jax

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.engine.train import build_model, create_train_state
    from dcd_tpu.utils.checkpoint import (
        import_torch_dgde, load_torch_checkpoint, resolve_checkpoint_source,
    )
    from dcd_tpu.utils.logger import setup_logger

    cfg = dgde_run_config()
    cfg = dataclasses.replace(cfg, output_dir=args.output)
    os.makedirs(args.output, exist_ok=True)
    logger = setup_logger("dcd_tpu", args.output, 0)

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    sd = load_torch_checkpoint(resolve_checkpoint_source(args.ref_ckpt))
    params, stats = import_torch_dgde(sd, {
        "params": state.params, "batch_stats": state.batch_stats,
    }, cfg)
    state = state.replace(params=params, batch_stats=stats)
    logger.info(f"imported {args.ref_ckpt}: {len(sd)} tensors")

    from train_dgde import run_eval  # shares the sharded inference loop

    eval_args = argparse.Namespace(data_root=args.data_root, vis=0)
    run_eval(cfg, eval_args, model, state, logger)

    lines = [
        "# PARITY_AP — reference weights through dcd_tpu",
        "",
        f"- checkpoint: `{args.ref_ckpt}`",
        f"- data: `{args.data_root}` split `{cfg.datasets.test_split}`",
        "- AP numbers: see the eval log above / "
        f"`{args.output}/log.txt` (official KITTI AP|R40 protocol, "
        "evaluation/kitti_eval.py)",
    ]
    if args.ref_results:
        ours = os.path.join(args.output, "inference", "data")
        n, stats_d = diff_result_dirs(ours, args.ref_results)
        lines += ["", f"## Box-level diff vs `{args.ref_results}` ({n} files)", ""]
        lines += [f"- {k}: {v}" for k, v in stats_d.items()]
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    logger.info(f"wrote {args.report}")


if __name__ == "__main__":
    main()
