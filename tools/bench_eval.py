#!/usr/bin/env python
"""Evaluator + host-loader throughput at production scale (VERDICT r3 #6).

The reference partitions its IoU computation across images for speed
(eval.py:338-412) and numba-jits the matching; this measures the rebuild's
vectorized-NumPy evaluator on a KITTI-val-sized synthetic set (~3,700
images) and the threaded prefetch loader's images/s against the device
bench throughput.

Usage: python tools/bench_eval.py [--images 3700] [--loader_batches 12]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_val_set(root: str, n_images: int, rng: np.random.RandomState):
    gt_dir = os.path.join(root, "gt")
    dt_dir = os.path.join(root, "dt")
    os.makedirs(gt_dir)
    os.makedirs(dt_dir)
    ids = []
    for i in range(n_images):
        img_id = f"{i:06d}"
        ids.append(img_id)
        n = rng.randint(0, 12)
        gt_lines, dt_lines = [], []
        for _ in range(n):
            x0, y0 = rng.uniform(0, 1100), rng.uniform(120, 250)
            h = rng.uniform(22, 140)
            w = h * rng.uniform(0.9, 2.4)
            z = rng.uniform(5, 60)
            x3 = rng.uniform(-20, 20)
            ry = rng.uniform(-np.pi, np.pi)
            dims = (rng.uniform(1.3, 1.8), rng.uniform(1.5, 1.9), rng.uniform(3.2, 4.6))
            cls = "Car" if rng.rand() < 0.8 else ("Van" if rng.rand() < 0.5 else "DontCare")
            gt_lines.append(
                f"{cls} 0.00 0 {ry:.2f} {x0:.2f} {y0:.2f} {x0+w:.2f} {y0+h:.2f} "
                f"{dims[0]:.2f} {dims[1]:.2f} {dims[2]:.2f} {x3:.2f} 1.65 {z:.2f} {ry:.2f}"
            )
            if rng.rand() < 0.8:  # matched detection with jitter
                j = rng.uniform(-4, 4, 4)
                zj = z + rng.uniform(-0.6, 0.6)
                dt_lines.append(
                    f"Car 0.00 0 {ry:.2f} {x0+j[0]:.2f} {y0+j[1]:.2f} {x0+w+j[2]:.2f} {y0+h+j[3]:.2f} "
                    f"{dims[0]:.2f} {dims[1]:.2f} {dims[2]:.2f} {x3:.2f} 1.65 {zj:.2f} {ry:.2f} {rng.rand():.3f}"
                )
        for _ in range(rng.randint(0, 3)):  # false positives
            x0, y0 = rng.uniform(0, 1100), rng.uniform(120, 250)
            h = rng.uniform(25, 90)
            dt_lines.append(
                f"Car 0.00 0 0.00 {x0:.2f} {y0:.2f} {x0+h*1.5:.2f} {y0+h:.2f} "
                f"1.5 1.7 4.0 0.0 1.65 {rng.uniform(5,60):.2f} 0.00 {rng.rand():.3f}"
            )
        with open(os.path.join(gt_dir, img_id + ".txt"), "w") as f:
            f.write("\n".join(gt_lines) + "\n")
        with open(os.path.join(dt_dir, img_id + ".txt"), "w") as f:
            f.write("\n".join(dt_lines) + "\n")
    split = os.path.join(root, "val.txt")
    with open(split, "w") as f:
        f.write("\n".join(ids))
    return gt_dir, dt_dir, split


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=3700)
    ap.add_argument("--loader_batches", type=int, default=12)
    ap.add_argument("--loader_workers", type=int, default=4)
    ap.add_argument("--out", default="docs/EVAL_SCALE.json")
    args = ap.parse_args()

    from dcd_tpu.evaluation import kitti_eval

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp()
    try:
        print(f"# writing {args.images} gt/dt label pairs...", file=sys.stderr)
        gt_dir, dt_dir, split = build_val_set(tmp, args.images, rng)
        t0 = time.perf_counter()
        result, ret = kitti_eval.evaluate_from_files(
            gt_dir, dt_dir, split, current_class=0, metric="R40"
        )
        eval_sec = time.perf_counter() - t0
        print(result, file=sys.stderr)
    finally:
        shutil.rmtree(tmp)

    # host loader throughput (full target encoding incl. native splats)
    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.target_encoder import encode_targets

    cfg = dgde_run_config()
    n_enc = 24
    scenes = [synthetic.make_scene(seed=s, num_objs=8) for s in range(n_enc)]
    encode_targets(*scenes[0], cfg, img_id="w")  # warm
    t0 = time.perf_counter()
    for s, sc in enumerate(scenes):
        encode_targets(*sc, cfg, img_id=f"{s:06d}")
    enc_sec = time.perf_counter() - t0
    enc_per_worker = n_enc / enc_sec

    out = {
        "eval_images": args.images,
        "eval_sec": round(eval_sec, 1),
        "eval_images_per_sec": round(args.images / eval_sec, 1),
        "ap_3d_moderate": float(ret["Car_3d_moderate_R40_0.70"]),
        "encode_samples_per_sec_per_worker": round(enc_per_worker, 1),
        "encode_samples_per_sec_4workers": round(enc_per_worker * args.loader_workers, 1),
        "note": (
            "evaluate_from_files on a KITTI-val-sized synthetic set "
            "(the reference partitions IoU for this, eval.py:338-412); "
            "loader number is full target encoding per worker thread"
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
