#!/usr/bin/env python
"""GMW stage-2 benchmark at the SHIPPED scale (VERDICT r2 item #3).

The reference trains GMW at 73 keypoints -> 2628 edges per object, every
step (GMW/main.py:440-470): feature towers over (B, 2628, {4,6}) edge
features, a 2628x2628 pairwise-L2 cost matrix, Sinkhorn transport, and the
implicit Cholesky backward over the 2628x2628 KKT Schur complement
(GMW/lib/optimal_transport.py:104-117). Until round 3 nothing in this repo
had ever executed that scale; this tool runs the full jitted train step
(forward + implicit backward + AdamW update) and reports step time.

Usage: python tools/bench_gmw.py [--batch 8] [--kpts 73] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--kpts", type=int, default=73)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from dcd_tpu.engine.gmw_train import GMWConfig, create_gmw_state, make_gmw_train_step

    cfg = GMWConfig(num_kpts=args.kpts, batch_size=args.batch)
    E = args.kpts * (args.kpts - 1) // 2
    print(f"# GMW bench: {args.kpts} kpts -> E={E}, batch {args.batch}, "
          f"device {jax.devices()[0]}", file=sys.stderr)

    model, state = create_gmw_state(cfg, jax.random.PRNGKey(0), steps_per_epoch=100)
    rng = np.random.RandomState(0)
    B = args.batch
    batch = {
        "kpts_2d": jnp.asarray(rng.randn(B, args.kpts, 2).astype(np.float32) * 0.1),
        "kpts_3d": jnp.asarray(rng.randn(B, args.kpts, 3).astype(np.float32)),
        "pred_rot": jnp.asarray(rng.randn(B).astype(np.float32)),
        "gt_depth": jnp.asarray(10.0 + rng.rand(B).astype(np.float32) * 40),
    }
    step = jax.jit(make_gmw_train_step(cfg, model), donate_argnums=(0,))
    one = jnp.float32(1.0)

    t0 = time.perf_counter()
    state, logs = step(state, batch, one, one)
    loss0 = float(np.asarray(logs["loss"]))  # forces completion
    compile_s = time.perf_counter() - t0
    print(f"# compile+first step: {compile_s:.1f}s, loss={loss0:.4f}", file=sys.stderr)
    assert np.isfinite(loss0)

    best = float("inf")
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, batch, one, one)
        np.asarray(logs["loss"])
        best = min(best, (time.perf_counter() - t0) / args.iters)

    print(json.dumps({
        "metric": "gmw_train_step_sec",
        "kpts": args.kpts,
        "edges": E,
        "batch": args.batch,
        "step_sec": round(best, 4),
        "objects_per_sec": round(args.batch / best, 2),
        "compile_sec": round(compile_s, 1),
        "final_loss": round(float(np.asarray(logs["loss"])), 4),
    }))


if __name__ == "__main__":
    main()
