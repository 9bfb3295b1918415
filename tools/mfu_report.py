#!/usr/bin/env python
"""MFU reconciliation: img/s x FLOPs/img vs the calibrated chip peak
(VERDICT r2 weak #1 / next-round item #2).

Round 2 shipped two contradictory artifacts: BENCH said 42.74 img/s on a
~200 GFLOP/img model (~8.5 TFLOP/s delivered) while CHIP_CALIBRATION.json
claimed the chip peaks at 2.52 bf16 TFLOP/s. The calibration was the wrong
one — it fetched the full N^2 matmul result over the tunnel every timing
round, so host transfer dominated (fixed in tools/calibrate_chip.py, now
measuring ~164 bf16 TFLOP/s delivered at 8192^3).

This tool closes the loop with XLA's own numbers: it lowers the exact
bench graph (inference AND train step), reads ``compiled.cost_analysis()``
FLOPs, times the graph with the bench protocol, and emits a consistent
img/s / FLOPs-per-img / delivered-TFLOP/s / MFU table into
docs/PERF_MFU.json.

Usage: python tools/mfu_report.py [--batch 64] [--train_batch 16]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(fn, args, fetch, iters=10, rounds=3):
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--out", default="docs/PERF_MFU.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from bench import _realistic_offsets
    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.synthetic import KITTI_P2
    from dcd_tpu.data.target_encoder import collate, encode_targets
    from dcd_tpu.engine.infer import postprocess
    from dcd_tpu.engine.train import build_model, create_train_state, make_train_step

    cfg = dgde_run_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, fp16=True))

    report = {"device": str(jax.devices()[0])}

    # ---------------- inference graph (bench.py protocol) ----------------
    B = args.batch
    H, W = cfg.input.height_train, cfg.input.width_train
    Ho, Wo = H // 4, W // 4
    L = (Ho + Wo) * 2
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (B, H, W, 3), jnp.float32)
    edge_idx = jnp.zeros((B, L, 2), jnp.int32)
    edge_len = jnp.full((B,), L - 1, jnp.int32)
    variables = jax.jit(
        lambda r, im, ei, el: model.init(r, im, ei, el, train=False)
    )(rng, images[:1], edge_idx[:1], edge_len[:1])
    variables = _realistic_offsets(variables)
    calib_P = jnp.asarray(np.tile(KITTI_P2[None], (B, 1, 1)), jnp.float32)
    pad_size = jnp.asarray(np.tile([[19.0, 4.0]], (B, 1)), jnp.float32)
    img_size = jnp.asarray(np.tile([[1242.0, 375.0]], (B, 1)), jnp.float32)

    @jax.jit
    def infer(images, edge_idx, edge_len):
        preds = model.apply(variables, images, edge_idx, edge_len, train=False)
        return postprocess(cfg, preds, calib_P, pad_size, img_size)

    compiled = infer.lower(images, edge_idx, edge_len).compile()
    ca = compiled.cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))
    dt = measure(infer, (images, edge_idx, edge_len),
                 lambda o: np.asarray(o["dets"]).ravel()[0])
    img_s = B / dt
    report["inference"] = {
        "batch": B,
        "images_per_sec": round(img_s, 2),
        "xla_flops_per_batch": flops,
        "xla_gflops_per_image": round(flops / B / 1e9, 2),
        "delivered_tflops": round(flops / dt / 1e12, 2),
        "bytes_accessed_GB": round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
    }
    print("inference:", json.dumps(report["inference"]), file=sys.stderr)

    # ---------------- train graph (bench_train.py protocol) ---------------
    Bt = args.train_batch
    samples = [
        encode_targets(*synthetic.make_scene(seed=s, num_objs=8), cfg,
                       img_id=f"{s:06d}")
        for s in range(Bt)
    ]
    batch = {k: jnp.asarray(v) for k, v in collate(samples).items()
             if not isinstance(v, list)}
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    inj = _realistic_offsets({"params": state.params})
    state = state.replace(params=inj["params"])
    step = jax.jit(make_train_step(cfg, model))
    compiled_t = step.lower(state, batch).compile()
    ca_t = compiled_t.cost_analysis() or {}
    flops_t = float(ca_t.get("flops", float("nan")))

    # non-donated timing loop (keep `state` alive for relowering safety)
    st = state
    out = step(st, batch)
    np.asarray(out[1]["total_loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s2 = st
        for _ in range(5):
            s2, logs = step(s2, batch)
        np.asarray(logs["total_loss"])
        best = min(best, (time.perf_counter() - t0) / 5)
    report["train"] = {
        "batch": Bt,
        "images_per_sec": round(Bt / best, 2),
        "xla_flops_per_batch": flops_t,
        "xla_gflops_per_image": round(flops_t / Bt / 1e9, 2),
        "delivered_tflops": round(flops_t / best / 1e12, 2),
        "bytes_accessed_GB": round(float(ca_t.get("bytes accessed", 0)) / 1e9, 2),
    }
    print("train:", json.dumps(report["train"]), file=sys.stderr)

    # ---------------- chip peak + MFU -------------------------------------
    calib_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                              "CHIP_CALIBRATION.json")
    peak = None
    if os.path.exists(calib_path):
        with open(calib_path) as f:
            calib = json.load(f)
        peak = max(
            v for k, v in calib["matmul_tflops"].items()
            if k.endswith("bfloat16") and not k.endswith("ratio")
        )
    report["chip"] = {
        "measured_peak_bf16_tflops": peak,
        "production_v5e_peak_bf16_tflops": 394.0,
    }
    if peak:
        report["inference"]["mfu_vs_measured_peak"] = round(
            report["inference"]["delivered_tflops"] / peak, 4
        )
        report["train"]["mfu_vs_measured_peak"] = round(
            report["train"]["delivered_tflops"] / peak, 4
        )

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
