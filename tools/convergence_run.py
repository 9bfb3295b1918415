#!/usr/bin/env python
"""Full-size synthetic convergence run (VERDICT r2 item #7).

150 unit tests prove pieces; this proves the ASSEMBLED system optimizes at
the shipped scale: full 384x1280 input, the real head widths, batch >= 16,
pretrain off, a pool of synthetic scenes cycled for a few hundred steps.
Writes the loss + depth-MAE-family curves (the reference's main training
observable, detector_loss.py:546-578) as JSONL via utils/writer.py and a
summary table into docs/CONVERGENCE.md.

Usage: python tools/convergence_run.py [--steps 300] [--batch 16] [--pool 64]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pool", type=int, default=64)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches (batch 16 full "
                    "size needs accum=2 or --remat on this chip's HBM)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--eval_every", type=int, default=0,
                    help="every N steps run the OFFICIAL evaluator on a "
                    "held-out synthetic val split and log the AP trajectory "
                    "(bbox/bev/3d moderate) — the trained-quality gate")
    ap.add_argument("--val_scenes", type=int, default=16)
    ap.add_argument("--depth_modes", default="edges",
                    help="comma list of OUTPUT_DEPTH modes to evaluate at "
                    "each AP checkpoint (edges is the shipped default; "
                    "soft/direct are the reference's easier ensembles)")
    ap.add_argument("--save_ckpt", default=None,
                    help="orbax checkpoint dir; saves model_final at the end "
                    "(feeds the two-stage DGDE->GMW artifact)")
    ap.add_argument("--out_md", default="docs/CONVERGENCE.md")
    ap.add_argument("--out_jsonl", default="docs/convergence_metrics.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.target_encoder import collate, encode_targets
    from dcd_tpu.engine.train import create_train_state, make_train_step

    cfg = dgde_run_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, fp16=True, pretrain=False,
                                  remat=args.remat),
        solver=dataclasses.replace(
            cfg.solver, lr_warmup=True, warmup_steps=100, base_lr=3e-4,
            grad_accum_steps=args.accum,
        ),
    )

    print(f"# encoding {args.pool} full-size scenes...", file=sys.stderr)
    samples = [
        encode_targets(
            *synthetic.make_scene(seed=s, num_objs=8), cfg, img_id=f"{s:06d}"
        )
        for s in range(args.pool)
    ]
    batches = []
    for lo in range(0, args.pool, args.batch):
        b = collate(samples[lo:lo + args.batch])
        batches.append({k: jnp.asarray(v) for k, v in b.items()
                        if not isinstance(v, list)})

    model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                      iters_per_epoch=len(batches))
    step_fn = jax.jit(make_train_step(cfg, model, iters_per_epoch=len(batches)),
                      donate_argnums=(0,))

    # ---- held-out val split + official evaluator (AP trajectory) ----
    ap_hist = []
    if args.eval_every:
        import shutil
        import tempfile

        from dcd_tpu.engine.infer import format_kitti_lines, postprocess
        from dcd_tpu.evaluation import kitti_eval

        # score = heatmap-confidence only for the trajectory: the reference
        # multiplies scores by 1 - clip(estimated_depth_error, 0.01, 1)
        # (engine/infer.py:123-126), which is exactly 0 until the depth
        # uncertainties train below 1 m — real-KITTI training gets there,
        # a short synthetic run does not, so the gated score would hide
        # all learning (measured: n_valid == 0 at every checkpoint).
        eval_cfg = dataclasses.replace(
            cfg, test=dataclasses.replace(cfg.test, uncertainty_as_confidence=False)
        )
        print(f"# encoding {args.val_scenes} held-out val scenes...", file=sys.stderr)
        val_raw = [synthetic.make_scene(seed=10_000 + s, num_objs=8)
                   for s in range(args.val_scenes)]
        val_samples = [
            encode_targets(img, objs, calib, cfg, img_id=f"{10_000 + s:06d}")
            for s, (img, objs, calib) in enumerate(val_raw)
        ]

        depth_modes = [m.strip() for m in args.depth_modes.split(",") if m.strip()]
        infer_fns = {}
        for m in depth_modes:
            mode_cfg = dataclasses.replace(
                eval_cfg,
                model=dataclasses.replace(
                    eval_cfg.model,
                    head=dataclasses.replace(eval_cfg.model.head, output_depth=m),
                ),
            )
            infer_fns[m] = jax.jit(
                lambda params, bs, im, ei, el, cp, ps, sz, _c=mode_cfg: postprocess(
                    _c,
                    model.apply({"params": params, "batch_stats": bs}, im, ei, el,
                                train=False, lazy_topk=_c.test.lazy_reg_heads),
                    cp, ps, sz,
                )
            )

        def eval_ap(st, step_no):
            tmp = tempfile.mkdtemp()
            gd = os.path.join(tmp, "g")
            rds = {m: os.path.join(tmp, f"r_{m}") for m in depth_modes}
            os.makedirs(gd)
            for d in rds.values():
                os.makedirs(d)
            ids = []
            n_valid_total = 0
            max_raw_score = 0.0
            for s, (img, objs, calib) in zip(val_samples, val_raw):
                t = s.targets
                for m in depth_modes:
                    o = infer_fns[m](
                        st.params, st.batch_stats,
                        jnp.asarray(s.image[None]), jnp.asarray(t["edge_indices"][None]),
                        jnp.asarray(t["edge_len"][None]), jnp.asarray(t["calib_P_full"][None]),
                        jnp.asarray(t["pad_size"][None]), jnp.asarray(t["image_size"][None]),
                    )
                    dets = np.asarray(o["dets"])[0]
                    valid = np.asarray(o["valid"])[0]
                    if m == depth_modes[0]:
                        n_valid_total += int(valid.sum())
                        if dets.shape[0]:
                            max_raw_score = max(max_raw_score, float(dets[:, 13].max()))
                    with open(os.path.join(rds[m], f"{s.img_id}.txt"), "w") as f:
                        f.write("\n".join(format_kitti_lines(dets, valid)) + "\n")
                with open(os.path.join(gd, f"{s.img_id}.txt"), "w") as f:
                    for ob in objs:
                        f.write(
                            f"Car {ob.truncation:.2f} {ob.occlusion} {ob.alpha:.2f} "
                            f"{ob.box2d[0]:.2f} {ob.box2d[1]:.2f} {ob.box2d[2]:.2f} {ob.box2d[3]:.2f} "
                            f"{ob.h:.2f} {ob.w:.2f} {ob.l:.2f} "
                            f"{ob.t[0]:.2f} {ob.t[1]:.2f} {ob.t[2]:.2f} {ob.ry:.2f}\n"
                        )
                ids.append(s.img_id)
            split = os.path.join(tmp, "val.txt")
            with open(split, "w") as f:
                f.write("\n".join(ids))
            rec = {"step": step_no, "n_valid": int(n_valid_total),
                   "max_raw_score": round(float(max_raw_score), 4)}
            for m in depth_modes:
                _, ret = kitti_eval.evaluate_from_files(gd, rds[m], split, 0, metric="R40")
                sfx = "" if m == depth_modes[0] else f"_{m}"
                rec[f"ap_bbox_mod{sfx}"] = round(float(ret["Car_image/moderate"]), 3)
                rec[f"ap_bev_mod_05{sfx}"] = round(float(ret["Car_bev_moderate_R40_0.50"]), 3)
                rec[f"ap_3d_mod_05{sfx}"] = round(float(ret["Car_3d_moderate_R40_0.50"]), 3)
                rec[f"ap_bev_mod_07{sfx}"] = round(float(ret["Car_bev_moderate_R40_0.70"]), 3)
                rec[f"ap_3d_mod_07{sfx}"] = round(float(ret["Car_3d_moderate_R40_0.70"]), 3)
            shutil.rmtree(tmp)
            ap_hist.append(rec)
            print(f"#   eval@{step_no}: {rec}", file=sys.stderr)
            return rec

    ckptr = None
    if args.save_ckpt:
        from dcd_tpu.utils.checkpoint import Checkpointer

        ckptr = Checkpointer(args.save_ckpt)

    hist = []
    t0 = time.perf_counter()
    fh = open(args.out_jsonl, "w")
    for it in range(args.steps):
        if args.eval_every and it % args.eval_every == 0:
            eval_ap(state, it)
            if ckptr is not None and it > 0:
                # periodic save so a hung device session can't lose the run
                ckptr.save("model_final", state)
        state, logs = step_fn(state, batches[it % len(batches)])
        if it % args.log_every == 0 or it == args.steps - 1:
            rec = {"step": it, **{k: round(float(v), 5) for k, v in logs.items()}}
            hist.append(rec)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(f"step {it}: total={rec['total_loss']:.3f} "
                  f"edges_MAE={rec.get('edges_MAE', float('nan')):.3f}",
                  file=sys.stderr)
            assert np.isfinite(rec["total_loss"]), rec
    if args.eval_every:
        eval_ap(state, args.steps)
        for rec in ap_hist:
            fh.write(json.dumps({"ap_eval": rec}) + "\n")
    fh.close()
    wall = time.perf_counter() - t0

    if ckptr is not None:
        ckptr.save("model_final", state)
        print(f"# saved checkpoint to {args.save_ckpt}/model_final", file=sys.stderr)

    first, last = hist[0], hist[-1]
    keys = [k for k in last if k.endswith("_MAE") or k.endswith("IoU")] + [
        "total_loss", "hm_loss", "depth_loss", "keypoint_loss", "orien_loss",
    ]
    md = [
        "# CONVERGENCE — full-size synthetic training run",
        "",
        f"`python tools/convergence_run.py --steps {args.steps} --batch "
        f"{args.batch} --accum {args.accum} --pool {args.pool}` on "
        f"{jax.devices()[0]}: full 384x1280 input, shipped head widths, "
        "bf16 activations, pretrain off. Raw curves: "
        "docs/convergence_metrics.jsonl.",
        "",
        f"- wall: {wall:.0f}s for {args.steps} steps "
        f"({args.steps * args.batch / wall:.1f} img/s incl. logging)",
        "",
        "| metric | step 0 | step " + str(last["step"]) + " |",
        "|---|---|---|",
    ]
    for k in sorted(set(keys)):
        if k in first and k in last:
            md.append(f"| {k} | {first[k]:.4f} | {last[k]:.4f} |")
    if ap_hist:
        modes = [m.strip() for m in args.depth_modes.split(",") if m.strip()]
        md += ["", "## Official-evaluator AP trajectory (held-out synthetic val, moderate)", "",
               f"OUTPUT_DEPTH mode of the headline columns: **{modes[0]}** "
               "(the shipped config).", "",
               "| step | bbox | bev@0.5 | 3d@0.5 | bev@0.7 | 3d@0.7 |"
               + "".join(f" 3d@0.5 ({m}) | 3d@0.7 ({m}) |" for m in modes[1:])
               + " n_valid dets | max score |",
               "|---|---|---|---|---|---|" + "---|---|" * len(modes[1:]) + "---|---|"]
        for rec in ap_hist:
            extra = "".join(
                f" {rec[f'ap_3d_mod_05_{m}']:.2f} | {rec[f'ap_3d_mod_07_{m}']:.2f} |"
                for m in modes[1:]
            )
            md.append(
                f"| {rec['step']} | {rec['ap_bbox_mod']:.2f} | {rec['ap_bev_mod_05']:.2f} "
                f"| {rec['ap_3d_mod_05']:.2f} | {rec['ap_bev_mod_07']:.2f} | {rec['ap_3d_mod_07']:.2f} |"
                + extra
                + f" {rec['n_valid']} | {rec['max_raw_score']:.2f} |")
    loss_ok = last["total_loss"] < first["total_loss"]
    ok = loss_ok
    if ap_hist:
        # learning-evident gate: detections must appear (or AP rise) over
        # the run — from-scratch synthetic training reaches detection-
        # emergence around step ~600 and AP later (see docs/CONVERGENCE.md)
        ok = ok and (
            ap_hist[-1]["n_valid"] > ap_hist[0]["n_valid"]
            or ap_hist[-1]["ap_bbox_mod"] > ap_hist[0]["ap_bbox_mod"]
        )
    md += ["", f"**total_loss {'decreased' if loss_ok else 'DID NOT decrease'}: "
           f"{first['total_loss']:.3f} -> {last['total_loss']:.3f}**", ""]
    if ap_hist:
        md += [f"**detection emergence: n_valid {ap_hist[0]['n_valid']} -> "
               f"{ap_hist[-1]['n_valid']}, max score "
               f"{ap_hist[0]['max_raw_score']:.2f} -> {ap_hist[-1]['max_raw_score']:.2f}**", ""]
    with open(args.out_md, "w") as f:
        f.write("\n".join(md))
    print(json.dumps({"steps": args.steps, "first_loss": first["total_loss"],
                      "last_loss": last["total_loss"], "wall_sec": round(wall, 1),
                      "ok": ok}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
