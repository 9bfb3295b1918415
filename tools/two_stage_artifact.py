#!/usr/bin/env python
"""Two-stage artifact (VERDICT r4 next-round #1c): trained DGDE -> gen_data
-> trained GMW -> rescaled locations -> official AP, on the SAME held-out
synthetic scenes, showing what stage 2 does to 3D metrics vs stage 1.

Pipeline (mirrors /root/reference/README.md:39-63 + GMW/main.py:486-564,
using the same writer/loader/predict code paths as the CLIs):
  1. restore the stage-1 checkpoint saved by tools/convergence_run.py
  2. gen_data over the TRAIN pool (frozen-BN gen step, GT centers) ->
     gen_data_train.json
  3. inference over the HELD-OUT val scenes -> stage-1 KITTI txts +
     gen_data_infer.json
  4. train GMW on (2), refine depths of (3), rescale locations
     (GMW/main.py:540-548), write stage-2 txts
  5. official evaluator on both txt sets + 2D-IoU-matched depth MAE

Writes docs/TWO_STAGE.md.

Usage: python tools/two_stage_artifact.py --ckpt runs_ckpt_r5/model_final
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def iou_2d(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def matched_depth_errors(det_rows, gt_objs):
    """|z_det - z_gt| for detections matched to GT by 2D IoU > 0.5."""
    errs = []
    used = set()
    for row in det_rows:
        best, best_j = 0.5, None
        for j, ob in enumerate(gt_objs):
            if j in used:
                continue
            v = iou_2d(row[2:6], ob.box2d)
            if v > best:
                best, best_j = v, j
        if best_j is not None:
            used.add(best_j)
            errs.append(abs(row[11] - gt_objs[best_j].t[2]))
    return errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs_ckpt_r5/model_final")
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--val_scenes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--reg_start", type=int, default=30,
                    help="epoch of the cls->reg loss-weight flip (the "
                    "reference flips at 50 of 100, GMW/main.py:312-315; "
                    "scaled to the shorter schedule here)")
    ap.add_argument("--gmw_batch", type=int, default=8)
    ap.add_argument("--out", default="docs/TWO_STAGE.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.gen_data import (
        GenDataInferWriter, GenDataTrainWriter, load_gen_data_infer,
        load_gen_data_train, normalize_batch_kpts, normalize_kpts_2d,
    )
    from dcd_tpu.data.target_encoder import collate, encode_targets
    from dcd_tpu.engine.gen import make_gen_step
    from dcd_tpu.engine.gmw_train import (
        GMWConfig, create_gmw_state, loss_weights_for_epoch, make_gmw_predict,
        make_gmw_train_step, rescale_location,
    )
    from dcd_tpu.engine.infer import format_kitti_lines, postprocess
    from dcd_tpu.engine.train import create_train_state
    from dcd_tpu.evaluation import kitti_eval
    from dcd_tpu.utils.checkpoint import Checkpointer

    t0 = time.time()
    cfg = dgde_run_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fp16=True, pretrain=False)
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt_dir, ckpt_name = os.path.split(args.ckpt.rstrip("/"))
    state = Checkpointer(ckpt_dir or ".").load(state, args.ckpt)
    print(f"# restored {args.ckpt} (step {int(state.step)})", file=sys.stderr)

    # ---- 2. gen_data over the train pool (GT-center interchange) ----
    gen_cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, generate_gmw=True)
    )
    gen_step = jax.jit(make_gen_step(gen_cfg, model))
    writer = GenDataTrainWriter()
    M = cfg.datasets.max_objects
    for lo in range(0, args.pool, args.batch):
        samples = [
            encode_targets(*synthetic.make_scene(seed=s, num_objs=8), cfg,
                           img_id=f"{s:06d}")
            for s in range(lo, min(lo + args.batch, args.pool))
        ]
        if len(samples) < args.batch:
            break
        batch = {k: jnp.asarray(v) for k, v in collate(samples).items()
                 if not isinstance(v, list)}
        out = gen_step(state.params, state.batch_stats, batch)
        m = np.asarray(out["mask"]).astype(bool)
        kpts_norm = normalize_batch_kpts(
            np.asarray(out["kpts_2d_img"])[m],
            np.where(m.reshape(-1))[0] // M,
            [s.calib.P for s in samples],
            per_sample_calib=False,
        )
        writer.add_batch(
            kpts_norm,
            np.asarray(out["kpts_3d"])[m],
            np.asarray(out["pred_rot"])[m],
            np.asarray(out["gt_location"])[m],
            np.asarray(out["pred_location"])[m],
            [samples[k // M].img_id for k in np.where(m.reshape(-1))[0]],
        )
    tmp = tempfile.mkdtemp()
    train_json = os.path.join(tmp, "gen_data_train.json")
    writer.dump(train_json)
    # the interchange is batched (reference schema); count objects
    n_train_objs = sum(len(b) for b in json.load(open(train_json))["kpts_2d"])
    print(f"# gen_data_train: {n_train_objs} objects", file=sys.stderr)

    # ---- 3. stage-1 inference on held-out val + gen_data_infer ----
    # raw heatmap confidence, like the convergence-run evaluator: the
    # uncertainty->confidence rescoring zeroes every score until the depth
    # uncertainties train below 1 m (see tools/convergence_run.py)
    eval_cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, uncertainty_as_confidence=False)
    )
    infer_fn = jax.jit(
        lambda p, bs, im, ei, el, cp, ps, sz: postprocess(
            eval_cfg,
            model.apply({"params": p, "batch_stats": bs}, im, ei, el,
                        train=False, lazy_topk=eval_cfg.test.lazy_reg_heads),
            cp, ps, sz,
        )
    )
    val_raw = [synthetic.make_scene(seed=10_000 + s, num_objs=8)
               for s in range(args.val_scenes)]
    val_samples = [
        encode_targets(img, objs, calib, cfg, img_id=f"{10_000 + s:06d}")
        for s, (img, objs, calib) in enumerate(val_raw)
    ]
    gd = os.path.join(tmp, "gt")
    rd1 = os.path.join(tmp, "stage1")
    rd2 = os.path.join(tmp, "stage2")
    for d in (gd, rd1, rd2):
        os.makedirs(d)
    iw = GenDataInferWriter()
    ids = []
    stage1_rows = {}
    for s, (img, objs, calib) in zip(val_samples, val_raw):
        t = s.targets
        o = infer_fn(
            state.params, state.batch_stats,
            jnp.asarray(s.image[None]), jnp.asarray(t["edge_indices"][None]),
            jnp.asarray(t["edge_len"][None]), jnp.asarray(t["calib_P_full"][None]),
            jnp.asarray(t["pad_size"][None]), jnp.asarray(t["image_size"][None]),
        )
        dets = np.asarray(o["dets"])[0]
        valid = np.asarray(o["valid"])[0]
        stage1_rows[s.img_id] = (dets[valid], objs)
        with open(os.path.join(rd1, f"{s.img_id}.txt"), "w") as f:
            f.write("\n".join(format_kitti_lines(dets, valid)) + "\n")
        with open(os.path.join(gd, f"{s.img_id}.txt"), "w") as f:
            for ob in objs:
                f.write(
                    f"Car {ob.truncation:.2f} {ob.occlusion} {ob.alpha:.2f} "
                    f"{ob.box2d[0]:.2f} {ob.box2d[1]:.2f} {ob.box2d[2]:.2f} {ob.box2d[3]:.2f} "
                    f"{ob.h:.2f} {ob.w:.2f} {ob.l:.2f} "
                    f"{ob.t[0]:.2f} {ob.t[1]:.2f} {ob.t[2]:.2f} {ob.ry:.2f}\n"
                )
        kp2 = np.asarray(o["kpts_2d"])[0]
        iw.add_image(s.img_id, dets, valid,
                     normalize_kpts_2d(kp2, s.calib.P), np.asarray(o["kpts_3d"])[0])
        ids.append(s.img_id)
    infer_json = os.path.join(tmp, "gen_data_infer.json")
    iw.dump(infer_json)
    split = os.path.join(tmp, "val.txt")
    with open(split, "w") as f:
        f.write("\n".join(ids))

    # ---- 4. GMW training on the interchange ----
    n_kpts = cfg.model.head.num_kpts
    gcfg = GMWConfig(num_kpts=n_kpts, epochs=args.epochs,
                     batch_size=args.gmw_batch,
                     reg_loss_start_epoch=args.reg_start)
    train = load_gen_data_train(train_json, n_kpts)
    N = train["kpts_2d"].shape[0]
    gmodel, gstate = create_gmw_state(
        gcfg, jax.random.PRNGKey(1),
        steps_per_epoch=max(N // gcfg.batch_size, 1),
    )
    gstep = jax.jit(make_gmw_train_step(gcfg, gmodel))
    predict = jax.jit(make_gmw_predict(gcfg, gmodel))
    rng = np.random.RandomState(0)
    for epoch in range(1, args.epochs + 1):
        cls_w, reg_w = loss_weights_for_epoch(gcfg, epoch)
        order = rng.permutation(N)
        last = {}
        for lo in range(0, N - gcfg.batch_size + 1, gcfg.batch_size):
            idx = order[lo:lo + gcfg.batch_size]
            batch = {
                "kpts_2d": jnp.asarray(train["kpts_2d"][idx]),
                "kpts_3d": jnp.asarray(train["kpts_3d"][idx]),
                "pred_rot": jnp.asarray(train["pred_rot"][idx, 0]),
                "gt_depth": jnp.asarray(train["gt_location"][idx, 2]),
            }
            gstate, logs = gstep(gstate, batch, jnp.float32(cls_w), jnp.float32(reg_w))
            last = logs
        if epoch % 10 == 0 or epoch == args.epochs:
            print(f"# gmw epoch {epoch}: "
                  + " ".join(f"{k}={float(v):.4f}" for k, v in last.items()),
                  file=sys.stderr)

    # ---- refine val detections, write stage-2 txts ----
    arrays, img_idx = load_gen_data_infer(infer_json, n_kpts)
    n_val = arrays["kpts_2d"].shape[0]
    refined = {}
    bs = max(args.gmw_batch, 1)
    for lo in range(0, n_val, bs):
        sl = slice(lo, min(lo + bs, n_val))
        batch = {
            "kpts_2d": jnp.asarray(arrays["kpts_2d"][sl]),
            "kpts_3d": jnp.asarray(arrays["kpts_3d"][sl]),
            "pred_rot": jnp.asarray(arrays["pred_rot"][sl, 0]),
        }
        depths = np.asarray(predict(gstate.params, batch))
        locs = rescale_location(arrays["pred_location"][sl], depths, arrays["dim"][sl])
        for k, (img, det) in enumerate(img_idx[sl]):
            refined.setdefault(img, {})[det] = locs[k]
    with open(infer_json) as f:
        raw = json.load(f)
    stage2_rows = {}
    for img in ids:
        lines = []
        rows = []
        for det, a in enumerate(raw.get(img, [])):
            loc = refined.get(img, {}).get(det, a["pred_location"])
            box, dim = a["box"], a["dim"]
            ori = a["pred_rot"][0] if isinstance(a["pred_rot"], list) else a["pred_rot"]
            score = a["score"][0] if isinstance(a["score"], list) else a["score"]
            alpha = ori - np.arctan2(loc[0], loc[2])
            lines.append(
                f"Car -1.00 -1 {alpha:.7f} "
                + " ".join(f"{v:.7f}" for v in box) + " "
                + " ".join(f"{v:.7f}" for v in dim) + " "
                + " ".join(f"{v:.7f}" for v in loc)
                + f" {ori:.7f} {score:.7f}"
            )
            rows.append([0, alpha, *box, *dim, *loc, ori, score])
        with open(os.path.join(rd2, f"{img}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        stage2_rows[img] = np.asarray(rows).reshape(-1, 14)

    # ---- 5. official AP + matched depth MAE, both stages ----
    results = {}
    for tag, rdir in (("stage1", rd1), ("stage2", rd2)):
        _, ret = kitti_eval.evaluate_from_files(gd, rdir, split, 0, metric="R40")
        results[tag] = {k: round(float(v), 3) for k, v in ret.items()}
    errs1, errs2 = [], []
    n_dets = 0
    for img in ids:
        dets1, objs = stage1_rows[img]
        n_dets += len(dets1)
        errs1 += matched_depth_errors(dets1, objs)
        errs2 += matched_depth_errors(stage2_rows[img], objs)
    mae1 = float(np.mean(errs1)) if errs1 else float("nan")
    mae2 = float(np.mean(errs2)) if errs2 else float("nan")

    keys = [
        ("bbox", "Car_image/moderate"),
        ("bev@0.5", "Car_bev_moderate_R40_0.50"),
        ("3d@0.5", "Car_3d_moderate_R40_0.50"),
        ("bev@0.7", "Car_bev_moderate_R40_0.70"),
        ("3d@0.7", "Car_3d_moderate_R40_0.70"),
    ]
    md = [
        "# TWO_STAGE — trained DGDE -> gen_data -> trained GMW -> official AP",
        "",
        f"`python tools/two_stage_artifact.py --ckpt {args.ckpt} --pool "
        f"{args.pool} --epochs {args.epochs} --reg_start {args.reg_start}`:",
        "the full reference pipeline (README.md:39-63) on synthetic data —",
        f"stage 1 restored from the convergence-run checkpoint, gen_data over",
        f"the {args.pool}-scene train pool ({n_train_objs} objects), GMW",
        f"trained {args.epochs} epochs (cls->reg flip at {args.reg_start},",
        "GMW/main.py:312-315), depths refined and locations rescaled",
        f"(GMW/main.py:540-548) on {args.val_scenes} HELD-OUT scenes",
        f"({n_dets} stage-1 detections), scored by the official evaluator.",
        "",
        "| metric (Car moderate R40) | stage 1 | stage 2 (GMW-refined) |",
        "|---|---|---|",
    ]
    for label, key in keys:
        md.append(f"| {label} | {results['stage1'][key]:.2f} | {results['stage2'][key]:.2f} |")
    md += [
        f"| depth MAE of 2D-matched dets (m) | {mae1:.3f} | {mae2:.3f} |",
        "",
        f"matched detections: {len(errs1)} (stage 1) / {len(errs2)} (stage 2);"
        f" wall {time.time() - t0:.0f}s",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))
    moved = abs(mae2 - mae1) > 1e-6 or any(
        results["stage2"][k] != results["stage1"][k] for _, k in keys
    )
    print(f"\nRESULT: stage2 {'moved metrics' if moved else 'DID NOT move metrics'}; "
          f"depth MAE {mae1:.3f} -> {mae2:.3f}")


if __name__ == "__main__":
    main()
