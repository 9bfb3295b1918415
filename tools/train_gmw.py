#!/usr/bin/env python
"""GMW (stage 2) training / validation CLI.

Mirrors ``GMW/main.py``: loads gen_data_{train,infer}.json, trains the
graph-matching weighting net with the epoch-50 loss-weight flip, validates
by refining detection depths and rewriting KITTI result txts, then runs the
official AP evaluator.

Usage:
  python tools/train_gmw.py --train_data gen_data/gen_data_train.json \
      --val_data gen_data/gen_data_infer.json --kitti_path /path/kitti \
      --log_dir logs/gmw --epochs 100
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    # flags mirror GMW/main.py:47-93
    p = argparse.ArgumentParser()
    p.add_argument("--train_data", default="gen_data/gen_data_train.json")
    p.add_argument("--val_data", default="gen_data/gen_data_infer.json")
    p.add_argument("--kitti_path", default=None)
    p.add_argument("--log_dir", default="logs/gmw")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--cls_weight", type=float, default=1.0)
    p.add_argument("--reg_weight", type=float, default=0.1)
    p.add_argument("--reg_loss_start_epoch", type=int, default=50)
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_every", type=int, default=5, help="epochs between checkpoints (reference GMW/main.py:318)")
    p.add_argument("--val_every", type=int, default=5, help="epochs between validations (reference GMW/main.py:316-320)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_kpts", type=int, default=73)
    p.add_argument(
        "--topk", type=int, default=1500,
        help="edges kept by |dV| in compute_z (GMW/main.py:404); must be "
        "<= num_kpts*(num_kpts-1)/2 for reduced-keypoint runs",
    )
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    # honor an explicit JAX_PLATFORMS request even when a site plugin
    # (e.g. the axon TPU sitecustomize) force-set jax_platforms at import
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dcd_tpu.data.gen_data import load_gen_data_infer, load_gen_data_train
    from dcd_tpu.engine.gmw_train import (
        GMWConfig,
        create_gmw_state,
        loss_weights_for_epoch,
        make_gmw_predict,
        make_gmw_train_step,
        rescale_location,
    )
    from dcd_tpu.utils.logger import setup_logger
    from dcd_tpu.utils.metrics import MetricLogger

    n_pairs = args.num_kpts * (args.num_kpts - 1) // 2
    cfg = GMWConfig(
        num_kpts=args.num_kpts,
        lr=args.lr,
        weight_decay=args.weight_decay,
        epochs=args.epochs,
        batch_size=args.batch_size,
        cls_weight=args.cls_weight,
        reg_weight=args.reg_weight,
        reg_loss_start_epoch=args.reg_loss_start_epoch,
        topk=min(args.topk, n_pairs),
    )
    from dcd_tpu.parallel import batch_sharding, make_mesh, replicate
    from dcd_tpu.utils.checkpoint import Checkpointer

    logger = setup_logger("dcd_tpu.gmw", args.log_dir)

    train = None
    n_train = steps_per_epoch = 0
    if not args.evaluate:
        train = load_gen_data_train(args.train_data, cfg.num_kpts)
        n_train = train["kpts_2d"].shape[0]
        steps_per_epoch = max(n_train // cfg.batch_size, 1)
        logger.info(f"train objects: {n_train} ({steps_per_epoch} steps/epoch)")

    model, state = create_gmw_state(
        cfg, jax.random.PRNGKey(args.seed), steps_per_epoch=max(steps_per_epoch, 1)
    )
    ckptr = Checkpointer(os.path.join(args.log_dir, "ckpt"))
    start_epoch = 0
    if args.resume and ckptr.has_checkpoint():
        state = ckptr.load(state)
        start_epoch = int(state.step)  # step counts epochs at save time
        logger.info(f"resumed at epoch {start_epoch}")

    # Data parallelism over all local devices (reference: 4-GPU DDP + SyncBN,
    # GMW/main.py:249-253): batch sharded over the mesh's 'data' axis, params
    # replicated; XLA inserts the gradient all-reduce from the global-mean loss.
    devices = jax.devices()
    n_dp = len(devices)
    while n_dp > 1 and cfg.batch_size % n_dp != 0:
        n_dp -= 1
    mesh = make_mesh(devices[:n_dp])
    state = replicate(state, mesh)
    bshard = batch_sharding(mesh)
    if n_dp > 1:
        logger.info(f"data-parallel over {n_dp} devices")

    def put(batch):
        return {k: jax.device_put(jnp.asarray(v), bshard) for k, v in batch.items()}

    step = jax.jit(make_gmw_train_step(cfg, model))
    predict = jax.jit(make_gmw_predict(cfg, model))

    rng = np.random.RandomState(args.seed)
    meters = MetricLogger()

    def run_validation(st, epoch=None):
        """Refine depths, rewrite KITTI txts, return the tracked metric
        (Car AP3D|R40 moderate if kitti_path is given, else -depth-MAE).
        Mirrors GMW/main.py:486-564."""
        arrays, img_idx = load_gen_data_infer(args.val_data, cfg.num_kpts)
        n_val = arrays["kpts_2d"].shape[0]
        result_dir = os.path.join(args.log_dir, "kitti_results_for_eval")
        os.makedirs(result_dir, exist_ok=True)
        refined = {}
        all_depths = []
        bs = max(args.batch_size, 1)
        for start in range(0, n_val, bs):
            sl = slice(start, min(start + bs, n_val))
            batch = {
                "kpts_2d": jnp.asarray(arrays["kpts_2d"][sl]),
                "kpts_3d": jnp.asarray(arrays["kpts_3d"][sl]),
                "pred_rot": jnp.asarray(arrays["pred_rot"][sl, 0]),
            }
            depths = np.asarray(predict(st.params, batch))
            all_depths.append(depths)
            locs = rescale_location(arrays["pred_location"][sl], depths, arrays["dim"][sl])
            for k, (img, det) in enumerate(img_idx[sl]):
                refined.setdefault(img, {})[det] = locs[k]
        # write txts using the original box/dim/rot/score + refined location
        import json

        with open(args.val_data) as f:
            raw = json.load(f)
        ids = sorted(raw.keys())
        for img in ids:
            lines = []
            for det, a in enumerate(raw[img]):
                loc = refined.get(img, {}).get(det, a["pred_location"])
                box, dim = a["box"], a["dim"]
                ori = a["pred_rot"][0] if isinstance(a["pred_rot"], list) else a["pred_rot"]
                score = a["score"][0] if isinstance(a["score"], list) else a["score"]
                alpha = ori - np.arctan2(loc[0], loc[2])
                lines.append(
                    f"Car -1.00 -1 {alpha:.7f} "
                    + " ".join(f"{v:.7f}" for v in box)
                    + " "
                    + " ".join(f"{v:.7f}" for v in dim)
                    + " "
                    + " ".join(f"{v:.7f}" for v in loc)
                    + f" {ori:.7f} {score:.7f}"
                )
            with open(os.path.join(result_dir, f"{img}.txt"), "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        tag = f"epoch {epoch}: " if epoch is not None else ""
        logger.info(f"{tag}wrote refined detections to {result_dir}")

        if args.kitti_path:
            from dcd_tpu.evaluation import evaluate_from_files

            result, ret = evaluate_from_files(
                os.path.join(args.kitti_path, "training", "label_2"),
                result_dir,
                os.path.join(args.kitti_path, "training", "ImageSets", "val.txt"),
                current_class=0,
                metric="R40",
            )
            logger.info("\n" + result)
            return float(ret.get("Car_3d_moderate_R40_0.70", float("-inf")))
        # no labels: track mean refined depth's distance from the raw
        # estimate as a proxy so best-model selection still functions
        if n_val == 0:
            return float("-inf")
        raw_z = arrays["pred_location"][:, 2]
        mae = float(np.mean(np.abs(np.concatenate(all_depths) - raw_z) / np.maximum(raw_z, 1e-6)))
        logger.info(f"{tag}val depth shift vs raw: {mae:.4f}")
        return -mae

    have_val = bool(args.val_data and os.path.exists(args.val_data))
    best_metric = float("-inf")

    if not args.evaluate:
        for epoch in range(start_epoch + 1, args.epochs + 1):
            cls_w, reg_w = loss_weights_for_epoch(cfg, epoch)
            order = rng.permutation(n_train)
            for start in range(0, n_train - cfg.batch_size + 1, cfg.batch_size):
                idx = order[start : start + cfg.batch_size]
                batch = put({
                    "kpts_2d": train["kpts_2d"][idx],
                    "kpts_3d": train["kpts_3d"][idx],
                    "pred_rot": train["pred_rot"][idx, 0],
                    "gt_depth": train["gt_location"][idx, 2],
                })
                state, logs = step(state, batch, jnp.float32(cls_w), jnp.float32(reg_w))
                meters.update(**{k: float(v) for k, v in logs.items()})
            logger.info(f"epoch {epoch}: {meters}")
            # periodic validation + best-model tracking (GMW/main.py:316-320)
            if have_val and args.val_every > 0 and epoch % args.val_every == 0:
                metric = run_validation(state, epoch=epoch)
                if metric > best_metric:
                    best_metric = metric
                    ckptr.save("model_best", state.replace(step=jnp.asarray(epoch)))
                    logger.info(f"epoch {epoch}: new best ({metric:.4f})")
            if args.save_every > 0 and epoch % args.save_every == 0:
                ckptr.save(f"checkpoint_epoch_{epoch}", state.replace(step=jnp.asarray(epoch)))
        ckptr.save("checkpoint_final", state.replace(step=jnp.asarray(args.epochs)))

    # final validation: refine depths and rewrite KITTI txts (GMW/main.py:486-564)
    if have_val:
        run_validation(state)


if __name__ == "__main__":
    main()
