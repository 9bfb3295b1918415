#!/usr/bin/env python
"""DGDE (stage 1) training / evaluation / gen-for-GMW CLI.

Mirrors ``DGDE/tools/plain_train_net.py`` + ``engine/trainer.py``:
iteration loop with warmup/decay LR, loss-dict logging, periodic
checkpointing, optional eval-only and --generate_for_GMW modes. The
mp.spawn/NCCL launcher becomes ``jax.distributed.initialize`` + a device
mesh (one process per host).

Usage:
  python tools/train_dgde.py --config runs/DGDE.yaml --data_root /path/kitti/training
  python tools/train_dgde.py --config runs/DGDE.yaml --data_root ... --eval --ckpt DIR
  python tools/train_dgde.py --config runs/DGDE.yaml --data_root ... --generate_for_GMW --ckpt DIR
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    # flags mirror engine/defaults.py:15-70
    p = argparse.ArgumentParser(description="DGDE TPU training")
    p.add_argument("--config", default=None, help="experiment yaml (reference runs/DGDE.yaml layout)")
    p.add_argument("--data_root", required=False, default=None, help="KITTI training dir")
    p.add_argument("--output", default="./logs")
    p.add_argument("--eval", action="store_true", help="evaluate only")
    p.add_argument("--generate_for_GMW", action="store_true")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_iters", type=int, default=None, help="override max iterations")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--pretrain", default=None, metavar="SRC",
        help="ImageNet DLA-34 weights: a .pth path, catalog://ImageNetPretrained/DLA34, "
        "or an http(s) URL (reference dla_dcn.py:344-358)",
    )
    p.add_argument(
        "--finetune", default=None, metavar="CKPT",
        help="load model weights from an orbax checkpoint, reset the iteration "
        "counter, and freeze cfg.model.freeze_names (reference check_point.py:98-114)",
    )
    p.add_argument(
        "--vis", type=int, default=0, metavar="N",
        help="with --eval: write debug panels (pred+GT wireframes, BEV, "
        "heatmap) for the first N images to OUTPUT/vis "
        "(reference visualize_infer.show_image_with_boxes)",
    )
    p.add_argument(
        "--per_sample_calib", action="store_true",
        help="with --generate_for_GMW: normalize each sample's keypoints with "
        "its OWN calibration. Default keeps the reference quirk of using "
        "sample 0's calib for the whole batch (detector_loss.py:150)",
    )
    p.add_argument("--seed", type=int, default=0)
    # multi-host
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import dataclasses

    import jax

    # honor an explicit JAX_PLATFORMS request even when a site plugin
    # (e.g. the axon TPU sitecustomize) force-set jax_platforms at import
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dcd_tpu.config import dgde_run_config, load_yaml_config
    from dcd_tpu.data.kitti_dataset import make_data_loader
    from dcd_tpu.engine.train import create_train_state, make_train_step
    from dcd_tpu.parallel import initialize_distributed, make_mesh, replicate, shard_batch
    from dcd_tpu.utils.checkpoint import Checkpointer
    from dcd_tpu.utils.logger import setup_logger
    from dcd_tpu.utils.metrics import MetricLogger

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    # environment dump at startup (reference utils/collect_env.py run from
    # train.py — same observability, one line per fact)
    import platform as _platform

    print(
        f"env: python {_platform.python_version()} | jax {jax.__version__} | "
        f"backend {jax.default_backend()} | devices {jax.device_count()} "
        f"({jax.devices()[0].device_kind if jax.devices() else '?'}) | "
        f"{_platform.platform()}"
    )

    cfg = dgde_run_config()
    if args.config:
        cfg = load_yaml_config(args.config, base=cfg)
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, ims_per_batch=args.batch_size)
        )
    cfg = dataclasses.replace(cfg, output_dir=args.output, seed=args.seed)
    if args.pretrain:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, pretrain=True, pretrain_path=args.pretrain),
        )

    logger = setup_logger("dcd_tpu", cfg.output_dir, jax.process_index())
    logger.info(f"devices: {jax.devices()}")

    mesh = make_mesh()
    loader = make_data_loader(
        cfg, args.data_root, is_train=True,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    iters_per_epoch = max(len(loader.dataset) // cfg.solver.ims_per_batch, 1)
    max_iter = args.num_iters or int(cfg.solver.max_epochs * iters_per_epoch)

    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed), iters_per_epoch)
    ckptr = Checkpointer(os.path.join(cfg.output_dir, "ckpt"))
    if args.resume and ckptr.has_checkpoint():
        state = ckptr.load(state)
        logger.info(f"resumed at step {int(state.step)}")
    elif args.finetune:
        # load weights only, reset the iteration counter; param subtrees in
        # cfg.model.freeze_names get zeroed updates from the optimizer
        # (reference Checkpointer.finetune, check_point.py:98-114)
        import jax.numpy as _jnp

        state = ckptr.load(state, args.finetune, model_only=True).replace(
            step=_jnp.zeros((), _jnp.int32)
        )
        logger.info(
            f"finetune from {args.finetune}; frozen: {list(cfg.model.freeze_names)}"
        )
    elif args.ckpt and args.ckpt.endswith((".pth", ".pkl")):
        # a reference torch checkpoint: import the full detector
        # (backbone + DCN decoder + heads) — the AP-parity path
        from dcd_tpu.utils.checkpoint import (
            import_torch_dgde, load_torch_checkpoint, resolve_checkpoint_source,
        )

        sd = load_torch_checkpoint(resolve_checkpoint_source(args.ckpt))
        params, stats = import_torch_dgde(sd, {
            "params": state.params, "batch_stats": state.batch_stats,
        }, cfg)
        state = state.replace(params=params, batch_stats=stats)
        logger.info(f"imported torch DGDE checkpoint {args.ckpt}")
    elif args.ckpt:
        state = ckptr.load(state, args.ckpt)

    if args.eval:
        run_eval(cfg, args, model, state, logger)
        return
    if args.generate_for_GMW:
        generate_for_gmw(cfg, args, model, state, logger)
        return

    from dcd_tpu.utils.writer import MetricWriter

    step_fn = jax.jit(make_train_step(cfg, model, iters_per_epoch))
    state = replicate(state, mesh)
    meters = MetricLogger()
    writer = MetricWriter(os.path.join(cfg.output_dir, "writer")) if jax.process_index() == 0 else None
    save_every = int(cfg.solver.save_checkpoint_epoch_interval * iters_per_epoch)

    # continue the deterministic sample stream where the restored step left
    # off (round-1 weakness: resume restarted the stream from scratch)
    loader.start_batch = int(state.step)
    if loader.buckets:
        logger.info(
            f"multi-scale buckets: {[(b.width, b.height) for b in loader.buckets]}"
        )

    t_end = time.perf_counter()
    for batch, iteration in zip(loader, range(int(state.step), max_iter)):
        data_time = time.perf_counter() - t_end
        batch.pop("img_ids", None)
        batch = shard_batch(batch, mesh)
        state, logs = step_fn(state, batch)
        batch_time = time.perf_counter() - t_end
        t_end = time.perf_counter()
        meters.update(time=batch_time, data=data_time, **{k: float(v) for k, v in logs.items()})
        if iteration % 10 == 0:
            logger.info(f"iter {iteration}/{max_iter}  {meters}")
            if writer is not None:
                writer.write_scalars(
                    iteration, {k: float(v) for k, v in logs.items()}, prefix="train/"
                )
        if save_every > 0 and (iteration + 1) % save_every == 0 and jax.process_index() == 0:
            ckptr.save(f"model_checkpoint_{(iteration + 1) // iters_per_epoch}", state)
    if jax.process_index() == 0:
        ckptr.save("model_final", state)
    logger.info("training done")


def run_eval(cfg, args, model, state, logger):
    """Sharded multi-process evaluation: each process runs inference on its
    InferenceSampler shard and writes per-image KITTI txts; the shared
    filesystem is the gather medium (replacing the reference's pickled
    all_gather, utils/comm.py:140-175 + distributed_sampler.py:175-202);
    process 0 computes AP after a global barrier."""
    import jax
    import jax.numpy as jnp

    from dcd_tpu.data.kitti_dataset import InferenceSampler, KITTIDataset
    from dcd_tpu.engine.infer import format_kitti_lines, postprocess
    from dcd_tpu.evaluation import evaluate_from_files
    from dcd_tpu.utils.timer import Timer

    ds = KITTIDataset(cfg, args.data_root, is_train=False, augment=False)
    out_dir = os.path.join(cfg.output_dir, "inference", "data")
    os.makedirs(out_dir, exist_ok=True)
    sampler = InferenceSampler(len(ds), jax.process_index(), jax.process_count())
    n_vis = int(getattr(args, "vis", 0))
    vis_dir = os.path.join(cfg.output_dir, "vis")
    if n_vis:
        os.makedirs(vis_dir, exist_ok=True)

    @jax.jit
    def infer(images, edge_idx, edge_len, calib_P, pad_size, img_size):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, edge_idx, edge_len, train=False,
            lazy_topk=cfg.test.lazy_reg_heads,
        )
        return postprocess(cfg, preds, calib_P, pad_size, img_size)

    timer = Timer()
    warmed = False
    for i in sampler:
        s = ds.get_sample(i)
        t = s.targets
        if not warmed:
            # throwaway call so jit compile time doesn't pollute the img/s
            # number (reference times around a pre-compiled CUDA forward,
            # inference.py:39-46)
            jax.block_until_ready(infer(
                jnp.asarray(s.image[None]),
                jnp.asarray(t["edge_indices"][None]),
                jnp.asarray(t["edge_len"][None]),
                jnp.asarray(t["calib_P_full"][None]),
                jnp.asarray(t["pad_size"][None]),
                jnp.asarray(t["image_size"][None]),
            ))
            warmed = True
        timer.tic()
        out = infer(
            jnp.asarray(s.image[None]),
            jnp.asarray(t["edge_indices"][None]),
            jnp.asarray(t["edge_len"][None]),
            jnp.asarray(t["calib_P_full"][None]),
            jnp.asarray(t["pad_size"][None]),
            jnp.asarray(t["image_size"][None]),
        )
        timer.toc(sync=out["dets"])
        lines = format_kitti_lines(np.asarray(out["dets"])[0], np.asarray(out["valid"])[0])
        with open(os.path.join(out_dir, f"{s.img_id}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
        if n_vis > 0:
            n_vis -= 1
            from dcd_tpu.data.kitti_dataset import _load_image
            from dcd_tpu.utils.visualize import (
                gt_rows_from_objects, save_scene_visualization,
            )

            # detections are in original-image coordinates, so draw on the
            # raw (unpadded) frame
            rgb = _load_image(os.path.join(ds.image_dir, f"{s.img_id}.png"))
            objs = ds._load_objects(s.img_id) or []
            save_scene_visualization(
                os.path.join(vis_dir, f"{s.img_id}.png"),
                rgb,
                np.asarray(out["dets"])[0],
                np.asarray(out["valid"])[0],
                s.calib,
                gt_rows=gt_rows_from_objects(objs),
            )
    logger.info(f"inference: {1.0 / max(timer.average_time, 1e-9):.1f} img/s")
    if jax.process_count() > 1:
        # barrier so every process's txts are on disk before AP
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("dcd_eval_gather")
    if jax.process_index() != 0:
        return
    result, ret = evaluate_from_files(
        os.path.join(args.data_root, "label_2"),
        out_dir,
        os.path.join(args.data_root, "ImageSets", f"{cfg.datasets.test_split}.txt"),
        current_class=list(cfg.datasets.detect_classes),
        metric=cfg.test.metric[0],
    )
    logger.info("\n" + result)
    import json

    with open(os.path.join(cfg.output_dir, "inference", "result.json"), "w") as f:
        json.dump({k: float(v) for k, v in ret.items()}, f, indent=1)


def generate_for_gmw(cfg, args, model, state, logger):
    """Gen-data pass (reference trainer.py:89-98,208-221 + inference hook):
    frozen-BN forward over the train split dumping gen_data_train.json, then
    an inference pass dumping gen_data_infer.json."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from dcd_tpu.data.gen_data import (
        GenDataInferWriter, GenDataTrainWriter, normalize_batch_kpts, normalize_kpts_2d,
    )
    from dcd_tpu.data.kitti_dataset import KITTIDataset, make_data_loader
    from dcd_tpu.engine.gen import make_gen_step
    from dcd_tpu.engine.infer import postprocess

    gen_cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, generate_gmw=True)
    )
    # one epoch over train, no shuffling, no aug, BN frozen (eval-mode stats)
    ds = KITTIDataset(gen_cfg, args.data_root, is_train=True, augment=False)
    writer = GenDataTrainWriter()
    gen_step = jax.jit(make_gen_step(gen_cfg, model))

    bs = gen_cfg.solver.ims_per_batch
    from dcd_tpu.data.target_encoder import collate

    for start in range(0, len(ds), bs):
        idxs = list(range(start, min(start + bs, len(ds))))
        if len(idxs) < bs:
            break
        samples = [ds.get_sample(i) for i in idxs]
        batch = collate(samples)
        out = gen_step(state.params, state.batch_stats, batch)
        m = np.asarray(out["mask"]).astype(bool)
        # default reproduces the reference quirk (calib[0].P for the whole
        # batch, detector_loss.py:150); --per_sample_calib corrects it
        kpts_norm = normalize_batch_kpts(
            np.asarray(out["kpts_2d_img"])[m],
            np.where(m.reshape(-1))[0] // gen_cfg.datasets.max_objects,
            [s.calib.P for s in samples],
            per_sample_calib=getattr(args, "per_sample_calib", False),
        )
        writer.add_batch(
            kpts_norm,
            np.asarray(out["kpts_3d"])[m],
            np.asarray(out["pred_rot"])[m],
            np.asarray(out["gt_location"])[m],
            np.asarray(out["pred_location"])[m],
            [samples[k // gen_cfg.datasets.max_objects].img_id for k in np.where(m.reshape(-1))[0]],
        )
    os.makedirs("gen_data", exist_ok=True)
    writer.dump("gen_data/gen_data_train.json")
    logger.info("wrote gen_data/gen_data_train.json")

    # inference pass over val
    ds_val = KITTIDataset(gen_cfg, args.data_root, is_train=False, augment=False)
    iw = GenDataInferWriter()

    @jax.jit
    def infer(images, edge_idx, edge_len, calib_P, pad_size, img_size):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, edge_idx, edge_len, train=False,
            lazy_topk=gen_cfg.test.lazy_reg_heads,
        )
        return postprocess(gen_cfg, preds, calib_P, pad_size, img_size)

    for i in range(len(ds_val)):
        s = ds_val.get_sample(i)
        t = s.targets
        out = infer(
            jnp.asarray(s.image[None]),
            jnp.asarray(t["edge_indices"][None]),
            jnp.asarray(t["edge_len"][None]),
            jnp.asarray(t["calib_P_full"][None]),
            jnp.asarray(t["pad_size"][None]),
            jnp.asarray(t["image_size"][None]),
        )
        kp2 = np.asarray(out["kpts_2d"])[0]
        iw.add_image(
            s.img_id,
            np.asarray(out["dets"])[0],
            np.asarray(out["valid"])[0],
            normalize_kpts_2d(kp2, s.calib.P),
            np.asarray(out["kpts_3d"])[0],
        )
    iw.dump("gen_data/gen_data_infer.json")
    logger.info("wrote gen_data/gen_data_infer.json")


if __name__ == "__main__":
    main()
