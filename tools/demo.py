#!/usr/bin/env python
"""Single-image demo: run DGDE inference and render detections.

Usage:
  python tools/demo.py --image /path/000001.png --calib /path/000001.txt \
      --ckpt logs/ckpt --out demo.png [--bev bev.png]
  python tools/demo.py --synthetic 3 --out demo.png   # no data needed
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None)
    p.add_argument("--calib", default=None)
    p.add_argument("--synthetic", type=int, default=None, help="render a synthetic scene by seed")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--out", default="demo.png")
    p.add_argument("--bev", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dcd_tpu.config import dgde_run_config, load_yaml_config
    from dcd_tpu.data.kitti_geometry import Calibration
    from dcd_tpu.data.target_encoder import encode_targets
    from dcd_tpu.engine.infer import postprocess
    from dcd_tpu.engine.train import create_train_state
    from dcd_tpu.utils.checkpoint import Checkpointer
    from dcd_tpu.utils.visualize import draw_bev, draw_detections

    cfg = dgde_run_config()
    if args.config:
        cfg = load_yaml_config(args.config, base=cfg)

    if args.synthetic is not None:
        from dcd_tpu.data import synthetic

        img, objs, calib = synthetic.make_scene(seed=args.synthetic, num_objs=6)
    else:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB"))
        calib = Calibration.from_kitti_file(args.calib)
        objs = None

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt:
        state = Checkpointer(args.ckpt).load(state)

    s = encode_targets(img, None, calib, cfg, is_train=False)
    t = s.targets

    @jax.jit
    def infer(images, ei, el, cp, ps, sz):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, ei, el, train=False,
        )
        return postprocess(cfg, preds, cp, ps, sz)

    out = infer(
        jnp.asarray(s.image[None]),
        jnp.asarray(t["edge_indices"][None]),
        jnp.asarray(t["edge_len"][None]),
        jnp.asarray(t["calib_P_full"][None]),
        jnp.asarray(t["pad_size"][None]),
        jnp.asarray(t["image_size"][None]),
    )
    dets = np.asarray(out["dets"])[0]
    valid = np.asarray(out["valid"])[0]
    print(f"{int(valid.sum())} detections above threshold {cfg.test.detections_threshold}")
    vis = draw_detections(img, dets, valid, calib)
    vis.save(args.out)
    print("wrote", args.out)
    if args.bev:
        draw_bev(dets, valid).save(args.bev)
        print("wrote", args.bev)


if __name__ == "__main__":
    main()
