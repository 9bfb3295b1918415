#!/usr/bin/env python
"""Golden-diff the rebuilt dcd_tpu detector against the *reference* torch
model running on CPU (VERDICT r2 item #1).

Protocol (all in-sandbox, no KITTI, no released weights needed):

1. Build the reference's own CPU DCNv2 extension (tools/refbridge.py) and
   instantiate the reference ``KeypointDetector`` (model/detector.py:12)
   with the shipped runs/DGDE.yaml config and *random* weights, eval mode.
   The zero-init DCN offset convs and unit BN running stats are then
   re-randomized so the comparison actually exercises fractional bilinear
   sampling and the running-stat import path (refbridge.randomize_for_parity).
2. Export ``state_dict`` to a .pth, pull it through our
   ``import_torch_dgde`` importer.
3. Encode one synthetic scene with our pipeline; feed the *identical*
   normalized image + edge rings to both models.
4. Compare, to fp32 tolerance: backbone feature map, sigmoid heatmap,
   full regression map (per head group), and postprocessed KITTI rows
   (reference PostProcessor.forward, detector_infer.py:86 vs our
   engine/infer.postprocess).

Writes PARITY_REF.md. Exits non-zero if any head exceeds tolerance.

Run on CPU (exactness; TPU fp32 matmuls take bf16 passes):

    JAX_PLATFORMS=cpu python tools/parity_vs_reference.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    denom = max(float(np.abs(b).max()), 1e-6)
    return float(np.abs(a - b).max()) / denom


def write_calib_file(path: str, P: np.ndarray):
    """Minimal KITTI calib txt that the reference Calibration parses
    (kitti_utils.py:268-…): P2/P3 + identity R0 + dummy V2C."""
    V2C = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]])
    rows = {
        "P0": P, "P1": P, "P2": P, "P3": P,
        "R0_rect": np.eye(3),
        "Tr_velo_to_cam": V2C,
        "Tr_imu_to_velo": V2C,
    }
    with open(path, "w") as f:
        for k, v in rows.items():
            f.write(k + ": " + " ".join(f"{x:.12e}" for x in np.asarray(v).ravel()) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=None, help="override input H (both sides)")
    ap.add_argument("--width", type=int, default=None, help="override input W (both sides)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--num_objs", type=int, default=10)
    ap.add_argument("--report", default="PARITY_REF.md")
    ap.add_argument("--tol_maps", type=float, default=2e-3,
                    help="max relative error on cls/reg maps")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # the axon TPU plugin's sitecustomize force-sets jax_platforms to
    # "axon,cpu" regardless of the env var; pin CPU — TPU fp32 matmuls
    # run as bf16 passes and would drown the comparison in ~3e-3 noise
    jax.config.update("jax_platforms", "cpu")

    import torch

    import refbridge

    # ----- reference side -----------------------------------------------
    overrides = {
        "DATASETS.TEST_SPLIT": "test",  # light prepare_targets path
        # random weights score ~sigmoid(focal bias) ~= 0.01 — at the shipped
        # 0.2 threshold both sides emit 0 rows and the row diff is vacuous.
        # Drop the threshold so the postprocessors produce real rows.
        "TEST.DETECTIONS_THRESHOLD": 0.0,
    }
    if args.height:
        overrides["INPUT.HEIGHT_TRAIN"] = args.height
    if args.width:
        overrides["INPUT.WIDTH_TRAIN"] = args.width
    net, rcfg = refbridge.load_reference_detector(overrides)
    refbridge.randomize_for_parity(net)
    pth = os.path.join(refbridge.SCRATCH, "ref_random.pth")
    torch.save({"model": net.state_dict()}, pth)
    print(f"[ref] built reference KeypointDetector, saved {pth}")

    # ----- our side: config + weight import ------------------------------
    import dataclasses

    import jax.numpy as jnp

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.engine.infer import postprocess
    from dcd_tpu.engine.train import create_train_state
    from dcd_tpu.utils.checkpoint import import_torch_dgde, load_torch_checkpoint

    cfg = dgde_run_config()
    # mirror the reference-side TEST.DETECTIONS_THRESHOLD=0.0 override so
    # the postprocessed-row comparison is non-vacuous on random weights
    cfg = dataclasses.replace(
        cfg, test=dataclasses.replace(cfg.test, detections_threshold=0.0)
    )
    if args.height or args.width:
        cfg = dataclasses.replace(
            cfg, input=dataclasses.replace(
                cfg.input,
                height_train=args.height or cfg.input.height_train,
                width_train=args.width or cfg.input.width_train,
            ),
        )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    sd = load_torch_checkpoint(pth)
    params, stats = import_torch_dgde(
        sd, {"params": state.params, "batch_stats": state.batch_stats}, cfg
    )
    print(f"[ours] imported {len(sd)} tensors")

    # ----- one synthetic scene through our encoder ------------------------
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.target_encoder import encode_targets

    img, objs, calib = synthetic.make_scene(
        seed=args.seed, num_objs=args.num_objs,
        extra_kpts_num=cfg.model.head.extra_kpts_num,
    )
    s = encode_targets(img, objs, calib, cfg, is_train=False)
    t = s.targets
    timg = torch.from_numpy(np.transpose(s.image, (2, 0, 1))[None].copy()).float()

    # reference targets: ParamsList with calib + pad + edge ring
    from data.datasets.kitti_utils import Calibration  # reference package
    from structures.params_3d import ParamsList  # reference package

    calib_txt = os.path.join(refbridge.SCRATCH, "calib.txt")
    write_calib_file(calib_txt, s.calib.P)
    rt = ParamsList(image_size=tuple(int(v) for v in t["image_size"]), is_train=False)
    rt.add_field("calib", Calibration(calib_txt))
    rt.add_field("pad_size", torch.from_numpy(t["pad_size"]).float())
    rt.add_field("edge_indices", torch.from_numpy(t["edge_indices"]).long())
    rt.add_field("edge_len", torch.tensor(int(t["edge_len"])))
    down = cfg.model.backbone.down_ratio
    rt.add_field("final_output_w", torch.tensor(cfg.input.width_train // down))
    rt.add_field("final_output_h", torch.tensor(cfg.input.height_train // down))

    with torch.no_grad():
        rfeats = net.backbone(timg)
        rpreds = net.heads.predictor(rfeats, [rt])
        rresult, _, _ = net.heads.post_processor(
            rpreds, [rt], features=rfeats, test=True
        )
    rcls = rpreds["cls"].numpy().transpose(0, 2, 3, 1)
    rreg = rpreds["reg"].numpy().transpose(0, 2, 3, 1)
    rfeat = rfeats.numpy().transpose(0, 2, 3, 1)
    rresult = rresult.numpy()
    print(f"[ref] forward done: cls{rcls.shape} reg{rreg.shape} rows{rresult.shape}")

    # ----- our forward -----------------------------------------------------
    variables = {"params": params, "batch_stats": stats}
    images = jnp.asarray(s.image[None])
    eidx = jnp.asarray(t["edge_indices"][None])
    elen = jnp.asarray(t["edge_len"][None])
    opreds, feat_inter = model.apply(
        variables, images, eidx, elen, train=False,
        capture_intermediates=lambda mdl, method: mdl.name == "backbone",
    )
    ofeat = np.asarray(
        jax.tree.leaves(feat_inter["intermediates"]["backbone"]["__call__"])[0]
    )
    ocls = np.asarray(opreds["cls"])
    oreg = np.asarray(opreds["reg"])
    print(f"[ours] forward done: cls{ocls.shape} reg{oreg.shape}")

    # ----- compare maps ----------------------------------------------------
    from dcd_tpu.models.predictor import Converter_key2channel

    k2c = Converter_key2channel(
        cfg.model.head.regression_heads, cfg.model.head.regression_channels
    )
    lines = [
        "# PARITY_REF — dcd_tpu vs the reference torch model (CPU, random weights)",
        "",
        "Protocol: tools/parity_vs_reference.py — the reference's own CPU",
        "DCNv2 extension is compiled in-sandbox (refbridge.py), the reference",
        "KeypointDetector (model/detector.py:12) runs eval-mode on a synthetic",
        "scene, its state_dict is imported via import_torch_dgde, and the two",
        "forward passes are diffed on identical inputs (DCN offsets and BN",
        "running stats re-randomized — fractional sampling exercised).",
        "",
        f"- input: {cfg.input.width_train}x{cfg.input.height_train}, "
        f"{args.num_objs} synthetic objects, seed {args.seed}",
        f"- torch {torch.__version__}, jax {jax.__version__} "
        f"({jax.default_backend()} backend)",
        "",
        "| output | shape | max|Δ| | rel err |",
        "|---|---|---|---|",
    ]

    checks = [("backbone_feat", ofeat, rfeat), ("cls (sigmoid hm)", ocls, rcls)]
    for key in k2c.keys:
        sl = k2c(key)
        checks.append((f"reg[{key}]", oreg[..., sl], rreg[..., sl]))

    worst = 0.0
    for name, a, b in checks:
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}")
            sys.exit(2)
        d = float(np.abs(a - b).max())
        r = rel_err(a, b)
        worst = max(worst, r)
        lines.append(f"| {name} | {tuple(a.shape)} | {d:.3e} | {r:.3e} |")
        print(f"  {name:<28} max|Δ|={d:.3e} rel={r:.3e}")

    # ----- compare postprocessed rows --------------------------------------
    out = postprocess(
        cfg,
        {k: jnp.asarray(v) for k, v in opreds.items()},
        jnp.asarray(t["calib_P_full"][None]),
        jnp.asarray(t["pad_size"][None]),
        jnp.asarray(t["image_size"][None]),
    )
    ours_valid = np.asarray(out["valid"]).reshape(-1).astype(bool)
    np.savez(os.path.join(refbridge.SCRATCH, "rows.npz"),
             ours=np.asarray(out["dets"]).reshape(-1, 14),
             valid=ours_valid, ref=rresult)
    # rows already in the reference layout:
    # [cls, alpha, box2d(4), dims hwl(3), locs(3), roty, score]
    orows = np.asarray(out["dets"]).reshape(-1, 14)[ours_valid]
    lines += ["", f"## Postprocessed rows: ours {orows.shape[0]} vs ref {rresult.shape[0]}", ""]
    rows_ok = orows.shape[0] == rresult.shape[0] and orows.shape[0] > 0
    if rows_ok:
        # With random weights the heatmap is near-uniform: adjacent top-50
        # scores differ by ~1e-9 (with exact ties), so the two sides pick
        # overlapping-but-not-identical pixel sets and rank-order
        # comparison is meaningless. Match detections by box CENTER
        # (unambiguous) and demand the matched rows' decoded fields agree —
        # that checks the decode math (box/dims/orientation/edge-depth/
        # rescoring) end-to-end; the unmatched remainder is tie-flips.
        a, b = orows, rresult
        ca = (a[:, 2:4] + a[:, 4:6]) / 2
        cb = (b[:, 2:4] + b[:, 4:6]) / 2
        D = np.linalg.norm(ca[:, None] - cb[None], axis=-1)
        match = D.argmin(1)
        good = D.min(1) < 1.0
        n_matched = int(good.sum())
        lines.append(f"- center-matched rows: {n_matched}/{len(a)} "
                     "(remainder = top-K tie-flips on ~1e-9 score gaps)")
        row_worst = 0.0
        if n_matched:
            am, bm = a[good], b[match[good]]
            fields = {
                "alpha": (1, 2), "box2d": (2, 6), "dims": (6, 9),
                "loc_xy": (9, 11), "depth": (11, 12), "roty": (12, 13),
                "score": (13, 14),
            }
            for name, (lo, hi) in fields.items():
                dmax = float(np.abs(am[:, lo:hi] - bm[:, lo:hi]).max())
                row_worst = max(row_worst, dmax)
                lines.append(f"- {name}: max|Δ| = {dmax:.3e}")
            # col 0: the reference emits fractional cls = topk_ind/K
            # (select_topk, layers/utils.py:61-101) that downstream code
            # truncates to int; compare after truncation
            cls_ok = np.array_equal(am[:, 0].astype(int), bm[:, 0].astype(int))
            lines.append(f"- cls (after the reference's fractional-cls "
                         f"truncation quirk): {'EQUAL' if cls_ok else 'MISMATCH'}")
            rows_ok = n_matched >= len(a) // 2 and row_worst < 1e-3 and cls_ok
        else:
            rows_ok = False
    else:
        lines.append("- ROW COUNT MISMATCH (see map diffs above)")

    ok = worst < args.tol_maps and rows_ok
    lines += ["", f"**worst map rel err: {worst:.3e} (tolerance {args.tol_maps:.0e}) — "
              + ("PASS" if ok else "FAIL") + "**"]
    with open(args.report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.report}; worst rel err {worst:.3e} -> {'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
