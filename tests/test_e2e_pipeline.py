"""Full two-stage pipeline integration on synthetic data (tiny model, CPU):

DGDE train steps -> gen-for-GMW interchange -> GMW training -> depth
refinement -> KITTI txt -> official AP evaluation. Mirrors the reference's
end-to-end flow (train -> --generate_for_GMW -> GMW main.py -> eval)."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcd_tpu.config import dgde_run_config
from dcd_tpu.data import synthetic
from dcd_tpu.data.gen_data import (
    GenDataInferWriter,
    GenDataTrainWriter,
    load_gen_data_infer,
    load_gen_data_train,
    normalize_kpts_2d,
)
from dcd_tpu.data.target_encoder import collate, encode_targets
from dcd_tpu.engine.gen import make_gen_step
from dcd_tpu.engine.infer import format_kitti_lines, postprocess
from dcd_tpu.engine.train import create_train_state, make_train_step
from dcd_tpu.engine.gmw_train import (
    GMWConfig,
    create_gmw_state,
    make_gmw_predict,
    make_gmw_train_step,
    rescale_location,
)
from dcd_tpu.evaluation import kitti_eval


def _warm_2d_head_bias(state):
    """+1 on the 2d_dim output bias: relu'd box-extent channels whose raw
    init lands negative get zero gradient and stay dead under tiny-sample
    overfit (the reference has the same relu, detector_loss.py:270; at real
    scale the shared bias unsticks via positions that start positive)."""
    params = jax.tree.map(lambda x: x, state.params)

    def walk(tree, path=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + "/" + k)
            elif "reg_out" in path and "2d_dim" in path and k == "bias":
                tree[k] = v + 1.0

    walk(params)
    return state.replace(params=params)


def test_trained_ap_floor(cfg, tmp_path):
    """Trained-quality gate (VERDICT r3 #4b): overfit two close-car scenes,
    then the OFFICIAL evaluator must report a 2-D AP floor (capped by the
    R40 recall-slot structure at this GT count) and the trained model must
    beat the untrained one — a garbage-emitting detector fails.

    3-D AP at this micro scale is bounded by the method itself: the final
    depth is the reference's mean over all 2628 edge-pair depths
    (detector_infer.py:225), which needs full-scale keypoint training and
    the GMW stage-2 reweighting to become accurate; the AP3D trajectory
    gate runs at full size in tools/convergence_run.py (docs/CONVERGENCE.md)
    and stage 2's depth gate is tests/test_trained_quality.py. Direct depth
    is asserted here instead — it is decodable and must overfit to <0.5 m.
    """
    import dataclasses

    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, base_lr=3e-3, warmup_steps=20)
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = _warm_2d_head_bias(state)
    samples = []
    for s in range(2):
        img, objs, calib = synthetic.make_scene(
            seed=s, num_objs=3, image_size=(90, 60), depth_range=(4.5, 8.5)
        )
        samples.append(encode_targets(img, objs, calib, cfg, img_id=f"{s:06d}"))
    batch = collate(samples)
    step = jax.jit(make_train_step(cfg, model))

    infer_fn = jax.jit(
        lambda params, bs, im, ei, el, cp, ps, sz: postprocess(
            cfg,
            model.apply({"params": params, "batch_stats": bs}, im, ei, el, train=False),
            cp, ps, sz,
        )
    )

    tags = iter(range(100))

    def eval_ap(st):
        tag = next(tags)
        res_dir = tmp_path / f"res_{tag}"
        gt_dir = tmp_path / f"gt_{tag}"
        os.makedirs(res_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        ids = []
        for s in samples:
            t = s.targets
            o = infer_fn(
                st.params, st.batch_stats,
                jnp.asarray(s.image[None]), jnp.asarray(t["edge_indices"][None]),
                jnp.asarray(t["edge_len"][None]), jnp.asarray(t["calib_P_full"][None]),
                jnp.asarray(t["pad_size"][None]), jnp.asarray(t["image_size"][None]),
            )
            dets, valid = np.asarray(o["dets"])[0], np.asarray(o["valid"])[0]
            with open(res_dir / f"{s.img_id}.txt", "w") as f:
                f.write("\n".join(format_kitti_lines(dets, valid)) + "\n")
            img, objs, calib = synthetic.make_scene(
                seed=int(s.img_id), num_objs=3, image_size=(90, 60), depth_range=(4.5, 8.5)
            )
            with open(gt_dir / f"{s.img_id}.txt", "w") as f:
                for ob in objs:
                    f.write(
                        f"Car {ob.truncation:.2f} {ob.occlusion} {ob.alpha:.2f} "
                        f"{ob.box2d[0]:.2f} {ob.box2d[1]:.2f} {ob.box2d[2]:.2f} {ob.box2d[3]:.2f} "
                        f"{ob.h:.2f} {ob.w:.2f} {ob.l:.2f} "
                        f"{ob.t[0]:.2f} {ob.t[1]:.2f} {ob.t[2]:.2f} {ob.ry:.2f}\n"
                    )
            ids.append(s.img_id)
        split = tmp_path / f"val_{tag}.txt"
        with open(split, "w") as f:
            f.write("\n".join(ids))
        _, ret = kitti_eval.evaluate_from_files(
            str(gt_dir), str(res_dir), str(split), current_class=0, metric="R40"
        )
        return ret

    def direct_depth_mae(st):
        """Decode the direct-depth head against gt depths (nearest gt per
        high-score det)."""
        from dcd_tpu.engine.infer import nms_hm, select_point_of_interest, select_topk
        from dcd_tpu.models.predictor import Converter_key2channel
        from dcd_tpu.ops import codec

        head = cfg.model.head
        k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
        errs = []
        for s in samples:
            t = s.targets
            preds = model.apply(
                {"params": st.params, "batch_stats": st.batch_stats},
                jnp.asarray(s.image[None]), jnp.asarray(t["edge_indices"][None]),
                jnp.asarray(t["edge_len"][None]), train=False,
            )
            hm = nms_hm(preds["cls"])
            scores, indexs, clses, ys, xs = select_topk(hm, K=4)
            pois = select_point_of_interest(indexs, preds["reg"])[0]
            dd = np.asarray(
                codec.decode_depth(
                    pois[:, k2c("depth")].squeeze(-1), head.depth_mode,
                    head.depth_reference, head.depth_range,
                )
            )
            m = t["reg_mask"].astype(bool)
            gt_z = np.sort(t["locations"][m][:, 2])
            n = min(len(gt_z), int(np.asarray(scores[0] > 0.3).sum()))
            if n:
                errs.extend(np.abs(np.sort(dd[:n]) - gt_z[:n]).tolist())
        return float(np.mean(errs)) if errs else float("inf")

    untrained = eval_ap(state)
    for i in range(1100):
        state, logs = step(state, batch)
    assert np.isfinite(float(logs["total_loss"]))
    trained = eval_ap(state)

    # NOTE the R40 ceiling: precision slots only fill up to the number of
    # valid moderate GTs (6 objects here -> AP <= ~15, see test_eval.py's
    # 41-slot note); the gate is trained-beats-untrained with a floor.
    key = "Car_image/moderate"  # official bbox AP, 0.7-overlap row
    assert trained[key] >= 5.0, (trained[key], untrained[key])
    assert trained[key] > untrained[key], (trained[key], untrained[key])
    mae = direct_depth_mae(state)
    assert mae < 0.5, mae


@pytest.fixture(scope="module")
def cfg():
    base = dgde_run_config()
    return dataclasses.replace(
        base,
        input=dataclasses.replace(base.input, height_train=64, width_train=96),
        datasets=dataclasses.replace(base.datasets, max_objects=6),
        model=dataclasses.replace(
            base.model,
            head=dataclasses.replace(base.model.head, num_channel=16, pairs_topk=64),
            backbone=dataclasses.replace(base.model.backbone, channels=(4, 8, 8, 8, 8, 8)),
        ),
    )


def test_full_pipeline(cfg, tmp_path):
    # ---- stage 1: a couple of DGDE train steps ----
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    samples = []
    for s in range(2):
        img, objs, calib = synthetic.make_scene(seed=s, num_objs=3, image_size=(90, 60))
        samples.append(encode_targets(img, objs, calib, cfg, img_id=f"{s:06d}"))
    batch = collate(samples)
    step = jax.jit(make_train_step(cfg, model))
    for _ in range(2):
        state, logs = step(state, batch)
        assert np.isfinite(float(logs["total_loss"]))

    # ---- gen-for-GMW: training interchange ----
    gen_step = jax.jit(make_gen_step(cfg, model))
    out = gen_step(state.params, state.batch_stats, batch)
    m = np.asarray(out["mask"]).astype(bool)
    assert m.sum() > 0
    P = samples[0].calib.P
    writer = GenDataTrainWriter()
    writer.add_batch(
        normalize_kpts_2d(np.asarray(out["kpts_2d_img"])[m], P),
        np.asarray(out["kpts_3d"])[m],
        np.asarray(out["pred_rot"])[m],
        np.asarray(out["gt_location"])[m],
        np.asarray(out["pred_location"])[m],
        ["000000"] * int(m.sum()),
    )
    train_json = str(tmp_path / "gen_data_train.json")
    writer.dump(train_json)

    # ---- inference interchange ----
    infer_fn = jax.jit(
        lambda im, ei, el, cp, ps, sz: postprocess(
            cfg,
            model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                im, ei, el, train=False,
            ),
            cp, ps, sz,
        )
    )
    iw = GenDataInferWriter()
    result_rows = {}
    for s in samples:
        t = s.targets
        o = infer_fn(
            jnp.asarray(s.image[None]),
            jnp.asarray(t["edge_indices"][None]),
            jnp.asarray(t["edge_len"][None]),
            jnp.asarray(t["calib_P_full"][None]),
            jnp.asarray(t["pad_size"][None]),
            jnp.asarray(t["image_size"][None]),
        )
        dets = np.asarray(o["dets"])[0]
        valid = np.asarray(o["valid"])[0]
        # force at least one det for the interchange (untrained net may be
        # below threshold)
        if valid.sum() == 0:
            valid = valid.copy()
            valid[0] = True
            dets = dets.copy()
            dets[0, 13] = 0.5
            dets[0, 11] = abs(dets[0, 11]) + 5.0
        kp2 = np.asarray(o["kpts_2d"])[0]
        iw.add_image(s.img_id, dets, valid, normalize_kpts_2d(kp2, s.calib.P), np.asarray(o["kpts_3d"])[0])
        result_rows[s.img_id] = (dets, valid)
    infer_json = str(tmp_path / "gen_data_infer.json")
    iw.dump(infer_json)

    # ---- stage 2: GMW on the interchange ----
    n_kpts = cfg.model.head.num_kpts
    gcfg = GMWConfig(num_kpts=n_kpts, features=16, depth=2, topk=64)
    gmodel, gstate = create_gmw_state(gcfg, jax.random.PRNGKey(1))
    train_data = load_gen_data_train(train_json, n_kpts)
    N = train_data["kpts_2d"].shape[0]
    assert N > 0
    gstep = jax.jit(make_gmw_train_step(gcfg, gmodel))
    bsz = min(4, N)
    gbatch = {
        "kpts_2d": jnp.asarray(train_data["kpts_2d"][:bsz]),
        "kpts_3d": jnp.asarray(train_data["kpts_3d"][:bsz]),
        "pred_rot": jnp.asarray(train_data["pred_rot"][:bsz, 0]),
        "gt_depth": jnp.asarray(train_data["gt_location"][:bsz, 2]),
    }
    for _ in range(2):
        gstate, glogs = gstep(gstate, gbatch, jnp.float32(1.0), jnp.float32(0.1))
        assert np.isfinite(float(glogs["loss"])), glogs

    # ---- refinement + KITTI txt + AP ----
    arrays, img_idx = load_gen_data_infer(infer_json, n_kpts)
    predict = jax.jit(make_gmw_predict(gcfg, gmodel))
    depths = np.asarray(
        predict(
            gstate.params,
            {
                "kpts_2d": jnp.asarray(arrays["kpts_2d"]),
                "kpts_3d": jnp.asarray(arrays["kpts_3d"]),
                "pred_rot": jnp.asarray(arrays["pred_rot"][:, 0]),
            },
        )
    )
    assert np.isfinite(depths).all() and (depths > 0).all()
    locs = rescale_location(arrays["pred_location"], depths, arrays["dim"])
    assert np.isfinite(locs).all()

    # write result txts + gt txts, run the official evaluator
    res_dir = tmp_path / "results"
    gt_dir = tmp_path / "gt"
    os.makedirs(res_dir)
    os.makedirs(gt_dir)
    ids = []
    for s in samples:
        ids.append(s.img_id)
        dets, valid = result_rows[s.img_id]
        lines = format_kitti_lines(dets, valid)
        with open(res_dir / f"{s.img_id}.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
        # gt from the synthetic objects
        img, objs, calib = synthetic.make_scene(seed=int(s.img_id), num_objs=3, image_size=(90, 60))
        with open(gt_dir / f"{s.img_id}.txt", "w") as f:
            for ob in objs:
                f.write(
                    f"Car {ob.truncation:.2f} {ob.occlusion} {ob.alpha:.2f} "
                    f"{ob.box2d[0]:.2f} {ob.box2d[1]:.2f} {ob.box2d[2]:.2f} {ob.box2d[3]:.2f} "
                    f"{ob.h:.2f} {ob.w:.2f} {ob.l:.2f} "
                    f"{ob.t[0]:.2f} {ob.t[1]:.2f} {ob.t[2]:.2f} {ob.ry:.2f}\n"
                )
    split = tmp_path / "val.txt"
    with open(split, "w") as f:
        f.write("\n".join(ids))
    result, ret = kitti_eval.evaluate_from_files(
        str(gt_dir), str(res_dir), str(split), current_class=0, metric="R40"
    )
    assert "Car_3d_moderate_R40_0.70" in ret
    assert "bbox AP" in result
