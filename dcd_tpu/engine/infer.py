"""Inference post-processing: heatmap peaks -> KITTI detections.

TPU rewrite of ``PostProcessor`` (DGDE/model/head/detector_infer.py:27-243):
max-pool NMS + top-K=50 + score threshold, FCOS 2D box decode, class-mean
dimension decode, multibin orientation, soft uncertainty-ensemble depth
(used only to get rotys), then the **mean edge-pair depth as the final
object depth** (:182-188, :215-225), uncertainty->confidence rescoring
(:198-206), and KITTI rows
``[cls, alpha, box2d(4), dims hwl(3), locs(3), roty, score]`` (:208).

Static shapes: always K=DETECTIONS_PER_IMG rows per image plus a validity
mask (score >= threshold), instead of the reference's boolean filtering.
Batched: per-image calib/pad/size arrays instead of the reference's
batch-size-1 python calib object.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.predictor import Converter_key2channel
from ..ops import codec
from ..ops.nms import nms_hm, select_point_of_interest, select_topk


def postprocess(
    cfg: Config,
    predictions: Dict[str, jnp.ndarray],
    calib_P: jnp.ndarray,  # (B, 3, 4)
    pad_size: jnp.ndarray,  # (B, 2)
    img_size: jnp.ndarray,  # (B, 2) original (w, h)
) -> Dict[str, jnp.ndarray]:
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    down = cfg.model.backbone.down_ratio
    K = cfg.test.detections_per_img

    if "reg_pois" in predictions:
        # lazy top-K head evaluation: the predictor already ran NMS +
        # top-K and evaluated the regression heads at the peaks
        B = predictions["cls"].shape[0]
        scores = predictions["scores"]
        clses = predictions["clses"]
        points = predictions["points_xy"]  # (B, K, 2)
        pois = predictions["reg_pois"].astype(jnp.float32)
    else:
        hm = nms_hm(predictions["cls"])  # (B, Ho, Wo, C)
        B = hm.shape[0]
        scores, indexs, clses, ys, xs = select_topk(hm, K=K)  # (B, K)
        points = jnp.stack([xs, ys], axis=-1)  # (B, K, 2)
        pois = select_point_of_interest(indexs, predictions["reg"])  # (B, K, R)

    # flatten detections
    N = B * K
    pois = pois.reshape(N, -1)
    points = points.reshape(N, 2)
    scores = scores.reshape(N)
    clses = clses.reshape(N)
    valid = scores >= cfg.test.detections_threshold

    def per_det(x):  # (B, ...) -> (N, ...)
        return jnp.repeat(x, K, axis=0)

    P_det = per_det(calib_P)
    pad_det = per_det(pad_size).astype(jnp.float32)
    size_det = per_det(img_size).astype(jnp.float32)

    reg2d = jax.nn.relu(pois[:, k2c("2d_dim")])
    offset3d = pois[:, k2c("3d_offset")]
    dims_off = pois[:, k2c("3d_dim")]
    orient = jnp.concatenate([pois[:, k2c("ori_cls")], pois[:, k2c("ori_offset")]], axis=1)

    # 2D box in original-image pixels (anno_encoder.py:74-91)
    box2d = jnp.concatenate([points - reg2d[:, :2], points + reg2d[:, 2:]], axis=1)
    box2d = box2d * down - jnp.tile(pad_det, (1, 2))
    box2d = jnp.stack(
        [
            jnp.clip(box2d[:, 0], 0, size_det[:, 0] - 1),
            jnp.clip(box2d[:, 1], 0, size_det[:, 1] - 1),
            jnp.clip(box2d[:, 2], 0, size_det[:, 0] - 1),
            jnp.clip(box2d[:, 3], 0, size_det[:, 1] - 1),
        ],
        axis=1,
    )

    dims = codec.decode_dimension(
        clses, dims_off, jnp.asarray(head.dimension_mean), jnp.asarray(head.dimension_std),
        head.dimension_reg,
    )  # (N, 3) l/h/w

    direct_depth = codec.decode_depth(
        pois[:, k2c("depth")].squeeze(-1), head.depth_mode, head.depth_reference, head.depth_range
    )
    direct_unc = jnp.exp(pois[:, k2c("depth_uncertainty")])  # (N, 1)
    kpt_offset = pois[:, k2c("corner_offset")].reshape(N, 10, 2)
    kpt_depths = codec.decode_depth_from_keypoints(
        kpt_offset, dims, P_det, down, depth_range=head.depth_range
    )
    kpt_unc = jnp.exp(pois[:, k2c("corner_uncertainty")])  # (N, 3)

    combined_depths = jnp.concatenate([direct_depth[:, None], kpt_depths], axis=1)  # (N, 4)
    combined_unc = jnp.concatenate([direct_unc, kpt_unc], axis=1)
    depth_weights = 1.0 / combined_unc
    depth_weights = depth_weights / depth_weights.sum(axis=1, keepdims=True)
    soft_depth = (combined_depths * depth_weights).sum(axis=1)
    estimated_depth_error = (depth_weights * combined_unc).sum(axis=1)

    # coarse location only fixes the ray for the orientation decode (:173-175)
    coarse_loc = codec.decode_location(points, offset3d, soft_depth, P_det, pad_det, down)
    rotys, alphas = codec.decode_axes_orientation(
        orient, coarse_loc, cfg.input.orientation_bin_size
    )

    # final depth by OUTPUT_DEPTH mode. The reference's shipped inference
    # (detector_infer.py:182-188,215-225) unconditionally replaces the soft
    # ensemble with the mean edge-pair depth — its OUTPUT_DEPTH knob is
    # dead in that file; here the knob is honored ('edges' is the shipped
    # default) so soft/hard/direct ensembles are also reachable.
    ek2 = pois[:, k2c("extra_kpts_2d")].reshape(N, -1, 2)
    ek3 = pois[:, k2c("extra_kpts_3d")].reshape(N, -1, 3)
    ek2_img = codec.decode_kpts_2d_img(ek2, points, offset3d, pad_det, down)
    mode = head.output_depth
    if mode == "edges":
        pair_depths, _ = codec.decode_pairs_kpts_depth(
            ek2_img, ek3, rotys, P_det, training=False, clamp=head.pairs_depth_clamp
        )
        final_depth = pair_depths.mean(axis=1)
    elif mode == "soft":
        final_depth = soft_depth
    elif mode == "hard":
        final_depth = jnp.take_along_axis(
            combined_depths, jnp.argmin(combined_unc, axis=1)[:, None], axis=1
        ).squeeze(1)
    elif mode == "direct":
        final_depth = direct_depth
    else:
        raise ValueError(f"unknown OUTPUT_DEPTH mode {mode!r}")

    locations = codec.decode_location(points, offset3d, final_depth, P_det, pad_det, down)
    locations = locations.at[:, 1].add(dims[:, 1] / 2.0)  # 3D center -> bottom center

    dims_hwl = jnp.roll(dims, shift=-1, axis=1)  # l,h,w -> h,w,l (:195)

    if cfg.test.uncertainty_as_confidence:
        conf = 1.0 - jnp.clip(estimated_depth_error, 0.01, 1.0)
        scores = scores * conf
        scores = jnp.where(jnp.isnan(scores), 0.0, scores)

    result = jnp.concatenate(
        [
            clses[:, None],
            alphas[:, None],
            box2d,
            dims_hwl,
            locations,
            rotys[:, None],
            scores[:, None],
        ],
        axis=1,
    )  # (N, 14)

    return {
        "dets": result.reshape(B, K, 14),
        "valid": (valid & (scores > 0)).reshape(B, K),
        "kpts_2d": ek2_img.reshape(B, K, -1, 2),
        "kpts_3d": ek3.reshape(B, K, -1, 3),
    }


def format_kitti_lines(dets, valid, class_names=("Car", "Pedestrian", "Cyclist"),
                       decimals=2):
    """Host-side KITTI txt rows (reference engine/kitti_eval/
    generate_kitti_3d_detection — fixed field order, 2 decimals).

    ``decimals`` matches the reference writer at 2. Oracle-injection
    harnesses pass a higher precision: the protocol's rotated-IoU kernel
    (faithfully ported, CUDA rotate_iou.py:18-332) degenerates on *exactly
    coincident* polygons (returns ~half the true intersection area), and
    rounding near-perfect detections to 2 decimals can collapse them onto
    the GT boxes exactly — a case real detections never produce."""
    import numpy as np

    lines = []
    dets = np.asarray(dets)
    valid = np.asarray(valid)
    for row, ok in zip(dets, valid):
        if not ok:
            continue
        cls = class_names[int(row[0])]
        vals = " ".join(f"{v:.{decimals}f}" for v in row[1:14])
        lines.append(f"{cls} 0.00 0 {vals}")
    return lines
