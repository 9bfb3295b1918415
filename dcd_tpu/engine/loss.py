"""DGDE training loss — static-shape, mask-weighted.

TPU rewrite of ``Loss_Computation`` (DGDE/model/head/detector_loss.py:23-642).
The reference boolean-indexes valid objects (dynamic shapes); here every
object slot (B x max_objs) is computed and invalid slots carry zero weight,
so the whole loss is one fixed XLA program. Sum/normalization structure is
identical:

* all object losses divide by ``batch_weight = B * BATCH_WEIGHT_FACTOR``
  (detector_loss.py:411-412)
* extra-kpt / pairs-depth losses normalize by their mask sums times
  ``instance_num / batch_weight`` (:176-215)
* invalid keypoint depths are trained with stopped gradients
  (:194, :511 ``.detach()``)

Deviation (documented): the reference also computes gt/2d/3d edge-depth
variants (:378-380) that feed nothing but debugging, and a shapely-based 3D
IoU for logging (:485-491); both are omitted from the jitted loss. The
depth-MAE family of observables (:546-578) is kept.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import codec, losses as L
from ..ops.nms import select_point_of_interest
from ..models.predictor import Converter_key2channel

# Safe calibration for padded object slots (fx=fy=1, centered) — padded
# Calib_P rows are all-zero, which would divide by zero inside the decoders.
_SAFE_P = np.array(
    [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]], dtype=np.float32
)


def _masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return (x * mask).sum()


def compute_losses(
    cfg: Config, predictions: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray]
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Returns (total_loss, loss_dict, log_dict)."""
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    w = {k: v for k, v in zip(head.loss_names, head.init_loss_weight)}
    down = cfg.model.backbone.down_ratio

    pred_hm = predictions["cls"]  # (B, Ho, Wo, C)
    pred_reg = predictions["reg"]  # (B, Ho, Wo, R)
    B = pred_hm.shape[0]
    M = cfg.datasets.max_objects
    K = B * M
    batch_weight = B * cfg.model.batch_weight_factor

    # ---------------- heatmap loss ----------------
    hm_target = jnp.transpose(targets["hm"], (0, 2, 3, 1))  # stored CHW
    hm_loss_raw, _ = L.penalty_reduced_focal_loss(
        pred_hm, hm_target, head.loss_penalty_alpha, head.loss_beta
    )
    hm_loss = w["hm_loss"] * hm_loss_raw / batch_weight

    # ---------------- flatten object slots ----------------
    def flat(x):
        return x.reshape((K,) + x.shape[2:])

    m3d = flat(targets["reg_mask"]).astype(jnp.float32)  # (K,)
    centers = flat(targets["target_centers"]).astype(jnp.float32)  # (K, 2)
    boxes2d = flat(targets["bboxes_2d"])  # (K, 4)
    cls_ids = flat(targets["cls_ids"])
    gt_depths = flat(targets["locations"])[:, 2]
    gt_rotys = flat(targets["rotys"])
    gt_offset3d = flat(targets["offset_3D"])
    gt_dims = flat(targets["dimensions"])
    gt_orient = flat(targets["orientations"])
    trunc_mask = flat(targets["trunc_mask"]).astype(jnp.float32) * m3d
    ori_mask = flat(targets["ori_mask"]).astype(jnp.float32) * m3d
    find_pcl = flat(targets["find_pcl"]).astype(jnp.float32)
    calib_P = flat(targets["Calib_P"])
    safe_P = jnp.where(m3d[:, None, None] > 0, calib_P, jnp.asarray(_SAFE_P))
    pad_size = jnp.repeat(targets["pad_size"], M, axis=0)  # (K, 2)
    kpts = flat(targets["keypoints"])  # (K, 10, 3)
    kpts_depth_mask = flat(targets["keypoints_depth_mask"]) * m3d[:, None]
    ek2 = flat(targets["extra_kpts_2d"])  # (K, n, 3)
    ek3 = flat(targets["extra_kpts_3d"])  # (K, n, 3)

    heights = boxes2d[:, 3] - boxes2d[:, 1]
    widths = boxes2d[:, 2] - boxes2d[:, 0]
    m2d = m3d * (heights > 0) * (widths > 0)

    # ---------------- gather predictions at object centers ----------------
    pois = select_point_of_interest(targets["target_centers"], pred_reg).reshape(K, -1)

    pred_reg2d = jax.nn.relu(pois[:, k2c("2d_dim")])
    pred_offset3d = pois[:, k2c("3d_offset")]
    pred_dims_off = pois[:, k2c("3d_dim")]
    pred_orient = jnp.concatenate([pois[:, k2c("ori_cls")], pois[:, k2c("ori_offset")]], axis=1)
    pred_dims = codec.decode_dimension(
        cls_ids, pred_dims_off,
        jnp.asarray(head.dimension_mean), jnp.asarray(head.dimension_std), head.dimension_reg,
    )

    pred_depth_off = pois[:, k2c("depth")].squeeze(-1)
    pred_direct_depth = codec.decode_depth(
        pred_depth_off, head.depth_mode, head.depth_reference, head.depth_range
    )
    depth_unc = jnp.clip(
        pois[:, k2c("depth_uncertainty")].squeeze(-1),
        head.uncertainty_range[0], head.uncertainty_range[1],
    )
    corner_unc = jnp.clip(
        pois[:, k2c("corner_uncertainty")],
        head.uncertainty_range[0], head.uncertainty_range[1],
    )

    pred_kpts = pois[:, k2c("corner_offset")].reshape(K, 10, 2)
    pred_kpt_depths = codec.decode_depth_from_keypoints(
        pred_kpts, pred_dims, safe_P, down, depth_range=head.depth_range
    )  # (K, 3)

    pred_ek2 = pois[:, k2c("extra_kpts_2d")].reshape(K, -1, 2)
    pred_ek3 = pois[:, k2c("extra_kpts_3d")].reshape(K, -1, 3)

    # image-space keypoints for the pair solve (detector_loss.py:365-371)
    pred_ek2_img = codec.decode_kpts_2d_img(pred_ek2, centers, gt_offset3d, pad_size, down)
    ek2_mask = ek2[..., 2] * find_pcl[:, None] * m3d[:, None]
    pairs_all, pairs_mask = codec.decode_pairs_kpts_depth(
        pred_ek2_img, pred_ek3, gt_rotys, safe_P,
        training=True, kpts_2d_mask=ek2_mask,
        pairs_topk=head.pairs_topk, clamp=head.pairs_depth_clamp,
    )

    # ---------------- gt-side geometry ----------------
    gt_locations = codec.decode_location(centers, gt_offset3d, gt_depths, safe_P, pad_size, down)
    gt_corners = codec.encode_box3d(gt_rotys, gt_dims, gt_locations)

    # predicted 3D box via mean edge depth (corner_loss_depth == 'edges',
    # detector_loss.py:387-398)
    pred_corner_depth = pairs_all.mean(axis=1)
    pred_locations = codec.decode_location(
        centers, pred_offset3d, pred_corner_depth, safe_P, pad_size, down
    )
    pred_rotys, _ = codec.decode_axes_orientation(
        pred_orient, pred_locations, cfg.input.orientation_bin_size
    )
    pred_corners = codec.encode_box3d(pred_rotys, pred_dims, pred_locations)

    loss_dict: Dict[str, jnp.ndarray] = {"hm_loss": hm_loss}
    log_dict: Dict[str, jnp.ndarray] = {}

    # ---------------- 2D box loss ----------------
    tgt_reg2d = jnp.concatenate(
        [centers - boxes2d[:, :2], boxes2d[:, 2:] - centers], axis=1
    )
    reg2d_losses, ious2d = L.iou_loss(pred_reg2d, tgt_reg2d, head.loss_type[2])
    loss_dict["bbox_loss"] = w["bbox_loss"] * _masked_sum(reg2d_losses, m2d) / batch_weight
    log_dict["2D_IoU"] = _masked_sum(ious2d, m2d) / jnp.maximum(m2d.sum(), 1.0)

    # ---------------- direct depth ----------------
    depth_l1 = jnp.abs(pred_direct_depth - gt_depths)
    depth_loss = w["depth_loss"] * depth_l1
    log_dict["depth_loss"] = _masked_sum(depth_loss, m3d) / batch_weight
    depth_loss = depth_loss * jnp.exp(-depth_unc) + depth_unc * w["depth_loss"]
    loss_dict["depth_loss"] = _masked_sum(depth_loss, m3d) / batch_weight

    # ---------------- offsets (trunc/non-trunc split) ----------------
    offset_l1 = jnp.abs(pred_offset3d - gt_offset3d).sum(axis=1)
    trunc_off = jnp.log1p(offset_l1) if head.truncation_offset_loss == "log" else offset_l1
    loss_dict["trunc_offset_loss"] = (
        w["trunc_offset_loss"] * _masked_sum(trunc_off, trunc_mask) / batch_weight
    )
    nontrunc = m3d * (1.0 - flat(targets["trunc_mask"]).astype(jnp.float32))
    loss_dict["offset_loss"] = w["offset_loss"] * _masked_sum(offset_l1, nontrunc) / batch_weight

    # ---------------- orientation ----------------
    loss_dict["orien_loss"] = (
        w["orien_loss"]
        * L.multibin_orientation_loss(pred_orient, gt_orient, ori_mask, cfg.input.orientation_bin_size)
        / batch_weight
    )

    # ---------------- dimensions ----------------
    dims_l1 = jnp.abs(pred_dims - gt_dims) * jnp.asarray(head.dimension_weight)[None, :]
    loss_dict["dims_loss"] = w["dims_loss"] * _masked_sum(dims_l1.sum(1), m3d) / batch_weight

    # ---------------- corners ----------------
    corner_l1 = jnp.abs(pred_corners - gt_corners).sum(axis=(1, 2))
    loss_dict["corner_loss"] = w["corner_loss"] * _masked_sum(corner_l1, m3d) / batch_weight

    # ---------------- 10 keypoints ----------------
    kpt_l1 = jnp.abs(pred_kpts - kpts[..., :2]).sum(axis=2) * kpts[..., 2] * m3d[:, None]
    loss_dict["keypoint_loss"] = w["keypoint_loss"] * kpt_l1.sum() / batch_weight

    # keypoint depths: valid trains depth+uncertainty, invalid trains
    # uncertainty only (stop_gradient on depth, detector_loss.py:511)
    tgt_kd = gt_depths[:, None]
    kd_valid = kpts_depth_mask
    kd_invalid = (1.0 - kpts_depth_mask) * m3d[:, None]
    kd_l1_valid = jnp.abs(pred_kpt_depths - tgt_kd) * w["keypoint_depth_loss"]
    kd_l1_invalid = jnp.abs(jax.lax.stop_gradient(pred_kpt_depths) - tgt_kd) * w["keypoint_depth_loss"]
    log_dict["keypoint_depth_loss"] = _masked_sum(kd_l1_valid, kd_valid) / batch_weight
    kd_valid_term = kd_l1_valid * jnp.exp(-corner_unc) + w["keypoint_depth_loss"] * corner_unc
    kd_invalid_term = kd_l1_invalid * jnp.exp(-corner_unc)
    keypoint_depth_loss = (
        _masked_sum(kd_valid_term, kd_valid) + _masked_sum(kd_invalid_term, kd_invalid)
        if head.modify_invalid_keypoint_depth
        else _masked_sum(kd_valid_term, kd_valid)
    )
    loss_dict["keypoint_depth_loss"] = keypoint_depth_loss / batch_weight

    # ---------------- extra keypoints ----------------
    instance_num = m3d.sum()
    ek2_l1 = L.reg_weighted_l1_loss(pred_ek2, ek2[..., :2], gt_depths)  # (K, n)
    ek2_sum = _masked_sum(w["extra_kpts_2d_loss"] * ek2_l1, ek2_mask)
    loss_dict["extra_kpts_2d_loss"] = (
        ek2_sum / jnp.maximum(ek2_mask.sum(), 1.0) * (instance_num / batch_weight)
    )
    ek3_mask = find_pcl[:, None] * m3d[:, None] * jnp.ones_like(ek3[..., 0])
    ek3_l1 = jnp.abs(pred_ek3 - ek3).sum(axis=2)
    ek3_sum = _masked_sum(w["extra_kpts_3d_loss"] * ek3_l1, ek3_mask)
    loss_dict["extra_kpts_3d_loss"] = (
        ek3_sum / jnp.maximum(ek3_mask.sum(), 1.0) * (instance_num / batch_weight)
    )

    # ---------------- pairs depth ----------------
    tgt_pairs = gt_depths[:, None]
    pm_valid = pairs_mask * find_pcl[:, None] * m3d[:, None]
    pm_invalid = (1.0 - pairs_mask) * find_pcl[:, None] * m3d[:, None]
    pd_l1_valid = jnp.abs(pairs_all - tgt_pairs) * w["pairs_kpts_depth_loss"]
    pd_l1_invalid = (
        jnp.abs(jax.lax.stop_gradient(pairs_all) - tgt_pairs) * w["pairs_kpts_depth_loss"]
    )
    valid_term = _masked_sum(pd_l1_valid, pm_valid) / jnp.maximum(pm_valid.sum(), 1.0)
    invalid_term = _masked_sum(pd_l1_invalid, pm_invalid) / jnp.maximum(pm_invalid.sum(), 1.0)
    scale = instance_num / batch_weight
    if head.modify_invalid_keypoint_depth:
        loss_dict["pairs_kpts_depth_loss"] = (valid_term + invalid_term) * scale
    else:
        loss_dict["pairs_kpts_depth_loss"] = valid_term * scale
    log_dict["pairs_kpts_depth_loss"] = valid_term * scale

    # ---------------- MAE observables (detector_loss.py:546-580) ----------------
    safe_gt = jnp.maximum(gt_depths, 1e-3)
    depth_mae = jnp.abs(pred_direct_depth - gt_depths) / safe_gt
    log_dict["depth_MAE"] = _masked_sum(depth_mae, m3d) / jnp.maximum(m3d.sum(), 1.0)
    kpt_mae = jnp.abs(pred_kpt_depths - tgt_kd) / safe_gt[:, None]
    for j, name in enumerate(["center_MAE", "keypoint_02_MAE", "keypoint_13_MAE"]):
        log_dict[name] = _masked_sum(kpt_mae[:, j], m3d) / jnp.maximum(m3d.sum(), 1.0)
    pairs_mae = jnp.abs(pairs_all - tgt_pairs) / safe_gt[:, None]
    log_dict["extra_all_MAE"] = _masked_sum(pairs_mae, pm_valid) / jnp.maximum(pm_valid.sum(), 1.0)
    edge_depth_mae = jnp.abs(pred_corner_depth - gt_depths) / safe_gt
    log_dict["edges_MAE"] = _masked_sum(edge_depth_mae, m3d) / jnp.maximum(m3d.sum(), 1.0)

    total = sum(loss_dict.values())
    for k, v in loss_dict.items():
        if k not in log_dict:
            log_dict[k] = v
    return total, loss_dict, log_dict
