"""Gen-for-GMW step: eval-mode forward + per-object interchange fields.

Jitted equivalent of the data collection inside
``Loss_Computation.prepare_predictions``/``generate_data``
(detector_loss.py:148-173, :365-402) run with frozen BN
(trainer.py:62-67,97-98): for each GT object slot, gather the predicted
keypoints at the GT center, decode the pair-depth location and rotys, and
emit (kpts_2d in image pixels, kpts_3d, pred_rot, gt/pred locations, mask).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.predictor import Converter_key2channel
from ..ops import codec


def make_gen_step(cfg: Config, model):
    head = cfg.model.head
    k2c = Converter_key2channel(head.regression_heads, head.regression_channels)
    down = cfg.model.backbone.down_ratio

    def gen_step(params, batch_stats, batch) -> Dict[str, jnp.ndarray]:
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["edge_indices"], batch["edge_len"], train=False,
        )
        reg = preds["reg"]
        B = reg.shape[0]
        M = cfg.datasets.max_objects
        K = B * M

        from ..ops.nms import select_point_of_interest

        def flat(x):
            return x.reshape((K,) + x.shape[2:])

        pois = select_point_of_interest(batch["target_centers"], reg).reshape(K, -1)
        m3d = flat(batch["reg_mask"]).astype(jnp.float32)
        centers = flat(batch["target_centers"]).astype(jnp.float32)
        gt_offset3d = flat(batch["offset_3D"])
        gt_rotys = flat(batch["rotys"])
        gt_locations = flat(batch["locations"])
        calib_P = flat(batch["Calib_P"])
        safe_P = jnp.where(
            m3d[:, None, None] > 0, calib_P,
            jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]], jnp.float32),
        )
        pad_size = jnp.repeat(batch["pad_size"], M, axis=0)

        pred_ek2 = pois[:, k2c("extra_kpts_2d")].reshape(K, -1, 2)
        pred_ek3 = pois[:, k2c("extra_kpts_3d")].reshape(K, -1, 3)
        pred_offset3d = pois[:, k2c("3d_offset")]
        pred_orient = jnp.concatenate(
            [pois[:, k2c("ori_cls")], pois[:, k2c("ori_offset")]], axis=1
        )
        cls_ids = flat(batch["cls_ids"])
        pred_dims = codec.decode_dimension(
            cls_ids, pois[:, k2c("3d_dim")],
            jnp.asarray(head.dimension_mean), jnp.asarray(head.dimension_std), head.dimension_reg,
        )

        kpts_2d_img = codec.decode_kpts_2d_img(pred_ek2, centers, gt_offset3d, pad_size, down)
        pairs, _ = codec.decode_pairs_kpts_depth(
            kpts_2d_img, pred_ek3, gt_rotys, safe_P,
            training=True, pairs_topk=head.pairs_topk, clamp=head.pairs_depth_clamp,
        )
        depth = pairs.mean(axis=1)
        pred_loc = codec.decode_location(centers, pred_offset3d, depth, safe_P, pad_size, down)
        pred_rotys, _ = codec.decode_axes_orientation(
            pred_orient, pred_loc, cfg.input.orientation_bin_size
        )
        return {
            "kpts_2d_img": kpts_2d_img,
            "kpts_3d": pred_ek3,
            "pred_rot": pred_rotys,
            "gt_location": gt_locations,
            "pred_location": pred_loc,
            "mask": m3d,
        }

    return gen_step
