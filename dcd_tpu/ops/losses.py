"""Loss functions for the DGDE detector.

Rewrites of the reference losses with identical math:
* penalty-reduced focal (``DGDE/model/layers/focal_loss.py:29-86``)
* IoU / GIoU on FCOS-style l/t/r/b boxes (``layers/iou_loss.py:7-49``)
* depth losses incl. depth-reweighted L1 (``head/depth_losses.py:50-104``)
* multi-bin orientation loss (``head/detector_loss.py:644-666``), vectorized
  over bins instead of the reference's python loop.

All of these are mask-based (no boolean indexing) so they trace to
static-shape XLA programs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def penalty_reduced_focal_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    alpha: float = 2.0,
    beta: float = 4.0,
    eps: float = 1e-10,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CenterNet focal loss on a gaussian-splatted heatmap.

    target==1 are positives; 0<=target<1 negatives weighted by (1-t)^beta;
    target==-1 is ignored. Returns (sum loss, num positives).
    Reference: focal_loss.py:57-86.

    The clip must run in fp32 AND its upper bound must be representable:
    the reference clamps to ``1 - 1e-10`` (focal_loss.py:34,58), but that
    rounds to exactly 1.0 in fp32 (machine eps 1.19e-7) — and under bf16
    activations the sigmoid saturates to 1.0 at logit ~6.2, so log(1-p)
    returned -inf (observed as an inf hm_loss at full-size bf16 batch-16
    training, fusion-dependent). We clamp to 1 - max(eps, 1e-7), which
    only binds where the reference's own fp32 math would emit ~inf.
    """
    prediction = prediction.astype(jnp.float32)
    prediction = jnp.clip(prediction, eps, 1.0 - max(eps, 1e-7))
    target = target.astype(jnp.float32)
    positive_index = (target == 1.0).astype(prediction.dtype)
    negative_index = ((target < 1.0) & (target >= 0.0)).astype(prediction.dtype)

    negative_weights = jnp.power(1.0 - jnp.clip(target, 0.0, 1.0), beta)
    positive_loss = jnp.log(prediction) * jnp.power(1.0 - prediction, alpha) * positive_index
    negative_loss = (
        jnp.log(1.0 - prediction) * jnp.power(prediction, alpha) * negative_weights * negative_index
    )
    num_positive = positive_index.sum()
    loss = -(positive_loss + negative_loss).sum()
    return loss, num_positive


def iou_loss(
    pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "giou"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IoU family on (K, 4) l/t/r/b distances (reference iou_loss.py:12-49).

    Returns (per-element losses, per-element ious).
    """
    pred_left, pred_top, pred_right, pred_bottom = [pred[:, i] for i in range(4)]
    tgt_left, tgt_top, tgt_right, tgt_bottom = [target[:, i] for i in range(4)]

    target_area = (tgt_left + tgt_right) * (tgt_top + tgt_bottom)
    pred_area = (pred_left + pred_right) * (pred_top + pred_bottom)

    w_intersect = jnp.minimum(pred_left, tgt_left) + jnp.minimum(pred_right, tgt_right)
    g_w_intersect = jnp.maximum(pred_left, tgt_left) + jnp.maximum(pred_right, tgt_right)
    h_intersect = jnp.minimum(pred_bottom, tgt_bottom) + jnp.minimum(pred_top, tgt_top)
    g_h_intersect = jnp.maximum(pred_bottom, tgt_bottom) + jnp.maximum(pred_top, tgt_top)
    ac_union = g_w_intersect * g_h_intersect + 1e-7
    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / ac_union
    if loss_type == "iou":
        losses = -jnp.log(ious)
    elif loss_type == "linear_iou":
        losses = 1.0 - ious
    elif loss_type == "giou":
        losses = 1.0 - gious
    else:
        raise NotImplementedError(loss_type)
    return losses, ious


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def log_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """L1 in log-depth space (reference depth_losses.py:82-92)."""
    return jnp.abs(jnp.log(pred) - jnp.log(target))


def berhu_loss(pred: jnp.ndarray, target: jnp.ndarray, c_factor: float = 0.2) -> jnp.ndarray:
    """Reverse-Huber (reference depth_losses.py:31-48), elementwise form."""
    differ = jnp.abs(pred - target)
    c = jnp.clip(jnp.max(differ) * c_factor, min=1e-4)
    return jnp.where(differ <= c, differ, (differ**2 / c + c) / 2.0)


def depth_reweight(dep: jnp.ndarray) -> jnp.ndarray:
    """Depth-dependent weighting for extra-keypoint 2D loss
    (reference depth_losses.py:61-64): near objects down-weighted linearly,
    far objects ~log10(d-4)+0.1."""
    return jnp.where(dep < 5.0, dep * 0.01, jnp.log10(jnp.maximum(dep, 5.0) - 4.0) + 0.1)


def reg_weighted_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, dep: jnp.ndarray) -> jnp.ndarray:
    """Per-keypoint L1 summed over xy, reweighted by object depth.

    pred/target: (K, n, 2); dep: (K,). Returns (K, n).
    Reference: depth_losses.py:50-67 (RegWeightedL1Loss).
    """
    w = depth_reweight(dep)[:, None]
    loss = jnp.abs(pred - target).sum(axis=-1)
    return loss * w


def multibin_orientation_loss(
    vector_ori: jnp.ndarray,
    gt_ori: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    num_bin: int = 4,
) -> jnp.ndarray:
    """Multi-bin orientation loss (reference detector_loss.py:644-666),
    vectorized over bins and masked per object.

    vector_ori: (K, num_bin*4) = per-bin 2-way logits then per-bin sin/cos.
    gt_ori: (K, num_bin*2) = per-bin membership (0/1) then per-bin offsets.
    weight: (K,) optional 0/1 mask for valid objects. Returns scalar
    cls_losses/num_bin + reg_losses (sums, matching the reference).
    """
    K = vector_ori.shape[0]
    if weight is None:
        weight = jnp.ones((K,), dtype=vector_ori.dtype)
    logits = vector_ori[:, : num_bin * 2].reshape(K, num_bin, 2)
    gt_cls = gt_ori[:, :num_bin]
    gt_offset = gt_ori[:, num_bin : num_bin * 2]

    # cross-entropy per bin (reference uses F.cross_entropy over 2 logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -(gt_cls * logp[..., 1] + (1.0 - gt_cls) * logp[..., 0])  # (K, num_bin)
    cls_losses = (ce * weight[:, None]).sum()

    offs = vector_ori[:, num_bin * 2 :].reshape(K, num_bin, 2)
    norm = jnp.maximum(jnp.linalg.norm(offs, axis=-1, keepdims=True), 1e-12)
    offs = offs / norm
    valid = (gt_cls == 1.0).astype(vector_ori.dtype) * weight[:, None]
    reg = jnp.abs(offs[..., 0] - jnp.sin(gt_offset)) + jnp.abs(offs[..., 1] - jnp.cos(gt_offset))
    reg_losses = (reg * valid).sum()
    return cls_losses / num_bin + reg_losses


def wing_loss(prediction: jnp.ndarray, target: jnp.ndarray, w: float = 10.0, eps: float = 2.0) -> jnp.ndarray:
    """Wing loss (reference model/utils.py:51-66): logarithmic near zero,
    L1 minus a constant beyond w."""
    import numpy as _np

    C = w - w * float(_np.log(1.0 + w / eps))
    differ = jnp.abs(prediction - target)
    return jnp.where(differ < w, w * jnp.log1p(differ / eps), differ - C)


def laplace_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Relative-error loss |1 - pred/target| (reference model/utils.py:18-25)."""
    return jnp.abs(1.0 - pred / target)


def uncertainty_reg_loss(reg_loss: jnp.ndarray, uncertainty: jnp.ndarray) -> jnp.ndarray:
    """loss * exp(-u) + 0.5 * u (reference model/utils.py:7-15)."""
    return reg_loss * jnp.exp(-uncertainty) + 0.5 * uncertainty


def multitask_uncertainty_weighting(loss_dict, log_vars, uncertainty_keys):
    """Learned log-variance task weighting (reference
    layers/uncert_wrapper.py:17-56): for each flagged loss term,
    ``loss * exp(-s_i) + s_i``. log_vars is a (num_uncertain,) parameter
    array managed by the caller; returns (new loss_dict, weight dict)."""
    out = dict(loss_dict)
    weights = {}
    for i, key in enumerate(uncertainty_keys):
        if key in out:
            out[key] = out[key] * jnp.exp(-log_vars[i]) + log_vars[i]
        weights[key.replace("_loss", "") + "_w"] = jnp.exp(-log_vars[i])
    return out, weights
