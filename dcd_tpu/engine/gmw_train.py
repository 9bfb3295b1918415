"""GMW (stage 2) training/validation engine.

Rewrite of the loops in ``GMW/main.py``: jitted train step with
``loss = cls_weight * correspondenceLoss + reg_weight * reg_loss``
(:454-461), the epoch-50 weight flip (:312-315), AdamW + cosine LR
(:255-272), and the validation-side location rescale
``pred_location = (pred_depth / raw_depth) * raw_location`` applied around
the half-height shift (:542-547).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models import gmw as G


@dataclass(frozen=True)
class GMWConfig:
    """Mirrors GMW/main.py argparse defaults (:47-93)."""

    num_kpts: int = 73
    features: int = 128
    depth: int = 12
    lr: float = 1e-4
    weight_decay: float = 1e-4
    epochs: int = 100
    batch_size: int = 8
    cls_weight: float = 1.0
    reg_weight: float = 0.1
    reg_loss_start_epoch: int = 50
    topk: int = 1500
    sinkhorn_lambda: float = 10.0


class GMWState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def epoch_cosine_lr(cfg: GMWConfig, steps_per_epoch: int):
    """Cosine LR annealed per *epoch*, evaluated at optimizer-step
    granularity: lr(step) = 0.5*lr*(1+cos(pi*epoch/epochs)) with
    epoch = step // steps_per_epoch. Matches the reference's
    CosineAnnealingLR(T_max=epochs) stepped once per epoch
    (GMW/main.py:255-272) — the schedule must NOT advance per optimizer
    update or LR collapses to ~0 after `epochs` mini-batches."""
    steps_per_epoch = max(int(steps_per_epoch), 1)

    def schedule(count):
        epoch = jnp.minimum(count // steps_per_epoch, cfg.epochs)
        return 0.5 * cfg.lr * (1.0 + jnp.cos(jnp.pi * epoch / cfg.epochs))

    return schedule


def create_gmw_state(cfg: GMWConfig, rng, steps_per_epoch: int = 1) -> Tuple[G.GMW, GMWState]:
    """steps_per_epoch drives the per-epoch cosine LR schedule; pass the
    real optimizer-updates-per-epoch of your loader (ceil is fine)."""
    model = G.GMW(
        num_kpts=cfg.num_kpts,
        features=cfg.features,
        depth=cfg.depth,
        sinkhorn_lambda=cfg.sinkhorn_lambda,
    )
    n = cfg.num_kpts
    k2 = jnp.zeros((1, n, 2), jnp.float32)
    k3 = jnp.zeros((1, n, 3), jnp.float32)
    params = model.init(rng, k2, k3)
    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_learning_rate(epoch_cosine_lr(cfg, steps_per_epoch)),
    )
    return model, GMWState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def make_gmw_train_step(cfg: GMWConfig, model: G.GMW):
    """(state, batch, cls_w, reg_w) -> (state, logs). batch keys:
    kpts_2d (B, n, 2), kpts_3d (B, n, 3), pred_rot (B,), gt_depth (B,)."""

    def step(state: GMWState, batch, cls_w: jnp.ndarray, reg_w: jnp.ndarray):
        pre_depths, good_idx = G.compute_z(
            batch["kpts_2d"], batch["kpts_3d"], batch["pred_rot"], cfg.topk
        )
        E = cfg.num_kpts * (cfg.num_kpts - 1) // 2
        eye = jnp.broadcast_to(jnp.eye(E), (batch["kpts_2d"].shape[0], E, E))

        def loss_fn(params):
            reg_weights, P = model.apply(params, batch["kpts_2d"], batch["kpts_3d"])
            cls_loss = G.correspondence_loss(P, eye)
            reg_loss, pred_depth = G.compute_reg_loss(
                pre_depths, reg_weights, batch["gt_depth"], good_idx
            )
            total = cls_w * cls_loss + reg_w * reg_loss
            mae = (jnp.abs(pred_depth - batch["gt_depth"]) / batch["gt_depth"]).mean()
            return total, (cls_loss, reg_loss, mae)

        (total, (cls_loss, reg_loss, mae)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # skip-update-on-NaN (reference main.py:464 skips backward on NaN)
        finite = jnp.isfinite(total)
        grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, {"loss": total, "cls_loss": cls_loss, "reg_loss": reg_loss, "depth_MAE": mae}

    return step


def make_gmw_predict(cfg: GMWConfig, model: G.GMW):
    """(params, batch) -> refined depth (B,). Validation path
    (GMW/main.py:524-547 before the location rescale)."""

    def predict(params, batch):
        pre_depths, good_idx = G.compute_z(
            batch["kpts_2d"], batch["kpts_3d"], batch["pred_rot"], cfg.topk
        )
        reg_weights, _ = model.apply(params, batch["kpts_2d"], batch["kpts_3d"])
        _, pred_depth = G.compute_reg_loss(
            pre_depths, reg_weights, jnp.zeros_like(pre_depths[:, 0]), good_idx
        )
        return pred_depth

    return predict


def rescale_location(
    raw_location: np.ndarray, pred_depth: np.ndarray, dims_hwl: np.ndarray
) -> np.ndarray:
    """Move the detection along its camera ray to the refined depth
    (reference GMW/main.py:542-547): shift to mid-height center, scale by
    depth ratio, shift back."""
    raw = np.asarray(raw_location, np.float64).copy()
    h = np.asarray(dims_hwl)[:, 0]
    scale = np.asarray(pred_depth) / raw[:, 2]
    raw[:, 1] -= h / 2
    out = scale[:, None] * raw
    out[:, 1] += h / 2
    return out


def loss_weights_for_epoch(cfg: GMWConfig, epoch: int) -> Tuple[float, float]:
    """Weight flip at reg_loss_start_epoch (GMW/main.py:312-315)."""
    if epoch >= cfg.reg_loss_start_epoch:
        return 0.1, 1.0
    return cfg.cls_weight, cfg.reg_weight
