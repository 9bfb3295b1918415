"""Jitted training step + training state.

Replaces the reference's host-side training loop body
(``DGDE/engine/trainer.py:121-155``): one jitted function does forward,
loss, backward, grad clip, optimizer update, and BN running-stat update.
AMP/GradScaler (trainer.py:118-150) is unnecessary on TPU — activations can
run in bf16 natively (cfg.model.fp16) while params, losses, and geometry
stay fp32; no loss scaling is needed for bf16.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import Config
from ..models.detector import KeypointDetector
from .loss import compute_losses
from .solver import build_optimizer, make_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats,
            opt_state=new_opt_state,
        )


def build_model(cfg: Config) -> KeypointDetector:
    dtype = jnp.bfloat16 if cfg.model.fp16 else jnp.float32
    return KeypointDetector(cfg, dtype=dtype)


_PRETRAIN_FAILED_SRC: Optional[str] = None


def _maybe_load_pretrain(cfg: Config, variables):
    """Load ImageNet DLA-34 torch weights into the backbone trunk when
    ``cfg.model.pretrain`` is set (reference dla_dcn.py:344-358 downloads
    and loads them on every backbone build). ``pretrain_path`` may be a
    local .pth file, a ``catalog://`` entry, or an ``http(s)://`` URL; with
    no path set, the reference's catalog DLA-34 URL is tried and an offline
    environment degrades to random init with a warning (the reference
    would crash — we train-from-scratch instead, logged loudly)."""
    if not cfg.model.pretrain:
        return variables
    if cfg.model.pretrain_path is None and tuple(cfg.model.backbone.channels) != (
        16, 32, 64, 128, 256, 512,
    ):
        # implicit catalog pretrain only applies to the real DLA-34 trunk
        # (tiny test/dryrun configs would shape-mismatch anyway)
        return variables
    import logging

    from ..utils.checkpoint import (
        import_torch_dla34,
        load_torch_checkpoint,
        resolve_checkpoint_source,
    )

    log = logging.getLogger("dcd_tpu")
    src = cfg.model.pretrain_path or "catalog://ImageNetPretrained/DLA34"
    global _PRETRAIN_FAILED_SRC
    if src == _PRETRAIN_FAILED_SRC:
        return variables  # already warned this process
    try:
        path = resolve_checkpoint_source(src)
        sd = load_torch_checkpoint(path)
    except Exception as e:  # offline / missing file
        if cfg.model.pretrain_path:
            raise  # an explicit path failing is a real error
        _PRETRAIN_FAILED_SRC = src
        log.warning(
            "ImageNet DLA-34 pretrain unavailable (%s: %s); training the "
            "backbone from scratch — expect lower AP than the reference.",
            src, e,
        )
        return variables
    params, stats = import_torch_dla34(sd, variables)
    log.info("Loaded ImageNet DLA-34 pretrain from %s", src)
    return dict(variables, params=params, batch_stats=stats)


def create_train_state(cfg: Config, rng, iters_per_epoch: int = 1000) -> Tuple[KeypointDetector, TrainState]:
    model = build_model(cfg)
    H, W = cfg.input.height_train, cfg.input.width_train
    Ho, Wo = H // cfg.model.backbone.down_ratio, W // cfg.model.backbone.down_ratio
    L = (Ho + Wo) * 2
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    edge_idx = jnp.zeros((1, L, 2), jnp.int32)
    edge_len = jnp.ones((1,), jnp.int32)
    # jit the init: eager init dispatches every op separately, which is
    # pathologically slow through the remote TPU tunnel
    variables = jax.jit(
        lambda r, im, ei, el: model.init(r, im, ei, el, train=False)
    )(rng, dummy, edge_idx, edge_len)
    variables = _maybe_load_pretrain(cfg, variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = build_optimizer(cfg, params, iters_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
    return model, state


def make_grad_fn(cfg: Config, model: KeypointDetector):
    """(params, batch_stats, batch) -> ((total, (new_batch_stats, logs)), grads).

    The single-microbatch gradient unit shared by the plain and
    gradient-accumulated train steps (and usable as a test oracle)."""

    def grad_one(params, batch_stats, batch):
        def forward(params, images, edge_indices, edge_len):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                edge_indices,
                edge_len,
                train=True,
                mutable=["batch_stats"],
            )

        if getattr(cfg.model, "remat", False):
            # gradient checkpointing: recompute the forward during the
            # backward pass instead of storing activations (the TPU remat
            # equivalent of the reference's memory tricks)
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            preds, mutated = forward(
                params, batch["images"], batch["edge_indices"], batch["edge_len"]
            )
            total, loss_dict, log_dict = compute_losses(cfg, preds, batch)
            return total, (mutated["batch_stats"], log_dict)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    return grad_one


def make_train_step(cfg: Config, model: KeypointDetector, iters_per_epoch: int = 1000):
    """Returns a jittable (state, batch) -> (state, logs) function.

    Under jit with the batch sharded over the mesh's ``data`` axis, the
    global-batch loss mean makes XLA insert the gradient all-reduce, and
    BatchNorm's global-batch moments give SyncBN semantics.

    With ``cfg.solver.grad_accum_steps = A > 1`` the batch is processed as
    A sequential microbatches under ``lax.scan``, gradients averaged in
    the carry, and ONE optimizer update applied — peak activation memory
    is that of batch/A. Equal-size microbatches make the averaged grad
    identical to the full-batch grad up to BN: batch moments are per
    microbatch (classic DDP-without-SyncBN semantics; the running stats
    see A momentum updates per step).
    """
    schedule = make_lr_schedule(cfg, iters_per_epoch)
    accum = max(int(getattr(cfg.solver, "grad_accum_steps", 1)), 1)
    grad_one = make_grad_fn(cfg, model)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if accum == 1:
            (total, (new_bs, logs)), grads = grad_one(
                state.params, state.batch_stats, batch
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]),
                batch,
            )
            zero_grads = jax.tree.map(jnp.zeros_like, state.params)

            def body(carry, mb):
                bs, gacc = carry
                (t, (bs2, lg)), g = grad_one(state.params, bs, mb)
                gacc = jax.tree.map(lambda a, b: a + b / accum, gacc, g)
                return (bs2, gacc), (t, lg)

            (new_bs, grads), (totals, logs_stack) = jax.lax.scan(
                body, (state.batch_stats, zero_grads), micro
            )
            total = totals.mean()
            logs = jax.tree.map(lambda x: x.mean(0), logs_stack)

        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        logs = dict(logs)
        logs["total_loss"] = total
        logs["lr"] = schedule(state.step)
        logs["grad_norm"] = optax.global_norm(grads)
        return new_state, logs

    return train_step


def make_eval_forward(cfg: Config, model: KeypointDetector):
    """Jittable eval-mode forward returning raw head outputs."""

    def forward(params, batch_stats, images, edge_indices, edge_len):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            edge_indices,
            edge_len,
            train=False,
        )

    return forward
