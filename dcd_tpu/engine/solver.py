"""Optimizer + LR schedule (optax).

Mirrors the reference solver (``DGDE/solver/__init__.py:27-92``):
AdamW(betas=(0.9, 0.99)) with 2x LR on biases (BIAS_LR_FACTOR,
solver/__init__.py:22), cosine warmup for WARMUP_STEPS
(CosineWarmupLR, learning_schedules_fastai.py:85-93) followed by
multi-step x0.1 decay at epoch boundaries, floored at LR_CLIP.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..config import Config


def make_lr_schedule(cfg: Config, iters_per_epoch: int):
    s = cfg.solver
    if s.optimizer == "adam_onecycle":
        return make_onecycle_schedules(cfg)[0]
    base_lr = s.base_lr
    warmup_steps = s.warmup_steps if s.lr_warmup else 0
    decay_steps = [int(e * iters_per_epoch) for e in s.decay_epoch_steps]
    eta_min = base_lr / 10.0  # DIV_FACTOR=10 (solver/__init__.py:86-89)
    lr_floor = s.lr_clip

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # cosine warmup: eta_min + (base - eta_min) * (1 - cos(pi t/T)) / 2
        warm = eta_min + (base_lr - eta_min) * (1.0 - jnp.cos(jnp.pi * step / max(warmup_steps, 1))) / 2.0
        decay = jnp.asarray(1.0, jnp.float32)
        for ds in decay_steps:
            decay = decay * jnp.where(step >= ds, s.lr_decay, 1.0)
        main = jnp.maximum(base_lr * decay, lr_floor)
        if warmup_steps <= 0:
            return main
        return jnp.where(step < warmup_steps, warm, main)

    return schedule


def _annealing_cos(start, end, pct):
    """Cosine anneal start->end as pct goes 0->1
    (learning_schedules_fastai.py:53-57)."""
    return end + (start - end) / 2.0 * (jnp.cos(jnp.pi * pct) + 1.0)


def make_onecycle_schedules(cfg: Config):
    """(lr_schedule, momentum_schedule) for the reference's OneCycle policy
    (learning_schedules_fastai.py:61-85): cosine ramp lr_max/div_factor ->
    lr_max over the first pct_start of MAX_ITERATION steps, then cosine
    decay to low_lr/1e4; momentum runs the mirror cycle moms[0] -> moms[1]
    -> moms[0]."""
    s = cfg.solver
    T = int(s.max_iteration)
    a1 = int(s.pct_start * T)
    low_lr = s.base_lr / s.div_factor
    m0, m1 = s.moms

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = step / max(a1, 1)
        p2 = (step - a1) / max(T - a1, 1)
        up = _annealing_cos(low_lr, s.base_lr, p1)
        down = _annealing_cos(s.base_lr, low_lr / 1e4, p2)
        return jnp.where(step >= a1, down, up)

    def mom(step):
        step = jnp.asarray(step, jnp.float32)
        p1 = step / max(a1, 1)
        p2 = (step - a1) / max(T - a1, 1)
        up = _annealing_cos(m0, m1, p1)
        down = _annealing_cos(m1, m0, p2)
        return jnp.where(step >= a1, down, up)

    return lr, mom


def _bias_mask(params, is_bias: bool):
    def f(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        b = name in ("bias",)
        return b if is_bias else not b

    return jax.tree_util.tree_map_with_path(f, params)


def _cfg_without_freeze(cfg: Config) -> Config:
    import dataclasses

    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, freeze_names=())
    )


def build_optimizer(cfg: Config, params, iters_per_epoch: int) -> optax.GradientTransformation:
    s = cfg.solver
    schedule = make_lr_schedule(cfg, iters_per_epoch)

    def adamw(factor):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99),
            optax.add_decayed_weights(s.weight_decay),
            optax.scale_by_schedule(lambda t: -schedule(t) * factor),
        )

    # global grad-norm clip happens across ALL params before the step
    # (clip_grad_norm_ in trainer.py:144), so it sits outside the per-group
    # transforms.
    clip = (
        optax.clip_by_global_norm(s.grad_norm_clip) if s.grad_norm_clip > 0 else optax.identity()
    )
    if cfg.model.freeze_names:
        # finetune-mode freezing (reference set_freeze_by_names,
        # check_point.py:78-96): zero the updates of named top-level
        # subtrees. Functional equivalent of requires_grad=False — the
        # params never change; adam moments for them stay zero.
        frozen = set(cfg.model.freeze_names)

        def freeze_label(path, _):
            name = path[0].key if hasattr(path[0], "key") else str(path[0])
            return "frozen" if name in frozen else "live"

        labels = jax.tree_util.tree_map_with_path(freeze_label, params)
        inner = build_optimizer(
            _cfg_without_freeze(cfg), params, iters_per_epoch
        )
        return optax.multi_transform(
            {"frozen": optax.set_to_zero(), "live": inner}, labels
        )
    if s.optimizer == "adam_onecycle":
        # fastai OptimWrapper path (solver/__init__.py:45-58): plain Adam
        # betas=(mom, 0.99) with the momentum itself cycled by the OneCycle
        # schedule, true_wd decoupled decay scaled by lr, and NO bias LR
        # group (get_layer_groups lumps the whole model together).
        lr_sched, mom_sched = make_onecycle_schedules(cfg)
        return optax.chain(
            clip,
            optax.inject_hyperparams(
                lambda b1: optax.scale_by_adam(b1=b1, b2=0.99)
            )(b1=mom_sched),
            optax.add_decayed_weights(s.weight_decay),
            optax.scale_by_schedule(lambda t: -lr_sched(t)),
        )
    if s.bias_lr_factor != 1.0:
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "bias"
            if (hasattr(path[-1], "key") and path[-1].key == "bias")
            else "rest",
            params,
        )
        return optax.chain(
            clip,
            optax.multi_transform(
                {"bias": adamw(s.bias_lr_factor), "rest": adamw(1.0)}, labels
            ),
        )
    return optax.chain(clip, adamw(1.0))
