"""Single-chip DGDE inference benchmark.

Measures end-to-end jitted inference (backbone + heads + postprocess) on
the full 384x1280 input, prints ONE JSON line. Baseline target: 100
images/sec/chip (BASELINE.md north star).
"""

import json
import time

import numpy as np


def _realistic_offsets(variables):
    """Perturb every zero-init ``conv_offset_mask`` so it emits offsets with
    trained-checkpoint statistics.

    The adaptive Pallas DCN kernel skips window positions outside the
    per-tile offset bounds; with the module's zero init the bounds collapse
    and the bench would measure an unrealistically easy case. Trained
    offsets (docs/OFFSET_STATS.md) have std ~0.3 px and p99.9 ~2.3 px at the
    worst module; we inject a per-channel bias draw of std 0.45 plus kernel
    noise sized for ~0.3 px of spatial variation — at or above the trained
    regime, so the measured number is honest-to-pessimistic.
    """
    import jax
    import jax.numpy as jnp

    seed = [0]

    def visit(tree):
        for name, sub in tree.items():
            if name == "conv_offset_mask":
                k = sub["kernel"]
                b = sub["bias"]
                n3k = b.shape[0]
                n_off = 2 * n3k // 3  # offset channels; rest are mask logits
                fan_in = k.shape[0] * k.shape[1] * k.shape[2]
                kb, kk = jax.random.split(jax.random.PRNGKey(seed[0]))
                seed[0] += 1
                bias_noise = 0.45 * jax.random.normal(kb, (n_off,), b.dtype)
                sub["bias"] = b.at[:n_off].add(bias_noise)
                kern_noise = (0.3 / fan_in**0.5) * jax.random.normal(
                    kk, (*k.shape[:3], n_off), k.dtype
                )
                sub["kernel"] = k.at[..., :n_off].add(kern_noise)
            elif isinstance(sub, dict):
                visit(sub)

    import flax

    params = flax.core.unfreeze(variables)["params"]
    visit(params)
    out = dict(flax.core.unfreeze(variables))
    out["params"] = params
    return out


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dcn_impl", default=None,
        help="override backbone dcn impl: dense | pallas | gather | plain",
    )
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument(
        "--dcn_radius", type=int, default=None,
        help="override the DCN window radius (docs/OFFSET_STATS.md: trained "
        "offsets sit within ~2.3 px, so 2 is safe for trained checkpoints)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the big XLA compile
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.engine.infer import postprocess
    from dcd_tpu.engine.train import build_model
    from dcd_tpu.data.synthetic import KITTI_P2

    import dataclasses

    cfg = dgde_run_config()
    # bf16 activations for inference (fp32 params; geometry stays fp32)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, fp16=True))
    if args.dcn_impl:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(cfg.model.backbone, dcn_impl=args.dcn_impl),
            ),
        )
    if args.dcn_radius is not None:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                backbone=dataclasses.replace(cfg.model.backbone, dcn_radius=args.dcn_radius),
            ),
        )
    batch = args.batch
    H, W = cfg.input.height_train, cfg.input.width_train
    Ho, Wo = H // 4, W // 4
    L = (Ho + Wo) * 2

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, H, W, 3), jnp.float32)
    edge_idx = jnp.zeros((batch, L, 2), jnp.int32)
    edge_len = jnp.full((batch,), L - 1, jnp.int32)
    variables = jax.jit(
        lambda r, im, ei, el: model.init(r, im, ei, el, train=False)
    )(rng, images[:1], edge_idx[:1], edge_len[:1])
    variables = _realistic_offsets(variables)

    calib_P = jnp.asarray(np.tile(KITTI_P2[None], (batch, 1, 1)), jnp.float32)
    pad_size = jnp.asarray(np.tile([[19.0, 4.0]], (batch, 1)), jnp.float32)
    img_size = jnp.asarray(np.tile([[1242.0, 375.0]], (batch, 1)), jnp.float32)

    @jax.jit
    def infer(images, edge_idx, edge_len):
        preds = model.apply(
            variables, images, edge_idx, edge_len, train=False,
            lazy_topk=cfg.test.lazy_reg_heads,
        )
        return postprocess(cfg, preds, calib_P, pad_size, img_size)

    def fetch(out):
        # force device completion with a host copy — block_until_ready does
        # not synchronize on all PJRT transports (e.g. the axon tunnel)
        return np.asarray(out["dets"]).ravel()[0]

    # warmup / compile
    out = infer(images, edge_idx, edge_len)
    fetch(out)

    # the shared-tunnel chip is noisy run-to-run; take the best of several
    # measurement rounds
    n_iters = 10
    best_dt = float("inf")
    for _round in range(4):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = infer(images, edge_idx, edge_len)
        fetch(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    images_per_sec = batch * n_iters / dt
    baseline = 100.0  # images/sec/chip target (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "dgde_infer_images_per_sec",
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
