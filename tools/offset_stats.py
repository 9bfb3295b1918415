#!/usr/bin/env python
"""Measure trained DCN offset statistics (dense-window clamp validation).

The TPU deformable conv bounds sampling offsets to a window of radius R
(``cfg.model.backbone.dcn_radius``, default 3), while the reference CUDA
kernel samples unboundedly (dcn_v2_im2col_cuda.cu:25-55). This tool
captures every DCN module's predicted offsets on real forward passes and
reports, per module, the fraction of taps whose offset magnitude exceeds
each candidate radius — the empirical evidence for (or against) the clamp.

An exact radius-free path also exists (``--dcn_impl gather``); if this
tool shows escaping offsets on your checkpoint, either raise
``dcn_radius`` or switch impl.

Usage:
  python tools/offset_stats.py [--ckpt DIR] [--data_root KITTI] [--train_steps N]
  (no args: synthetic scenes; --train_steps first fits the model briefly so
  offsets move off their zero init)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def collect_offsets(model, variables, images, edge_idx, edge_len):
    """One forward pass capturing every conv_offset_mask output.

    Returns {module_path: (B,H,W,2K) offsets ndarray} (pre-clip values,
    exactly what the CUDA kernel would sample with)."""
    import jax.numpy as jnp

    _, inter = model.apply(
        variables,
        images,
        edge_idx,
        edge_len,
        train=False,
        capture_intermediates=lambda mdl, _m: mdl.name == "conv_offset_mask",
    )

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "__call__" in tree:
                om = np.asarray(tree["__call__"][0], np.float32)
                K = om.shape[-1] // 3
                o1, o2 = om[..., :K], om[..., K : 2 * K]
                out["/".join(path[:-1])] = np.stack([o1, o2], -1).reshape(
                    *om.shape[:-1], 2 * K
                )
            else:
                for k, v in tree.items():
                    walk(v, path + [k])

    walk(inter.get("intermediates", inter), [])
    return out


def report(offsets_by_module, radii=(1, 2, 3, 4, 5)):
    rows = []
    for name, off in sorted(offsets_by_module.items()):
        mag = np.abs(off.reshape(-1))
        row = {
            "module": name,
            "std": float(mag.std()),
            "p99.9": float(np.percentile(mag, 99.9)),
            "max": float(mag.max()),
        }
        for r in radii:
            row[f"frac>|{r}|"] = float((mag > r).mean())
        rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir to load")
    p.add_argument("--data_root", default=None, help="KITTI training dir (default: synthetic)")
    p.add_argument("--train_steps", type=int, default=0,
                   help="fit the model on synthetic batches first (no ckpt case)")
    p.add_argument("--batches", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dcd_tpu.config import dgde_run_config
    from dcd_tpu.data import synthetic
    from dcd_tpu.data.target_encoder import collate, encode_targets
    from dcd_tpu.engine.train import create_train_state, make_train_step

    cfg = dgde_run_config()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt:
        from dcd_tpu.utils.checkpoint import Checkpointer

        state = Checkpointer(args.ckpt).load(state)
        print(f"loaded checkpoint at step {int(state.step)}")

    def make_batch(seed):
        if args.data_root:
            from dcd_tpu.data.kitti_dataset import KITTIDataset

            ds = KITTIDataset(cfg, args.data_root, is_train=True, augment=False)
            samples = [ds.get_sample((seed * 4 + i) % len(ds)) for i in range(4)]
        else:
            samples = [
                encode_targets(
                    *synthetic.make_scene(seed=seed * 4 + i, num_objs=8), cfg
                )
                for i in range(4)
            ]
        return collate(samples)

    if args.train_steps:
        step = jax.jit(make_train_step(cfg, model))
        for i in range(args.train_steps):
            state, logs = step(state, make_batch(i))
            if i % 10 == 0:
                print(f"  fit step {i}: loss {float(logs['total_loss']):.3f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    acc = {}
    for b in range(args.batches):
        batch = make_batch(1000 + b)
        offs = collect_offsets(
            model, variables,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["edge_indices"]),
            jnp.asarray(batch["edge_len"]),
        )
        for k, v in offs.items():
            acc.setdefault(k, []).append(v)
    merged = {k: np.concatenate(v) for k, v in acc.items()}
    rows = report(merged)
    hdr = list(rows[0].keys())
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(round(r[h], 6)) if h != "module" else r[h] for h in hdr))
    worst = max(r["frac>|3|"] for r in rows)
    print(
        f"\nworst-module fraction escaping the default radius 3: {worst:.2e} "
        f"({'OK — clamp is faithful' if worst < 1e-3 else 'RAISE dcn_radius or use impl=gather'})"
    )


if __name__ == "__main__":
    main()
