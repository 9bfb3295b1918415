"""Checkpoint save/load + torch DLA-34 weight import.

Replaces ``DetectronCheckpointer`` (DGDE/utils/check_point.py:12-178) with
an orbax-backed checkpointer: (params, batch_stats, opt_state, step) plus a
``last_checkpoint`` tag file for --resume semantics (check_point.py:51-56).

``import_torch_dla34`` is the name-mapped loader for the reference's
ImageNet DLA-34 torch weights (the suffix-aligned state-dict matching of
``utils/model_serialization.py:8-79`` becomes an explicit structural walk —
flax trees are nested, so exact mapping beats suffix heuristics).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Checkpointer:
    def __init__(self, save_dir: str, max_to_keep: int = 10):
        import orbax.checkpoint as ocp

        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ocp = ocp
        self.ckptr = ocp.StandardCheckpointer()

    def _tag_file(self) -> str:
        return os.path.join(self.save_dir, "last_checkpoint")

    def save(self, name: str, state) -> str:
        path = os.path.join(self.save_dir, name)
        tree = {
            "step": np.asarray(state.step),
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, getattr(state, "batch_stats", {})),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
        }
        self.ckptr.save(path, tree, force=True)
        # orbax commits asynchronously; block so process exit can't race
        # the write (the async thread dies with "cannot schedule new
        # futures after shutdown" otherwise)
        self.ckptr.wait_until_finished()
        with open(self._tag_file(), "w") as f:
            f.write(name)
        return path

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_file())

    def last_checkpoint(self) -> Optional[str]:
        if not self.has_checkpoint():
            return None
        with open(self._tag_file(), "r") as f:
            return os.path.join(self.save_dir, f.read().strip())

    def load(self, state, path: Optional[str] = None):
        """Restore into a template TrainState (shape/dtype reference)."""
        path = path or self.last_checkpoint()
        if path is None:
            return state
        has_bs = hasattr(state, "batch_stats")
        template = {
            "step": np.asarray(state.step),
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, getattr(state, "batch_stats", {})),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
        }
        restored = self.ckptr.restore(path, template)
        kwargs = dict(
            step=jnp.asarray(restored["step"]),
            params=jax.tree.map(jnp.asarray, restored["params"]),
            opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        )
        if has_bs:
            kwargs["batch_stats"] = jax.tree.map(jnp.asarray, restored["batch_stats"])
        return state.replace(**kwargs)


# ---------------------------------------------------------------------------
# torch DLA-34 (ImageNet) -> flax DLASeg backbone import
# ---------------------------------------------------------------------------


def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _assign(params: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = params
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    assert tuple(old.shape) == tuple(value.shape), (path, old.shape, value.shape)
    node[path[-1]] = value.astype(np.float32)


def _map_convbn(sd, prefix_conv, prefix_bn, params, path, stats, spath):
    _assign(params, path + ("conv", "kernel"), _torch_conv_to_flax(sd[prefix_conv + ".weight"]))
    _assign(params, path + ("bn", "BatchNorm_0", "scale"), sd[prefix_bn + ".weight"])
    _assign(params, path + ("bn", "BatchNorm_0", "bias"), sd[prefix_bn + ".bias"])
    _assign(stats, spath + ("bn", "BatchNorm_0", "mean"), sd[prefix_bn + ".running_mean"])
    _assign(stats, spath + ("bn", "BatchNorm_0", "var"), sd[prefix_bn + ".running_var"])


def _map_basic_block(sd, tprefix, params, path, stats):
    _map_convbn(sd, f"{tprefix}.conv1", f"{tprefix}.bn1", params, path + ("conv1",), stats, path + ("conv1",))
    _map_convbn(sd, f"{tprefix}.conv2", f"{tprefix}.bn2", params, path + ("conv2",), stats, path + ("conv2",))


def _map_tree(sd, tprefix, levels, params, path, stats):
    """Recursively map a reference Tree module's weights."""
    if levels == 1:
        _map_basic_block(sd, f"{tprefix}.tree1", params, path + ("tree1",), stats)
        _map_basic_block(sd, f"{tprefix}.tree2", params, path + ("tree2",), stats)
        # root
        _assign(params, path + ("root", "conv", "kernel"), _torch_conv_to_flax(sd[f"{tprefix}.root.conv.weight"]))
        _assign(params, path + ("root", "bn", "BatchNorm_0", "scale"), sd[f"{tprefix}.root.bn.weight"])
        _assign(params, path + ("root", "bn", "BatchNorm_0", "bias"), sd[f"{tprefix}.root.bn.bias"])
        _assign(stats, path + ("root", "bn", "BatchNorm_0", "mean"), sd[f"{tprefix}.root.bn.running_mean"])
        _assign(stats, path + ("root", "bn", "BatchNorm_0", "var"), sd[f"{tprefix}.root.bn.running_var"])
    else:
        _map_tree(sd, f"{tprefix}.tree1", levels - 1, params, path + ("tree1",), stats)
        _map_tree(sd, f"{tprefix}.tree2", levels - 1, params, path + ("tree2",), stats)
    if f"{tprefix}.project.0.weight" in sd:
        _assign(params, path + ("project_conv", "kernel"), _torch_conv_to_flax(sd[f"{tprefix}.project.0.weight"]))
        _assign(params, path + ("project_bn", "BatchNorm_0", "scale"), sd[f"{tprefix}.project.1.weight"])
        _assign(params, path + ("project_bn", "BatchNorm_0", "bias"), sd[f"{tprefix}.project.1.bias"])
        _assign(stats, path + ("project_bn", "BatchNorm_0", "mean"), sd[f"{tprefix}.project.1.running_mean"])
        _assign(stats, path + ("project_bn", "BatchNorm_0", "var"), sd[f"{tprefix}.project.1.running_var"])


def import_torch_dla34(state_dict: Dict[str, np.ndarray], variables: Dict, levels=(1, 1, 1, 2, 2, 1)):
    """Load a torch DLA-34 state dict (ImageNet pretrain,
    dla_dcn.py:344-358) into the flax DLASeg 'base' subtree. Returns new
    (params, batch_stats) dicts."""
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(flax.core, "unfreeze") else dict(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"]) if hasattr(flax.core, "unfreeze") else dict(variables["batch_stats"])
    params = jax.tree.map(np.array, params)
    stats = jax.tree.map(np.array, stats)

    base_p = params["backbone"]["base"]
    base_s = stats["backbone"]["base"]
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    _map_convbn(sd, "base_layer.0", "base_layer.1", base_p, ("base_layer",), base_s, ("base_layer",))
    # level0/level1 conv stages
    for li in (0, 1):
        for ci in range(levels[li]):
            t = 3 * ci
            _map_convbn(
                sd, f"level{li}.{t}", f"level{li}.{t+1}",
                base_p, (f"level{li}_{ci}",), base_s, (f"level{li}_{ci}",),
            )
    for li in (2, 3, 4, 5):
        _map_tree(sd, f"level{li}", levels[li], base_p, (f"level{li}",), base_s)

    return params, stats
