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

    def load(self, state, path: Optional[str] = None, model_only: bool = False):
        """Restore into a template TrainState (shape/dtype reference).

        ``model_only=True`` restores params + batch_stats but keeps the
        template's optimizer state and step (finetune semantics,
        reference check_point.py:98-114 pops optimizer/scheduler)."""
        path = path or self.last_checkpoint()
        if path is None:
            return state
        # a bare checkpoint name (--ckpt model_final) resolves against the
        # checkpoint dir, like the reference's DetectronCheckpointer
        if not os.path.isabs(path) and not os.path.exists(path):
            cand = os.path.join(self.save_dir, path)
            if os.path.exists(cand):
                path = cand
        path = os.path.abspath(path)
        has_bs = hasattr(state, "batch_stats")
        if model_only:
            # structure-free restore: the saved opt_state may not match the
            # finetune optimizer's tree (e.g. freeze_names changes it)
            restored = self.ckptr.restore(path)
            kwargs = dict(params=jax.tree.map(jnp.asarray, restored["params"]))
            if has_bs:
                kwargs["batch_stats"] = jax.tree.map(jnp.asarray, restored["batch_stats"])
            return state.replace(**kwargs)
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
# torch checkpoint file reading + remote-source resolution
# ---------------------------------------------------------------------------

# reference ModelCatalog (DGDE/config/paths_catalog.py:62-76)
MODEL_CATALOG = {
    "ImageNetPretrained/DLA34": "http://dl.yf.io/dla/models/imagenet/dla34-ba72cf86.pth",
}


def resolve_checkpoint_source(f: str, cache_dir: Optional[str] = None) -> str:
    """Resolve ``catalog://`` and ``http(s)://`` checkpoint sources to a
    local file path, caching downloads (reference
    DetectronCheckpointer._load_file, DGDE/utils/check_point.py:160-178 +
    utils/model_zoo.py cache_url)."""
    if f.startswith("catalog://"):
        key = f[len("catalog://"):]
        if key not in MODEL_CATALOG:
            raise KeyError(f"unknown catalog entry {key!r}; have {sorted(MODEL_CATALOG)}")
        f = MODEL_CATALOG[key]
    if f.startswith(("http://", "https://")):
        import urllib.request
        from urllib.parse import urlparse

        cache_dir = cache_dir or os.path.join(
            os.path.expanduser(os.getenv("TORCH_HOME", "~/.torch")), "models"
        )
        os.makedirs(cache_dir, exist_ok=True)
        # disambiguate same-basename URLs with a short hash of the full URL
        # (torch.hub's cache_url does the equivalent)
        import hashlib

        tag = hashlib.sha1(f.encode()).hexdigest()[:8]
        cached = os.path.join(
            cache_dir, f"{tag}-{os.path.basename(urlparse(f).path)}"
        )
        if not os.path.exists(cached):
            import shutil

            tmp = cached + ".part"
            # bounded timeout: an offline environment must fail fast, not hang
            with urllib.request.urlopen(f, timeout=15) as r, open(tmp, "wb") as out:
                shutil.copyfileobj(r, out)
            os.replace(tmp, cached)
        return cached
    return f


def _read_torch_zip(path: str) -> Dict[str, np.ndarray]:
    """Minimal reader for the torch >=1.6 zip serialization format, used
    when torch itself is unavailable. Supports plain tensor state dicts."""
    import pickle
    import zipfile

    _DTYPES = {
        "FloatStorage": np.float32, "DoubleStorage": np.float64,
        "HalfStorage": np.float16, "LongStorage": np.int64,
        "IntStorage": np.int32, "ShortStorage": np.int16,
        "CharStorage": np.int8, "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
        # bf16 has no numpy dtype: read raw uint16 bits, widen to float32
        # (bits << 16 reinterpreted) at tensor-rebuild time.
        "BFloat16Storage": "bf16",
    }

    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl_name = next(n for n in names if n.endswith("data.pkl"))
    root = pkl_name[: -len("data.pkl")]

    storages: Dict[str, Tuple[np.dtype, bytes]] = {}

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if name == "_rebuild_tensor_v2":
                return _rebuild_tensor_v2
            if name.endswith("Storage"):
                return name  # sentinel: dtype tag
            if module == "collections" and name == "OrderedDict":
                return dict
            raise pickle.UnpicklingError(f"blocked global {module}.{name}")

        def persistent_load(self, pid):
            assert pid[0] == "storage", pid
            storage_type, key = pid[1], pid[2]
            tag = storage_type if isinstance(storage_type, str) else storage_type.__name__
            return ("storage", _DTYPES[tag], key)

    def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
        _, dtype, key = storage
        raw = storages.setdefault(key, zf.read(f"{root}data/{key}"))
        if dtype == "bf16":
            bits = np.frombuffer(raw, dtype=np.uint16)
            arr = (bits.astype(np.uint32) << 16).view(np.float32)
            dtype = np.float32
        else:
            arr = np.frombuffer(raw, dtype=dtype)
        itemsize = np.dtype(dtype).itemsize
        return np.lib.stride_tricks.as_strided(
            arr[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * itemsize for s in stride),
        ).copy()

    with zf.open(pkl_name) as f:
        obj = _Unpickler(f).load()
    return obj


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-serialized checkpoint file into a flat numpy state
    dict (reference Checkpointer._load_file, check_point.py:139-140).

    Uses torch.load when torch is importable (the image ships torch-cpu);
    otherwise falls back to a dependency-light zipfile+pickle reader.
    Unwraps ``{"model": ...}`` / ``{"state_dict": ...}`` containers and
    strips DataParallel ``module.`` prefixes the way
    model_serialization.py's suffix matching tolerated them.
    """
    try:
        import torch
    except ImportError:
        loaded = _read_torch_zip(path)
        to_np = lambda v: v
    else:
        loaded = torch.load(path, map_location="cpu", weights_only=True)
        to_np = lambda v: v.detach().numpy() if hasattr(v, "detach") else v
    for key in ("model", "state_dict"):
        if isinstance(loaded, dict) and key in loaded and isinstance(loaded[key], dict):
            loaded = loaded[key]
    out = {}
    for k, v in loaded.items():
        if not hasattr(v, "shape"):
            continue
        k = k[len("module."):] if k.startswith("module.") else k
        out[k] = np.asarray(to_np(v))
    return out


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


# ---------------------------------------------------------------------------
# full DGDE detector import (backbone trunk + DCN decoder + heads)
# ---------------------------------------------------------------------------


def _torch_conv1d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv1d (Cout, Cin, k) -> flax (k, Cin, Cout)."""
    return np.transpose(w, (2, 1, 0))


def _offset_conv_perm(K: int) -> np.ndarray:
    """Output-channel permutation for importing a torch DCN offset/mask
    conv.

    The reference's DCN chunks its 3K-channel conv into (o1, o2, mask) and
    re-cats (o1, o2) — an identity on the first 2K raw channels — and the
    CUDA kernel then reads them *interleaved*: dy_t = ch[2t],
    dx_t = ch[2t+1] (dcn_v2_im2col_cuda.cu offset_h/offset_w indexing).
    The flax DCN reads block layout: dy_t = ch[t], dx_t = ch[K+t]. Both
    are equivalent reparametrizations for training, but weight import must
    permute: flax channel i takes torch channel perm[i]."""
    t = np.arange(K)
    return np.concatenate([2 * t, 2 * t + 1, 2 * K + t])


def _map_dcn(sd, tprefix, params, path):
    """torch DCN module (weight/bias/conv_offset_mask) -> flax DCN."""
    _assign(params, path + ("kernel",), _torch_conv_to_flax(sd[f"{tprefix}.weight"]))
    _assign(params, path + ("bias",), sd[f"{tprefix}.bias"])
    w_om = _torch_conv_to_flax(sd[f"{tprefix}.conv_offset_mask.weight"])
    b_om = sd[f"{tprefix}.conv_offset_mask.bias"]
    K = w_om.shape[-1] // 3
    perm = _offset_conv_perm(K)
    _assign(params, path + ("conv_offset_mask", "kernel"), w_om[..., perm])
    _assign(params, path + ("conv_offset_mask", "bias"), b_om[perm])


def _map_deform_conv(sd, tprefix, params, path, stats):
    """Reference DeformConv (DCN + actf BN, dla_dcn.py:398-410)."""
    _map_dcn(sd, f"{tprefix}.conv", params, path + ("conv",))
    _assign(params, path + ("actf_bn", "BatchNorm_0", "scale"), sd[f"{tprefix}.actf.0.weight"])
    _assign(params, path + ("actf_bn", "BatchNorm_0", "bias"), sd[f"{tprefix}.actf.0.bias"])
    _assign(stats, path + ("actf_bn", "BatchNorm_0", "mean"), sd[f"{tprefix}.actf.0.running_mean"])
    _assign(stats, path + ("actf_bn", "BatchNorm_0", "var"), sd[f"{tprefix}.actf.0.running_var"])


def import_torch_dgde(state_dict: Dict[str, np.ndarray], variables: Dict, cfg):
    """Import a full reference DGDE checkpoint (KeypointDetector:
    backbone.base trunk + backbone.dla_up/ida_up DCN decoder + heads) into
    the flax tree — the AP-parity path (reference Checkpointer.load +
    model_serialization.py:8-79). Returns (params, batch_stats).

    Layout notes: conv weights OIHW->HWIO; DCN offset convs get the
    interleave->block channel permutation (see :func:`_offset_conv_perm`);
    the fixed bilinear ``up_k`` ConvTranspose weights are not parameters
    here (BilinearUp is weightless by construction, fill_up_weights
    parity is tested in tests/test_model.py)."""
    # the reference nests the head convs one module deeper
    # (Detect_Head.predictor, detector_head.py:13); flatten that segment
    sd = {
        ("heads." + k[len("heads.predictor."):] if k.startswith("heads.predictor.") else k):
        np.asarray(v)
        for k, v in state_dict.items()
    }

    base_sd = {
        k[len("backbone.base."):]: v for k, v in sd.items()
        if k.startswith("backbone.base.")
    }
    params, stats = import_torch_dla34(
        base_sd, variables, levels=tuple(cfg.model.backbone.levels)
    )

    bb_p, bb_s = params["backbone"], stats["backbone"]
    first_level = int(np.log2(cfg.model.backbone.down_ratio))
    n_dec = len(cfg.model.backbone.channels) - first_level  # decoder levels

    # DLAUp: ida_i fuses levels [-i-2:], i.e. i+1 proj/node pairs (k>=1)
    for i in range(n_dec - 1):
        for k in range(1, i + 2):
            for kind in ("proj", "node"):
                _map_deform_conv(
                    sd, f"backbone.dla_up.ida_{i}.{kind}_{k}",
                    bb_p, ("dla_up", f"ida_{i}", f"{kind}_{k}"), bb_s,
                )

    # final IDAUp over (last_level - first_level) levels
    for k in range(1, cfg.model.backbone.last_level - first_level):
        for kind in ("proj", "node"):
            _map_deform_conv(
                sd, f"backbone.ida_up.{kind}_{k}",
                bb_p, ("ida_up", f"{kind}_{k}"), bb_s,
            )

    # ----- heads (reference detector_predictor.py:60-125) -----
    hp, hs = params["heads"], stats["heads"]
    _map_convbn(sd, "heads.class_head.0", "heads.class_head.1",
                hp, ("class_feat",), hs, ("class_feat",))
    _assign(hp, ("class_out", "kernel"), _torch_conv_to_flax(sd["heads.class_head.3.weight"]))
    _assign(hp, ("class_out", "bias"), sd["heads.class_head.3.bias"])

    groups = cfg.model.head.regression_heads
    for gi, group in enumerate(groups):
        _map_convbn(sd, f"heads.reg_features.{gi}.0", f"heads.reg_features.{gi}.1",
                    hp, (f"reg_feat_{gi}",), hs, (f"reg_feat_{gi}",))
        for ki, key in enumerate(group):
            _assign(hp, (f"reg_out_{gi}_{key}", "kernel"),
                    _torch_conv_to_flax(sd[f"heads.reg_heads.{gi}.{ki}.weight"]))
            _assign(hp, (f"reg_out_{gi}_{key}", "bias"), sd[f"heads.reg_heads.{gi}.{ki}.bias"])

    if cfg.model.head.enable_edge_fusion:
        for tname in ("trunc_heatmap_conv", "trunc_offset_conv"):
            _assign(hp, (tname, "conv1", "kernel"),
                    _torch_conv1d_to_flax(sd[f"heads.{tname}.0.weight"]))
            _assign(hp, (tname, "conv1", "bias"), sd[f"heads.{tname}.0.bias"])
            if cfg.model.head.edge_fusion_norm == "BN":
                _assign(hp, (tname, "bn", "BatchNorm_0", "scale"), sd[f"heads.{tname}.1.weight"])
                _assign(hp, (tname, "bn", "BatchNorm_0", "bias"), sd[f"heads.{tname}.1.bias"])
                _assign(hs, (tname, "bn", "BatchNorm_0", "mean"), sd[f"heads.{tname}.1.running_mean"])
                _assign(hs, (tname, "bn", "BatchNorm_0", "var"), sd[f"heads.{tname}.1.running_var"])
            _assign(hp, (tname, "conv2", "kernel"),
                    _torch_conv1d_to_flax(sd[f"heads.{tname}.3.weight"]))
            _assign(hp, (tname, "conv2", "bias"), sd[f"heads.{tname}.3.bias"])

    return params, stats


# ---------------------------------------------------------------------------
# stage-2 GMW torch checkpoint import
# ---------------------------------------------------------------------------


def import_torch_gmw(state_dict: Dict[str, np.ndarray], variables: Dict, depth: int = 12):
    """Import a reference GMW checkpoint (the released stage-2 weights /
    ``GMW/main.py:275-297`` resume format) into the flax ``models.gmw.GMW``
    param tree. Returns a new params dict.

    The towers are plain ksize-1 Conv1d stacks
    (GMW/model/yi2018cvpr/model.py:5-69 ``Net``: ``conv_in`` then
    ``conv_%d`` resnet blocks whose preconv/conv1/conv2 each are
    ``Sequential(Conv1d)`` — the gcn layers are parameterless, and
    ``perform_bn`` is hard-wired False inside ``conv1d_resnet_block``
    despite the config default). torch Conv1d (out, in, 1) maps to flax
    Dense (in, out)."""
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(flax.core, "unfreeze") else dict(variables["params"])
    params = jax.tree.map(np.array, params)
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): np.asarray(v)
        for k, v in state_dict.items()
    }

    def dense(tkey):
        w = sd[tkey + ".weight"]
        assert w.ndim == 3 and w.shape[-1] == 1, (tkey, w.shape)
        return np.transpose(w[:, :, 0], (1, 0)), sd[tkey + ".bias"]

    for tower in ("FeatureExtractor4d", "FeatureExtractor6d"):
        tp = params[tower]
        k, b = dense(f"{tower}.conv_in.0")
        _assign(tp, ("conv_in", "kernel"), k)
        _assign(tp, ("conv_in", "bias"), b)
        for i in range(depth):
            for name in ("preconv", "conv1", "conv2"):
                k, b = dense(f"{tower}.conv_{i}.{name}.0")
                _assign(tp, (f"conv_{i}", name, "kernel"), k)
                _assign(tp, (f"conv_{i}", name, "bias"), b)
    return params
