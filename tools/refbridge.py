"""Runtime bridge to the *reference* DCD implementation at /root/reference.

Round-3 VERDICT item #1: produce a real numerical parity check of the
rebuilt dcd_tpu detector against the reference torch model. The reference
ships a complete CPU implementation of its DCNv2 extension
(DGDE/model/backbone/DCNv2/DCN/src/cpu/*.cpp, build glue setup.py:23-27);
this module

1. copies those sources to a scratch dir, patches the removed TH-era APIs
   (``#include <TH/TH.h>``, ``THArgCheck``, ``Tensor::type()``) for the
   torch that ships in this image, and JIT-builds the ``_ext`` module with
   ``torch.utils.cpp_extension.load``;
2. installs import stubs for packages the reference imports but never uses
   on the CPU inference path (cv2, shapely, torchvision, yacs, pycocotools,
   iopath, numba) — yacs gets a functional CfgNode shim since the config
   tree is genuinely used;
3. imports the reference ``KeypointDetector`` with the shipped
   ``runs/DGDE.yaml`` experiment config.

Nothing here is copied into the repo: the reference sources are read (and
patched) at runtime from /root/reference into /tmp. The parity driver
built on top is ``tools/parity_vs_reference.py``.
"""

from __future__ import annotations

import copy
import os
import re
import shutil
import sys
import types

REF_ROOT = "/root/reference/DGDE"
SCRATCH = os.environ.get("DCD_REFBRIDGE_SCRATCH", "/tmp/dcd_refbridge")


# ---------------------------------------------------------------------------
# 1. Build the reference CPU DCNv2 extension against modern torch
# ---------------------------------------------------------------------------

_PATCHES = [
    # TH/TH.h was removed from torch; nothing in the CPU path needs it.
    (re.compile(r'#include <TH/TH\.h>'), ""),
    # THArgCheck(cond, argnum, msg) -> TORCH_CHECK(cond, msg)
    (re.compile(r'THArgCheck\((.+?), *\d+, *'), r"TORCH_CHECK(\1, "),
    # Tensor::type() (DeprecatedTypeProperties) removed:
    (re.compile(r'\.type\(\)\.is_cuda\(\)'), ".is_cuda()"),
    (re.compile(r'AT_DISPATCH_FLOATING_TYPES\((\w+)\.type\(\)'),
     r"AT_DISPATCH_FLOATING_TYPES(\1.scalar_type()"),
]


def build_ext(verbose: bool = False):
    """Patch + JIT-compile the reference CPU DCNv2 sources; returns the
    imported ``_ext`` module (also registered in sys.modules['_ext'])."""
    if "_ext" in sys.modules:
        return sys.modules["_ext"]

    src_ref = os.path.join(REF_ROOT, "model/backbone/DCNv2/DCN/src")
    src_dir = os.path.join(SCRATCH, "src")
    build_dir = os.path.join(SCRATCH, "build")
    os.makedirs(build_dir, exist_ok=True)
    if not os.path.exists(os.path.join(src_dir, "vision.cpp")):
        os.makedirs(os.path.join(src_dir, "cpu"), exist_ok=True)
        for rel in [
            "vision.cpp", "dcn_v2.h",
            "cpu/vision.h", "cpu/dcn_v2_cpu.cpp", "cpu/dcn_v2_im2col_cpu.cpp",
            "cpu/dcn_v2_im2col_cpu.h", "cpu/dcn_v2_psroi_pooling_cpu.cpp",
        ]:
            with open(os.path.join(src_ref, rel)) as f:
                text = f.read()
            for pat, repl in _PATCHES:
                text = pat.sub(repl, text)
            with open(os.path.join(src_dir, rel), "w") as f:
                f.write(text)

    from torch.utils.cpp_extension import load

    mod = load(
        name="_ext",
        sources=[
            os.path.join(src_dir, "vision.cpp"),
            os.path.join(src_dir, "cpu/dcn_v2_cpu.cpp"),
            os.path.join(src_dir, "cpu/dcn_v2_im2col_cpu.cpp"),
            os.path.join(src_dir, "cpu/dcn_v2_psroi_pooling_cpu.cpp"),
        ],
        extra_include_paths=[src_dir],
        build_directory=build_dir,
        verbose=verbose,
    )
    sys.modules["_ext"] = mod
    return mod


# ---------------------------------------------------------------------------
# 2. Import stubs
# ---------------------------------------------------------------------------


class _CfgNode(dict):
    """Minimal functional stand-in for yacs.config.CfgNode: attribute
    access over a nested dict, YAML merge, freeze no-ops."""

    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = _CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def freeze(self):
        pass

    def defrost(self):
        pass

    def merge_from_other_cfg(self, other):
        _merge(other, self)

    def merge_from_file(self, path):
        import yaml

        with open(path) as f:
            _merge(yaml.safe_load(f), self)

    def merge_from_list(self, opts):
        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            parts = k.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = v


def _merge(other, into):
    for k, v in (other or {}).items():
        if isinstance(v, dict) and isinstance(into.get(k), dict):
            _merge(v, into[k])
        else:
            into[k] = _CfgNode(v) if isinstance(v, dict) else v


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)

    def _missing(attr, _name=name):
        if attr.startswith("__") and attr.endswith("__"):
            # import machinery probes (__path__, __all__, ...) must see a
            # normal missing attribute, not a hard failure
            raise AttributeError(attr)
        raise RuntimeError(
            f"stubbed module {_name!r} attribute {attr!r} was actually used; "
            "the parity path was expected to never call it"
        )

    mod.__getattr__ = _missing  # PEP 562
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Register import-time stand-ins for packages absent from this image
    that the reference imports but does not exercise on the CPU forward
    path (plus the functional yacs shim)."""
    if "yacs.config" in sys.modules and not hasattr(
        sys.modules["yacs.config"], "__dcd_stub__"
    ):
        return  # real yacs present (not in this image, but be safe)
    yacs = _stub_module("yacs")
    yc = _stub_module("yacs.config", CfgNode=_CfgNode)
    yc.__dcd_stub__ = True
    yacs.config = yc

    _stub_module(
        "cv2",
        setNumThreads=lambda *a: None,
        IMREAD_UNCHANGED=-1,
        LINE_AA=16,
    )

    class _Polygon:  # noqa: D401 — placeholder; never constructed on this path
        def __init__(self, *a, **k):
            raise RuntimeError("shapely stub Polygon constructed")

    shp = _stub_module("shapely")
    shp.geometry = _stub_module("shapely.geometry", Polygon=_Polygon)

    tv = _stub_module("torchvision")
    ops = _stub_module("torchvision.ops")
    roi = _stub_module("torchvision.ops.roi_align")
    tv.ops = ops
    ops.roi_align = roi
    tvt = _stub_module("torchvision.transforms")
    tvt.functional = _stub_module("torchvision.transforms.functional")
    tv.transforms = tvt

    def _identity_jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    numba = _stub_module("numba", jit=_identity_jit, njit=_identity_jit)
    numba.cuda = _stub_module(
        "numba.cuda", jit=_identity_jit, is_available=lambda: False
    )

    pct = _stub_module("pycocotools")
    pct.mask = _stub_module("pycocotools.mask")
    iop = _stub_module("iopath")
    iop.common = _stub_module("iopath.common")

    class _PathManager:
        pass

    iop.common.file_io = _stub_module(
        "iopath.common.file_io", PathManager=_PathManager
    )
    _stub_module("tqdm", tqdm=lambda x, **k: x)

    ski = _stub_module("skimage")
    ski.transform = _stub_module("skimage.transform")


# ---------------------------------------------------------------------------
# 3. Reference model loading
# ---------------------------------------------------------------------------


def ref_config(overrides: dict | None = None):
    """Import the reference yacs config + shipped runs/DGDE.yaml.

    Must be called after install_stubs(). Returns the reference cfg
    singleton (so repeat calls mutate the same object — parity runs use
    one config per process)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from config import cfg  # noqa: PLC0415 — reference package

    cfg.merge_from_file(os.path.join(REF_ROOT, "runs/DGDE.yaml"))
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.PRETRAIN = False  # no network egress; random weights
    cfg.MODEL.USE_SYNC_BN = False
    cfg.MODEL.FP16 = False
    for k, v in (overrides or {}).items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def load_reference_detector(overrides: dict | None = None, seed: int = 0):
    """Build the reference KeypointDetector (random init, eval mode) on
    CPU. Returns (net, cfg)."""
    import torch

    build_ext()
    install_stubs()
    cfg = ref_config(overrides)
    torch.manual_seed(seed)
    from model.detector import KeypointDetector  # noqa: PLC0415 — reference

    net = KeypointDetector(cfg)
    net.eval()
    return net, cfg


def randomize_for_parity(net, seed: int = 1, offset_std: float = 0.03,
                         offset_bias: float = 0.25):
    """Make the random reference model a *strong* parity oracle:

    - the reference zero-inits every DCN offset/mask conv
      (DCN.init_offset, dcn_v2.py:114-116) so a fresh model has offset==0
      and mask==0.5 — that never exercises bilinear sampling. Re-randomize
      those convs so sampling points land at fractional, multi-pixel
      displacements.
    - BN running stats are (0,1) at init; randomize them so eval-mode
      normalization actually tests the running-stat import path.
    """
    import torch

    g = torch.Generator().manual_seed(seed)
    for name, m in net.named_modules():
        if hasattr(m, "conv_offset_mask"):
            w = m.conv_offset_mask
            torch.nn.init.normal_(w.weight, std=offset_std, generator=g)
            torch.nn.init.uniform_(w.bias, -offset_bias, offset_bias, generator=g)
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net


def clear_scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
