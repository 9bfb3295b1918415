"""DLA-34 backbone with DLAUp/IDAUp deformable decoder (flax, NHWC).

Architecture parity with ``DGDE/model/backbone/dla_dcn.py``:
* DLA([1,1,1,2,2,1], [16,32,64,128,256,512], BasicBlock) — dla_dcn.py:361-368
* hierarchical Tree/Root aggregation — :186-260
* DLAUp + IDAUp decoder with DCN proj/node convs and fixed-bilinear
  depthwise transpose-conv upsampling — :398-465
* output: stride-4 feature map with 64 channels (DLASeg :31-59)

The reference mutates a python list in-place inside IDAUp.forward
(:432-438); here the same dataflow is written functionally.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import BatchNorm, BilinearUp, ConvBnAct, DCN


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = True):
        if residual is None:
            residual = x
        out = ConvBnAct(
            self.planes, 3, self.stride, self.dilation,
            axis_name=self.axis_name, dtype=self.dtype, name="conv1",
        )(x, train)
        out = ConvBnAct(
            self.planes, 3, 1, self.dilation, act=None,
            axis_name=self.axis_name, dtype=self.dtype, name="conv2",
        )(out, train)
        return nn.relu(out + residual)


class Root(nn.Module):
    features: int
    residual: bool
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *children, train: bool = True):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    dilation: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, children=None, train: bool = True):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels

        children = [] if children is None else list(children)
        bottom = nn.max_pool(x, (self.stride, self.stride), (self.stride, self.stride)) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            residual = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="project_bn")(
                nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(bottom),
                train,
            )
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = BasicBlock(
                self.out_channels, self.stride, self.dilation,
                axis_name=self.axis_name, dtype=self.dtype, name="tree1",
            )(x, residual, train=train)
            x2 = BasicBlock(
                self.out_channels, 1, self.dilation,
                axis_name=self.axis_name, dtype=self.dtype, name="tree2",
            )(x1, train=train)
            out = Root(
                self.out_channels, self.root_residual,
                axis_name=self.axis_name, dtype=self.dtype, name="root",
            )(x2, x1, *children, train=train)
        else:
            x1 = Tree(
                self.levels - 1, self.in_channels, self.out_channels, self.stride,
                root_dim=0, root_residual=self.root_residual, dilation=self.dilation,
                axis_name=self.axis_name, dtype=self.dtype, name="tree1",
            )(x, residual, train=train)
            children.append(x1)
            out = Tree(
                self.levels - 1, self.out_channels, self.out_channels,
                root_dim=root_dim + self.out_channels,
                root_residual=self.root_residual, dilation=self.dilation,
                axis_name=self.axis_name, dtype=self.dtype, name="tree2",
            )(x1, children=children, train=train)
        return out


class DLA(nn.Module):
    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True) -> List[jnp.ndarray]:
        ch = self.channels
        x = ConvBnAct(ch[0], 7, 1, axis_name=self.axis_name, dtype=self.dtype, name="base_layer")(x, train)
        outs = []
        # level0/level1: plain conv stages (reference _make_conv_level :313-323)
        y = x
        for i in range(self.levels[0]):
            y = ConvBnAct(ch[0], 3, 1, axis_name=self.axis_name, dtype=self.dtype, name=f"level0_{i}")(y, train)
        outs.append(y)
        for i in range(self.levels[1]):
            y = ConvBnAct(
                ch[1], 3, 2 if i == 0 else 1, axis_name=self.axis_name, dtype=self.dtype, name=f"level1_{i}"
            )(y, train)
        outs.append(y)
        y = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False,
                 axis_name=self.axis_name, dtype=self.dtype, name="level2")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[3], ch[2], ch[3], 2, level_root=True,
                 axis_name=self.axis_name, dtype=self.dtype, name="level3")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[4], ch[3], ch[4], 2, level_root=True,
                 axis_name=self.axis_name, dtype=self.dtype, name="level4")(y, train=train)
        outs.append(y)
        y = Tree(self.levels[5], ch[4], ch[5], 2, level_root=True,
                 axis_name=self.axis_name, dtype=self.dtype, name="level5")(y, train=train)
        outs.append(y)
        return outs


class DeformConvBlock(nn.Module):
    """DCN + BN + ReLU (reference DeformConv, dla_dcn.py:398-410)."""

    features: int
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    dcn_impl: str = "auto"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = DCN(
            self.features, impl=self.dcn_impl, window_radius=self.dcn_radius,
            dtype=self.dtype, name="conv",
        )(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="actf_bn")(x, train)
        return nn.relu(x)


class IDAUp(nn.Module):
    """Iterative deep aggregation: project each finer level with a DCN,
    bilinear-upsample, and merge with a DCN node (reference dla_dcn.py:412-438).
    """

    out_channels: int
    up_factors: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    dcn_impl: str = "auto"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int, train: bool = True):
        layers = list(layers)
        for i in range(startp + 1, endp):
            k = i - startp
            proj = DeformConvBlock(
                self.out_channels, self.axis_name, self.dtype,
                self.dcn_impl, self.dcn_radius, name=f"proj_{k}",
            )
            node = DeformConvBlock(
                self.out_channels, self.axis_name, self.dtype,
                self.dcn_impl, self.dcn_radius, name=f"node_{k}",
            )
            up = BilinearUp(int(self.up_factors[k]), dtype=self.dtype, name=f"up_{k}")
            layers[i] = up(proj(layers[i], train=train))
            layers[i] = node(layers[i] + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Iteratively fuse levels coarse-to-fine (reference dla_dcn.py:442-465)."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    dcn_impl: str = "auto"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = True) -> List[jnp.ndarray]:
        # `layers` here is already sliced to [first_level:], so the loop runs
        # len(layers)-1 times (the reference passes the full 6-level list and
        # loops len-startp-1 times — same count).
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)
        out = [layers[-1]]
        for i in range(len(layers) - 1):
            j = -i - 2
            ida = IDAUp(
                channels[j],
                (scales[j:] // scales[j]).tolist(),
                axis_name=self.axis_name,
                dtype=self.dtype,
                dcn_impl=self.dcn_impl,
                dcn_radius=self.dcn_radius,
                name=f"ida_{i}",
            )
            layers = ida(layers, len(layers) - i - 2, len(layers), train=train)
            out.insert(0, layers[-1])
            scales[j + 1 :] = scales[j]
        return out


class DLASeg(nn.Module):
    """Full backbone: DLA trunk -> DLAUp -> final IDAUp; emits the stride-4
    64-channel feature map (reference DLASeg, dla_dcn.py:31-59)."""

    levels: Sequence[int] = (1, 1, 1, 2, 2, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512)
    down_ratio: int = 4
    last_level: int = 5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    dcn_impl: str = "auto"
    dcn_radius: int = 3

    @nn.compact
    def __call__(self, x, train: bool = True) -> jnp.ndarray:
        first_level = int(np.log2(self.down_ratio))
        feats = DLA(self.levels, self.channels, self.axis_name, self.dtype, name="base")(x, train=train)
        ch = list(self.channels[first_level:])
        scales = [2**i for i in range(len(ch))]
        outs = DLAUp(
            first_level, ch, scales, self.axis_name, self.dtype,
            self.dcn_impl, self.dcn_radius, name="dla_up",
        )(feats[first_level:], train=train)
        y = [outs[i] for i in range(self.last_level - first_level)]
        y = IDAUp(
            self.channels[first_level],
            [2**i for i in range(self.last_level - first_level)],
            self.axis_name,
            self.dtype,
            self.dcn_impl,
            self.dcn_radius,
            name="ida_up",
        )(y, 0, len(y), train=train)
        return y[-1]

    @property
    def out_channels(self) -> int:
        return self.channels[int(np.log2(self.down_ratio))]


# registry dispatch (reference registers its predictor the same way,
# detector_predictor.py:18; backbone naming follows MODEL.BACKBONE.CONV_BODY)
from ..utils.registry import BACKBONES  # noqa: E402


@BACKBONES.register("dla34")
def build_dla34(cfg, axis_name=None, dtype=jnp.float32, name="backbone"):
    bb = cfg.model.backbone
    return DLASeg(
        levels=bb.levels,
        channels=bb.channels,
        down_ratio=bb.down_ratio,
        last_level=bb.last_level,
        axis_name=axis_name,
        dtype=dtype,
        dcn_impl=bb.dcn_impl,
        dcn_radius=bb.dcn_radius,
        name=name,
    )
