"""Detection heads: class heatmap + grouped regression heads + edge fusion.

Parity with ``DGDE/model/head/detector_predictor.py:19-207``:
* class head: 3x3 conv + BN + act -> 1x1 conv with focal bias init
  ``-log(1/p - 1)`` (:60-66)
* one 3x3 feature layer per regression group, then a 1x1 conv per key
  (:80-102); uncertainty heads get small xavier init (:93-94)
* edge fusion (:172-196): features are gathered along the image-boundary
  ring, passed through 1D convs, and added back into the heatmap and
  3d-offset channels at the boundary pixels. The reference uses
  ``F.grid_sample`` at integer pixel coords with align_corners=True, which
  is exactly a gather — implemented here as a gather + masked scatter-add.

Outputs: {'cls': clamped-sigmoid heatmap, 'reg': concatenated regression
channels} in NHWC.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config
from ..ops.nms import sigmoid_hm
from .layers import DCN, BatchNorm, ConvBnAct


class Converter_key2channel:
    """Key -> channel-slice lookup into the concatenated regression map
    (reference model/layers/utils.py:22-37)."""

    def __init__(self, keys, channels):
        self.keys = [k for group in keys for k in group]
        self.channels = [c for group in channels for c in group]

    def __call__(self, key: str) -> slice:
        index = self.keys.index(key)
        s = sum(self.channels[:index])
        return slice(s, s + self.channels[index], 1)


class EdgeFusion(nn.Module):
    """1D conv tower over the boundary ring (reference :113-125)."""

    head_conv: int
    out_channels: int
    kernel_size: int = 3
    use_bn: bool = True
    use_relu: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # x: (B, L, C) features along the ring; replicate padding
        pad = self.kernel_size // 2
        x = jnp.concatenate(
            [jnp.repeat(x[:, :1], pad, axis=1), x, jnp.repeat(x[:, -1:], pad, axis=1)], axis=1
        )
        x = nn.Conv(
            self.head_conv, (self.kernel_size,), padding="VALID", dtype=self.dtype, name="conv1"
        )(x)
        if self.use_bn:
            x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn")(x, train)
        if self.use_relu:
            x = nn.relu(x)
        return nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="conv2")(x)


class Predictor(nn.Module):
    cfg: Config
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,  # (B, H, W, C)
        edge_indices: Optional[jnp.ndarray] = None,  # (B, L, 2) int
        edge_len: Optional[jnp.ndarray] = None,  # (B,) int
        train: bool = True,
        lazy_topk: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        head = cfg.model.head
        classes = cfg.datasets.max_classes_num
        head_conv = head.num_channel
        B, H, W, C = features.shape

        act = nn.relu if head.active_func == "relu" else nn.leaky_relu

        # ----- optional deeper head (reference :134-151): conv+BN+act then
        # a DCN+BN+act stem in front of the cls/reg branches -----
        if getattr(head, "deeper_head", False):

            def head_pre(x, name):
                x = ConvBnAct(
                    head_conv, 3, act=act, axis_name=self.axis_name, dtype=self.dtype,
                    name=f"{name}_conv",
                )(x, train)
                x = DCN(head_conv, dtype=self.dtype, name=f"{name}_dcn")(x)
                x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name=f"{name}_bn")(x, train)
                return act(x)

            features_cls_in = head_pre(features, "cls_head_pre")
            features_reg_in = head_pre(features, "reg_head_pre")
        else:
            features_cls_in = features_reg_in = features

        # ----- class head -----
        feature_cls = ConvBnAct(
            head_conv, 3, act=act, axis_name=self.axis_name, dtype=self.dtype, name="class_feat"
        )(features_cls_in, train)
        bias_init_val = -float(np.log(1.0 / head.init_p - 1.0))
        output_cls = nn.Conv(
            classes,
            (1, 1),
            use_bias=True,
            bias_init=nn.initializers.constant(bias_init_val),
            dtype=self.dtype,
            name="class_out",
        )(feature_cls)

        # ----- regression heads -----
        # modules are constructed ONCE so the dense and lazy paths share
        # the exact same parameters (flax: two constructions of one name
        # in a single trace would collide)
        reg_feat_mods = []
        reg_out_mods = []  # (gi, key, 1x1-conv module) in global key order
        for gi, group in enumerate(head.regression_heads):
            reg_feat_mods.append(
                ConvBnAct(
                    head_conv, 3, act=act, axis_name=self.axis_name,
                    dtype=self.dtype, name=f"reg_feat_{gi}",
                )
            )
            for ki, key in enumerate(group):
                ch = head.regression_channels[gi][ki]
                kernel_init = nn.initializers.lecun_normal()
                if "uncertainty" in key and head.uncertainty_init:
                    kernel_init = nn.initializers.variance_scaling(0.0001, "fan_avg", "normal")
                reg_out_mods.append(
                    (
                        gi,
                        key,
                        nn.Conv(
                            ch, (1, 1), use_bias=True, kernel_init=kernel_init,
                            dtype=self.dtype, name=f"reg_out_{gi}_{key}",
                        ),
                    )
                )
        do_fusion = head.enable_edge_fusion and edge_indices is not None
        edge_fusion_mods = None
        if do_fusion:
            edge_fusion_mods = (
                EdgeFusion(
                    head_conv, classes, head.edge_fusion_kernel_size,
                    use_bn=(head.edge_fusion_norm == "BN"), use_relu=head.edge_fusion_relu,
                    axis_name=self.axis_name, dtype=self.dtype, name="trunc_heatmap_conv",
                ),
                EdgeFusion(
                    head_conv, 2, head.edge_fusion_kernel_size,
                    use_bn=(head.edge_fusion_norm == "BN"), use_relu=head.edge_fusion_relu,
                    axis_name=self.axis_name, dtype=self.dtype, name="trunc_offset_conv",
                ),
            )
            L = edge_indices.shape[1]
            flat_idx = (edge_indices[..., 1] * W + edge_indices[..., 0]).astype(jnp.int32)  # (B, L)
            edge_valid = jnp.arange(L)[None, :] < edge_len[:, None]  # (B, L)

            def edge_gather(fm):
                return jnp.take_along_axis(
                    fm.reshape(B, H * W, -1), flat_idx[:, :, None], axis=1
                )

            def edge_scatter_add(fm, upd):
                def one(fm_b, idx_b, upd_b):
                    flat = fm_b.reshape(H * W, -1)
                    return flat.at[idx_b].add(upd_b).reshape(fm_b.shape)

                return jax.vmap(one)(fm, flat_idx, upd)

        if not lazy_topk:
            output_regs = []
            offset_reg_feature = None
            offset_group_start = None
            chan_cursor = 0
            group_feats = {}
            for gi, key, out_mod in reg_out_mods:
                if gi not in group_feats:
                    group_feats[gi] = reg_feat_mods[gi](features_reg_in, train)
                out = out_mod(group_feats[gi])
                if key == "3d_offset":
                    offset_reg_feature = group_feats[gi]
                    offset_group_start = chan_cursor
                output_regs.append(out)
                chan_cursor += out.shape[-1]

            output_reg = jnp.concatenate(output_regs, axis=-1)

            # ----- edge fusion (reference :172-196) -----
            if do_fusion:
                assert offset_reg_feature is not None
                edge_cls_out = edge_fusion_mods[0](edge_gather(feature_cls), train)
                edge_off_out = edge_fusion_mods[1](edge_gather(offset_reg_feature), train)
                vmask = edge_valid.astype(output_cls.dtype)[:, :, None]
                output_cls = edge_scatter_add(output_cls, edge_cls_out * vmask)
                off_sl = slice(offset_group_start, offset_group_start + 2)
                fused_off = edge_scatter_add(output_reg[..., off_sl], edge_off_out * vmask)
                output_reg = jnp.concatenate(
                    [output_reg[..., : off_sl.start], fused_off, output_reg[..., off_sl.stop :]],
                    axis=-1,
                )

            return {
                "cls": sigmoid_hm(output_cls).astype(jnp.float32),
                # the reg map stays in the model dtype: consumers gather a
                # few POI rows and cast those to fp32 (casting the full
                # (B, Ho*Wo, 415) map here measured ~10 ms/step at batch
                # 64, and XLA hoists the convert above the POI gather)
                "reg": output_reg,
            }

        # ----- lazy top-K inference path (round 5) -----
        # Computing every regression head densely only to gather K=50 POI
        # rows measured ~55 ms/step at batch 64 (10 dense 3x3x256 towers +
        # 1x1 convs incl. the 146/219-channel extra-kpt maps + the full-map
        # concat). Here only the class branch and the 3d_offset group (the
        # edge-fusion target) stay dense; every other group is evaluated on
        # the 3x3 neighborhoods of the top-K heatmap peaks. Numerically
        # identical to the dense path up to matmul association (CI-checked
        # against it in tests/test_predictor_details.py).
        assert not train, "lazy_topk is an inference-only path"
        from ..ops.nms import nms_hm, select_topk

        K = cfg.test.detections_per_img

        # dense 3d_offset group + edge fusion into it
        offset_gi = next(
            gi for gi, g in enumerate(head.regression_heads) if "3d_offset" in g
        )
        offset_feat = reg_feat_mods[offset_gi](features_reg_in, False)
        dense_outs = {}
        for gi, key, out_mod in reg_out_mods:
            if gi == offset_gi:
                dense_outs[key] = out_mod(offset_feat)
        if do_fusion:
            edge_cls_out = edge_fusion_mods[0](edge_gather(feature_cls), False)
            edge_off_out = edge_fusion_mods[1](edge_gather(offset_feat), False)
            vmask = edge_valid.astype(output_cls.dtype)[:, :, None]
            output_cls = edge_scatter_add(output_cls, edge_cls_out * vmask)
            dense_outs["3d_offset"] = edge_scatter_add(
                dense_outs["3d_offset"], edge_off_out * vmask
            )

        hm = sigmoid_hm(output_cls).astype(jnp.float32)
        scores, indexs, clses, ys, xs = select_topk(nms_hm(hm), K=K)

        # one shared (B, K, 3, 3, C) neighborhood gather of the reg input
        # (zero-padded like the dense convs' SAME padding)
        xi = xs.astype(jnp.int32)
        yi = ys.astype(jnp.int32)
        fpad = jnp.pad(features_reg_in, ((0, 0), (1, 1), (1, 1), (0, 0)))
        Wp = W + 2
        nb_idx = (
            (yi[:, :, None] + jnp.arange(3)[None, None, :]) * Wp
        )[:, :, :, None] + (xi[:, :, None] + jnp.arange(3)[None, None, :])[:, :, None, :]
        nb = jnp.take_along_axis(
            fpad.reshape(B, (H + 2) * Wp, C),
            nb_idx.reshape(B, K * 9)[:, :, None],
            axis=1,
        ).reshape(B * K, 3, 3, C)

        poi_outs = []
        lazy_feats = {}
        for gi, key, out_mod in reg_out_mods:
            if gi == offset_gi:
                poi = jnp.take_along_axis(
                    dense_outs[key].reshape(B, H * W, -1),
                    indexs[:, :, None].astype(jnp.int32), axis=1,
                )  # (B, K, ch)
            else:
                if gi not in lazy_feats:
                    # SAME conv on the 3x3 patch: the center output equals
                    # the dense conv at the POI pixel
                    lazy_feats[gi] = reg_feat_mods[gi](nb, False)[:, 1:2, 1:2, :]
                poi = out_mod(lazy_feats[gi]).reshape(B, K, -1)
            poi_outs.append(poi)

        return {
            "cls": hm,
            "reg_pois": jnp.concatenate(poi_outs, axis=-1).astype(jnp.float32),
            "scores": scores,
            "clses": clses,
            "points_xy": jnp.stack([xs, ys], axis=-1),  # (B, K, 2) float
        }


# registry dispatch (reference detector_predictor.py:18,205-207:
# @registry.PREDICTOR.register("Base_Predictor") + make_predictor lookup)
from ..utils.registry import PREDICTOR  # noqa: E402


@PREDICTOR.register("Base_Predictor")
def build_base_predictor(cfg, axis_name=None, dtype=jnp.float32, name="heads"):
    return Predictor(cfg, axis_name=axis_name, dtype=dtype, name=name)
