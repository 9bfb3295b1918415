"""DGDE detector shell: backbone -> heads.

Reference: ``KeypointDetector`` (DGDE/model/detector.py:12-45). Training
loss computation and inference post-processing are pure functions in
``dcd_tpu.engine`` (the reference routes them through the head module; here
the flax module stays a pure feature->prediction map, which is what jit,
vmap and the sharded train step want).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .dla import DLASeg
from .predictor import Predictor


class KeypointDetector(nn.Module):
    cfg: Config
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3)
        edge_indices: Optional[jnp.ndarray] = None,
        edge_len: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        bb = self.cfg.model.backbone
        features = DLASeg(
            levels=bb.levels,
            channels=bb.channels,
            down_ratio=bb.down_ratio,
            last_level=bb.last_level,
            axis_name=self.axis_name,
            dtype=self.dtype,
            dcn_impl=getattr(bb, "dcn_impl", "auto"),
            dcn_radius=getattr(bb, "dcn_radius", 3),
            name="backbone",
            # train passed positionally: remat's static_argnums only covers
            # positional args
        )(images.astype(self.dtype), train)
        return Predictor(self.cfg, axis_name=self.axis_name, dtype=self.dtype, name="heads")(
            features, edge_indices, edge_len, train=train
        )
