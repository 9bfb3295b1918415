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
from ..utils.registry import BACKBONES, PREDICTOR
from . import dla as _dla  # noqa: F401  (registers 'dla34')
from . import predictor as _predictor  # noqa: F401  (registers 'Base_Predictor')


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
        lazy_topk: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        # registry dispatch by cfg names (reference make_predictor,
        # detector_predictor.py:205-207; backbone by CONV_BODY)
        backbone = BACKBONES[self.cfg.model.backbone.conv_body](
            self.cfg, axis_name=self.axis_name, dtype=self.dtype, name="backbone"
        )
        heads = PREDICTOR[self.cfg.model.head.predictor](
            self.cfg, axis_name=self.axis_name, dtype=self.dtype, name="heads"
        )
        # train passed positionally: remat's static_argnums only covers
        # positional args
        features = backbone(images.astype(self.dtype), train)
        return heads(features, edge_indices, edge_len, train=train, lazy_topk=lazy_topk)
