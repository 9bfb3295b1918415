"""dcd_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the DCD monocular-3D
detection framework (reference: BraveGroup/DCD, ECCV 2022).

Two stages, mirroring the reference pipeline:

* ``dcd_tpu.models.detector`` — DGDE, a CenterNet/MonoFlex-style keypoint
  detector with a DLA-34 + deformable-conv decoder and dense edge-pair depth
  solving (reference: ``DGDE/model/detector.py``).
* ``dcd_tpu.models.gmw`` — GMW, the Graph Matching Weighting network with a
  Sinkhorn optimal-transport declarative layer
  (reference: ``GMW/model/model.py``).

Everything under ``jit`` is static-shape and functional; distribution is a
``jax.sharding.Mesh`` with data-parallel sharding and XLA collectives instead
of the reference's NCCL/DDP.
"""

__version__ = "0.1.0"
