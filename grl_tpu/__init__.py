"""grl_tpu — a TPU-native video person re-identification framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the GRL
reference (flysnowtiger/GRL: "Watching You: Global-guided Reciprocal
Learning for Video-based Person Re-identification", CVPR 2021):

- ResNet-50 backbone (last-stride-1) + GCE spatial correlation split +
  TRL bidirectional temporal scan, expressed as pure functional JAX
  (NHWC layouts, `lax.scan`, Pallas kernels on the hot paths).
- OIM / pairwise-BCE / batch-hard-triplet training losses with explicit
  functional state (no gradient-time side effects).
- Dense-clip evaluation with sharded cosine distance matmuls and
  vectorized CMC/mAP.
- SPMD scale-out over a `jax.sharding.Mesh` (data-parallel training,
  gallery-sharded evaluation).
"""

__version__ = "0.1.0"
