"""nope_tpu — a TPU-native framework for novel-object pose estimation.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of NOPE
("Novel Object Pose Estimation from a Single Image", arXiv 2303.13612,
reference implementation nv-nguyen/nope).  The framework estimates the
relative 3D rotation of a never-seen object from a single query image,
given one reference image, by sweeping a pose-conditioned U-Net over an
SO(3) template grid in the latent space of a frozen VAE and matching the
query embedding against the predicted template bank.

Package layout
--------------
- ``nope_tpu.geometry``   SO(3) grids, rotation representations, camera
  transforms and the virtual-bbox perspective crop (host + device paths).
- ``nope_tpu.models``     Flax network zoo: pose-conditioned U-Nets
  (lucidrains-style / LDM cross-attention / ADM), the SD-VAE codec and
  the ResNet template encoder.
- ``nope_tpu.ops``        Pallas TPU kernels (fused template-bank
  similarity + retrieval) with pure-XLA fallbacks.
- ``nope_tpu.tasks``      The pose-conditional task model: losses,
  batched template-bank generation, retrieval and metrics.
- ``nope_tpu.data``       ShapeNet / Objaverse / BOP dataset readers and
  the multi-dataset training pipeline.
- ``nope_tpu.parallel``   Mesh / sharding helpers (data + template axes).
- ``nope_tpu.training``   Jitted train step, optimizer schedule, orbax
  checkpointing and the training loop.
- ``nope_tpu.evaluation`` Geodesic and VSD evaluation harnesses.
- ``nope_tpu.configs``    Dataclass config tree mirroring the reference's
  Hydra groups (with its breakages fixed).
"""

__version__ = "0.1.0"
