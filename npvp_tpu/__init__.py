"""NPVP-TPU: a TPU-native JAX/Flax framework for continuous conditional video
prediction as a Neural Process.

Re-implements the capabilities of XiYe20/NPVP ("A Unified Model for Continuous
Conditional Video Prediction", CVPRW 2023) with a TPU-first design:

- Stage 1: per-frame ResNet autoencoder (NHWC, XLA convs, cross-replica BN).
- Stage 2: NP-based predictor — VidHRFormer spatio-temporal transformer with
  local-window spatial attention, masked temporal attention and NAR decoding,
  conditioned on Fourier-feature encodings of continuous (t, h, w) coordinates.
- One trained model serves VFP / VPE / VFI / VRC / HVRC purely through
  coordinate choices (reference: models/Predictor.py:352-359 `reset_pos_coor`).

Parallelism is expressed with `jax.sharding.Mesh` + NamedSharding (data +
model axes: Megatron tensor parallelism, optional sequence-parallel
activation sharding, multi-host via jax.distributed — `npvp_tpu.core.mesh`).
The compute path is measurement-driven XLA (affine-fused attention,
bf16-traffic norms, cross-layer k/v hoisting); Pallas kernels were built,
measured slower at this model's shapes, and removed — the record lives in
`npvp_tpu.kernels` and DESIGN.md.
"""

__version__ = "0.1.0"

from npvp_tpu.core.config import Config, load_config  # noqa: F401
