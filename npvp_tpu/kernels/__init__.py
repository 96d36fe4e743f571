"""Pallas TPU kernels — currently empty, deliberately.

Two generations of a fused MlpDWBN conv-FFN kernel (the model's hottest
region, ~40% of predictor device time) were built and benchmarked against
the XLA composition of the same math (see git history for
npvp_tpu/kernels/mlp_dwbn.py and the A/B harness tools/ab_ffn.py):

- round 1 (F=2 frame tiles, fp32 intermediates, pre-tiled LN affines):
  lost end-to-end, 205 vs 179 ms/batch;
- round 2 redesign (F=8 tiles → M=512 matmul rows, bf16 intermediates,
  compact per-frame LN affines): numerically exact (bf16 max diff 0.0 vs
  XLA) but still lost at the region level — median xla/pallas = 0.87 over
  40 interleaved A/B pairs at flagship shapes on v5e.

At this model's shapes (8×8 feature maps, 512/2048 channels, 16-token
attention windows) XLA's fusion + full-batch (M=40960) matmuls are the
practical floor: a fused kernel must shrink M to tile frames (starving the
MXU) or waste FLOPs on block-diagonal attention, and the elementwise chains
XLA already fuses leave little HBM traffic to save. Per the project rule —
no decorative kernels — the losing kernel was deleted with its measurements
recorded here and in DESIGN.md. The hot-path wins that DID land are
XLA-level exact-math restructurings (affine-fused attention, fused QK
projections, sub-pixel ConvTranspose option): see npvp_tpu/nn/vidhrformer.py.
"""
