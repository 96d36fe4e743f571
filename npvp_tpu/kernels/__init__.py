from npvp_tpu.kernels.mlp_dwbn import fused_mlp_dwbn
