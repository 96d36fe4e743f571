"""Pallas kernel correctness: fused kernels (interpret mode on CPU) must match
the composable XLA path bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.kernels.mlp_dwbn import fused_mlp_dwbn
from npvp_tpu.nn.vidhrformer import MlpDWBN


def test_fused_mlp_dwbn_matches_xla_path():
    B, H, W, C, Hd = 6, 8, 8, 32, 64
    module = MlpDWBN(hidden_features=Hd, out_features=C, dropout=0.0)
    x = jax.random.normal(jax.random.key(0), (1, B, H, W, C))
    variables = module.init(jax.random.key(1), x)
    expect = module.apply(variables, x)

    p = variables["params"]
    got = fused_mlp_dwbn(
        x.reshape(B, H, W, C),
        p["fc1"]["kernel"].reshape(C, Hd), p["fc1"]["bias"],
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["dw3x3"]["kernel"].reshape(3, 3, Hd), p["dw3x3"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc2"]["kernel"].reshape(Hd, C), p["fc2"]["bias"],
        p["norm3"]["scale"], p["norm3"]["bias"],
        frames_per_block=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(expect.reshape(B, H, W, C)),
                               atol=2e-3, rtol=2e-2)


def test_fused_mlp_dwbn_uneven_batch_falls_back_to_single_frame_blocks():
    B, H, W, C, Hd = 3, 4, 4, 16, 32
    module = MlpDWBN(hidden_features=Hd, out_features=C, dropout=0.0)
    x = jax.random.normal(jax.random.key(0), (1, B, H, W, C))
    variables = module.init(jax.random.key(1), x)
    expect = module.apply(variables, x)
    p = variables["params"]
    got = fused_mlp_dwbn(
        x.reshape(B, H, W, C),
        p["fc1"]["kernel"].reshape(C, Hd), p["fc1"]["bias"],
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["dw3x3"]["kernel"].reshape(3, 3, Hd), p["dw3x3"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["fc2"]["kernel"].reshape(Hd, C), p["fc2"]["bias"],
        p["norm3"]["scale"], p["norm3"]["bias"],
        frames_per_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(expect.reshape(B, H, W, C)),
                               atol=2e-3, rtol=2e-2)
