"""Sub-pixel ConvTranspose decomposition ≡ flax nn.ConvTranspose."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from npvp_tpu.nn.upsample import subpixel_conv_transpose_3x3_s2


def test_subpixel_equals_conv_transpose():
    for (H, W, I, O) in ((8, 8, 16, 8), (5, 7, 4, 6)):
        ct = nn.ConvTranspose(O, (3, 3), strides=(2, 2),
                              padding=((1, 2), (1, 2)), use_bias=False,
                              transpose_kernel=True)
        x = jax.random.normal(jax.random.key(0), (2, H, W, I))
        v = ct.init(jax.random.key(1), x)
        ref = np.asarray(ct.apply(v, x))
        got = np.asarray(subpixel_conv_transpose_3x3_s2(
            x, v["params"]["kernel"]))
        assert got.shape == ref.shape == (2, 2 * H, 2 * W, O)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_s2d_head_equals_direct_conv():
    """ResnetDecoder.s2d_head (stride-4 sub-pixel form of the 7x7 output
    conv) is numerically equal to the direct conv over one parameter set."""
    from npvp_tpu.nn.resnet_ae import ResnetDecoder

    feats = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 2, 8, 8, 64), np.float32)) * 0.1
    dec = ResnetDecoder(out_channels=1, ngf=8, n_downsampling=3)
    variables = dec.init(jax.random.key(0), feats)
    a = dec.apply(variables, feats, train=False)
    b = ResnetDecoder(out_channels=1, ngf=8, n_downsampling=3,
                      s2d_head=True).apply(variables, feats, train=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
