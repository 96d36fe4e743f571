"""Affine-fused attention ≡ generic pre-fused attention, on shared params.

The affine path folds pos_feat_fuse('layer','Add') through the q/k/v
projections (nn/vidhrformer.py frame_affine_stats). Equivalence must hold
at window-divisible geometries AND under center padding (H, W not multiples
of window_size), where the per-frame shift b·1ᵀW must not leak into padded
window slots (code-review round-2 finding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.nn.vidhrformer import (VidHRFormerBlockDecNAR,
                                     VidHRFormerBlockEnc)


@pytest.mark.parametrize("H,W", [(8, 8), (6, 6), (6, 10)])
def test_enc_block_affine_equals_generic(H, W):
    k = jax.random.key(0)
    N, T, C = 2, 3, 32
    x = jax.random.normal(k, (N, T, H, W, C)) * 0.5
    beta = jax.random.normal(jax.random.fold_in(k, 1), (T * H * W, C)) * 0.3
    gamma = jnp.zeros_like(beta)
    mk = lambda af: VidHRFormerBlockEnc(C, 4, dropout=0.0, drop_path=0.0,
                                        dim_feedforward=64, affine_posfuse=af)
    variables = mk(False).init(k, x, beta, gamma)
    og = mk(False).apply(variables, x, beta, gamma)
    oa = mk(True).apply(variables, x, beta, gamma)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(og), atol=2e-5)


@pytest.mark.parametrize("H,W", [(8, 8), (6, 6)])
def test_dec_block_affine_equals_generic(H, W):
    k = jax.random.key(0)
    N, T, To, C = 2, 3, 4, 32
    x = jax.random.normal(k, (N, T, H, W, C)) * 0.5
    mem = jax.random.normal(jax.random.fold_in(k, 2), (N, To, H, W, C)) * 0.5
    beta = jax.random.normal(jax.random.fold_in(k, 1), (T * H * W, C)) * 0.3
    mbeta = jax.random.normal(jax.random.fold_in(k, 3),
                              (To * H * W, C)) * 0.3
    evt = jax.random.normal(jax.random.fold_in(k, 4), (N, 1, H, W, C)) * 0.5
    mk = lambda af: VidHRFormerBlockDecNAR(C, 4, dropout=0.0, drop_path=0.0,
                                           dim_feedforward=64,
                                           affine_posfuse=af)
    args = (x, evt, mem, (mbeta, jnp.zeros_like(mbeta)),
            (beta, jnp.zeros_like(beta)))
    variables = mk(False).init(k, *args)
    og = mk(False).apply(variables, *args)
    oa = mk(True).apply(variables, *args)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(og), atol=3e-5)


def test_decoder_cross_kv_hoist_equals_generic():
    """The decoder stack's cross-layer k/v hoist (all cross-attention memory
    projections batched into one wide matmul) equals the per-layer generic
    path over one parameter set."""
    from npvp_tpu.nn.vidhrformer import VidHRFormerDecoderNAR

    k = jax.random.key(0)
    N, To, H, W, C = 2, 4, 8, 8, 32
    evt = jax.random.normal(k, (N, 1, H, W, C)) * 0.5
    mem = jax.random.normal(jax.random.fold_in(k, 2), (N, To, H, W, C)) * 0.5
    tbeta = jax.random.normal(jax.random.fold_in(k, 1), (3 * H * W, C)) * 0.3
    mbeta = jax.random.normal(jax.random.fold_in(k, 3), (To * H * W, C)) * 0.3
    mk = lambda af: VidHRFormerDecoderNAR(2, C, 4, dropout=0.0,
                                          drop_path=0.0, dim_feedforward=64,
                                          affine_posfuse=af)
    args = (evt, mem, (mbeta, jnp.zeros_like(mbeta)),
            (tbeta, jnp.zeros_like(tbeta)))
    variables = mk(True).init(k, *args)
    np.testing.assert_allclose(
        np.asarray(mk(True).apply(variables, *args)),
        np.asarray(mk(False).apply(variables, *args)), atol=2e-5)
