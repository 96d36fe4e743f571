"""Fused temporal-attention Pallas kernel: numerics vs the XLA path.

The kernel (npvp_tpu/kernels/temporal_attention.py) serves the per-site T×T
attentions (reference models/VidHRFormer.py:94-107 temporal MHSA, :214-222
cross-attention) on the deterministic serving path (``exec_mode="pallas"``).
On CPU the Pallas interpreter runs the same kernel logic, so these tests pin
the math without TPU hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.kernels.temporal_attention import (allow_to_bias,
                                                 temporal_attention)
from npvp_tpu.nn.layers import scaled_dot_product_attention


def _ref(q, k, v, nh, allow=None):
    B, Tq, HD = q.shape
    Tk = k.shape[1]
    hd = HD // nh
    mask = None if allow is None else jnp.asarray(allow)[None, None]
    out = scaled_dot_product_attention(
        q.reshape(B, Tq, nh, hd), k.reshape(B, Tk, nh, hd),
        v.reshape(B, Tk, nh, hd), mask=mask)
    return np.asarray(out.reshape(B, Tq, HD))


def test_kernel_matches_xla_attention():
    rng = np.random.default_rng(0)
    B, Tq, Tk, nh, hd = 8, 5, 7, 4, 16
    HD = nh * hd
    q = jnp.asarray(rng.standard_normal((B, Tq, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    out = np.asarray(temporal_attention(q, k, v, num_heads=nh,
                                        block_sites=4))
    np.testing.assert_allclose(out, _ref(q, k, v, nh), atol=1e-5)


def test_kernel_respects_allow_mask():
    rng = np.random.default_rng(1)
    B, T, nh, hd = 4, 6, 2, 8
    HD = nh * hd
    q = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    allow = rng.random((T, T)) > 0.4
    allow[:, 0] = True  # every query keeps at least one key
    out = np.asarray(temporal_attention(q, k, v, allow_to_bias(allow),
                                        num_heads=nh, block_sites=4))
    np.testing.assert_allclose(out, _ref(q, k, v, nh, allow), atol=1e-5)


def test_kernel_fused_oproj_matches_separate():
    """wo/bo passed into the kernel ≡ attention followed by a dense
    projection (fp32 math, per-head accumulation order)."""
    rng = np.random.default_rng(3)
    B, Tq, Tk, nh, hd, C = 8, 5, 7, 4, 16, 48
    HD = nh * hd
    q = jnp.asarray(rng.standard_normal((B, Tq, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((HD, C)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    fused = np.asarray(temporal_attention(q, k, v, num_heads=nh,
                                          wo=wo, bo=bo, block_sites=4))
    assert fused.shape == (B, Tq, C)
    sep = _ref(q, k, v, nh) @ np.asarray(wo) + np.asarray(bo)
    np.testing.assert_allclose(fused, sep, atol=1e-4)


@pytest.mark.parametrize("fuse", [True, False])
def test_pallas_exec_mode_matches_xla_predictor(monkeypatch, fuse):
    """Full NPPredictor forward: exec_mode="pallas" ≡ "xla" on the same
    parameters (one param set across execution paths — CLAUDE.md rule).
    BLOCK_SITES is shrunk so the kernel also engages for the window
    attention's smaller site counts at test shapes; both FUSE_OPROJ
    settings must match the XLA path."""
    from npvp_tpu.core.config import Config
    from npvp_tpu.kernels import temporal_attention as ta_kernel
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.predictor import build_predictor

    monkeypatch.setattr(ta_kernel, "BLOCK_SITES", 8)
    monkeypatch.setattr(ta_kernel, "FUSE_OPROJ", fuse)

    cfg = Config()
    p = cfg.Predictor
    p.embed_dim, p.num_heads = 64, 4
    p.transformer_layers, p.evt_former_num_layers = 2, 1
    p.dim_feedforward, p.evt_hidden_channels = 128, 32
    p.max_T, p.max_H, p.max_W = 8, 8, 8  # H·W = 64 sites (kernel block)
    p.stochastic = True
    cfg.Dataset.num_past_frames = cfg.Dataset.num_future_frames = 4
    cfg.AE.ngf, cfg.AE.n_downsampling = 8, 3
    cfg.validate()

    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 64)) * 0.3,
                        jnp.float32)
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(4, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(4, 8, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)

    xla = build_predictor(cfg, jnp.float32, exec_mode="xla")
    variables = xla.init({"params": jax.random.key(0),
                          "latent": jax.random.key(1)}, feats, oc, tc, 4)
    out_xla = xla.apply(variables, feats, oc, tc, 4,
                        rngs={"latent": jax.random.key(2)})
    pallas = build_predictor(cfg, jnp.float32, exec_mode="pallas")
    out_pallas = pallas.apply(variables, feats, oc, tc, 4,
                              rngs={"latent": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(out_pallas.pred_features),
                               np.asarray(out_xla.pred_features), atol=2e-5)


def test_kernel_rejects_indivisible_sites():
    q = jnp.zeros((6, 2, 8))
    with pytest.raises(AssertionError, match="divisible"):
        temporal_attention(q, q, q, num_heads=2, block_sites=4)


def test_site_packing_is_exact():
    """pack_sites>1 merges G sites per MXU dot behind a block-diagonal
    softmax whose off-block weights are EXACTLY zero (finfo.min bias →
    exp underflows to 0). The only permitted deviation from the unpacked
    kernel is dot accumulation order (a G·Tk-wide contraction reassociates
    the same nonzero products) — ulp-level in fp32. Covers bias/no-bias and
    Tq ≠ Tk."""
    rng = np.random.default_rng(7)
    B, Tq, Tk, nh, hd = 16, 5, 7, 4, 16
    HD = nh * hd
    q = jnp.asarray(rng.standard_normal((B, Tq, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, HD)), jnp.float32)
    allow = rng.random((Tq, Tk)) > 0.4
    allow[:, 0] = True
    for bias in (None, allow_to_bias(allow)):
        base = np.asarray(temporal_attention(
            q, k, v, bias, num_heads=nh, block_sites=8, pack_sites=1))
        for G in (2, 4):
            packed = np.asarray(temporal_attention(
                q, k, v, bias, num_heads=nh, block_sites=8, pack_sites=G))
            np.testing.assert_allclose(packed, base, atol=3e-6)


def test_site_packing_fused_oproj_is_exact():
    rng = np.random.default_rng(8)
    B, T, nh, hd, C = 16, 6, 2, 8, 24
    HD = nh * hd
    q = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((HD, C)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    base = np.asarray(temporal_attention(q, k, v, num_heads=nh, wo=wo,
                                         bo=bo, block_sites=8, pack_sites=1))
    packed = np.asarray(temporal_attention(q, k, v, num_heads=nh, wo=wo,
                                           bo=bo, block_sites=8,
                                           pack_sites=4))
    np.testing.assert_allclose(packed, base, atol=3e-6)


def test_auto_pack_factor_rules():
    from npvp_tpu.kernels.temporal_attention import PACK_LANES, _pack_factor
    assert _pack_factor(4096, 20, 20, 64) == 4      # 4·20 ≤ 128 < 8·20
    assert _pack_factor(4096, 16, 16, 64) == 8      # 8·16 = 128 exactly
    assert _pack_factor(4096, 10, 10, 64) == 8      # capped by 16·10 > 128
    assert _pack_factor(4096, 200, 200, 64) == 1    # too long to pack
    assert _pack_factor(6, 10, 10, 64) == 2         # must divide B
    assert PACK_LANES == 128
