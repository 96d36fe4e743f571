"""Dynamic-int8 serving path: numerics, parameter compatibility, drift.

VERDICT round-1 item 1: the int8 serving quantization must keep one
parameter set with the fp32/bf16 paths and a recorded PSNR drift vs the
fp32 path. Random weights are the worst case for dynamic quantization
(no outlier structure learned away), so these bounds hold a fortiori for
trained weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from npvp_tpu.core.config import Config
from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
from npvp_tpu.models.predictor import build_predictor
from npvp_tpu.nn.quant import (QuantDense, int8_contract,
                               quantize_colwise, quantize_rowwise)


def _tiny_cfg():
    cfg = Config()
    p = cfg.Predictor
    p.embed_dim, p.num_heads = 64, 4
    p.transformer_layers, p.evt_former_num_layers = 2, 1
    p.dim_feedforward = 128
    cfg.AE.ngf, cfg.AE.n_downsampling, cfg.AE.num_res_blocks = 8, 3, 1
    return cfg


def test_int8_contract_matches_fp32():
    k = jax.random.key(0)
    x = jax.random.normal(k, (32, 64))
    w = jax.random.normal(jax.random.fold_in(k, 1), (64, 48)) * 0.1
    ref = x @ w
    got = int8_contract(x, w, out_dtype=jnp.float32)
    rel = jnp.abs(got - ref).mean() / jnp.abs(ref).mean()
    assert rel < 0.02, rel


def test_int8_contract_multi_axis():
    """wo-style contraction over trailing (heads, head_dim)."""
    k = jax.random.key(2)
    x = jax.random.normal(k, (5, 7, 4, 16))
    w = jax.random.normal(jax.random.fold_in(k, 1), (4, 16, 32)) * 0.2
    ref = jnp.einsum("bqhd,hdc->bqc", x, w)
    got = int8_contract(x, w, n_contract=2, out_dtype=jnp.float32)
    rel = jnp.abs(got - ref).mean() / jnp.abs(ref).mean()
    assert rel < 0.02, rel


def test_quantize_roundtrip_ranges():
    x = jax.random.normal(jax.random.key(3), (16, 64)) * 5.0
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8
    assert jnp.abs(q.astype(jnp.float32) * s - x).max() < s.max()
    qc, sc = quantize_colwise(x)
    assert qc.dtype == jnp.int8 and sc.shape == (1, 64)


def test_quant_dense_matches_dense_general_params():
    """QuantDense must create bit-identical params to the nn.DenseGeneral it
    replaces (same names, shapes, and initial values)."""
    x = jnp.zeros((3, 10, 64))
    ref = nn.DenseGeneral(features=(4, 16), axis=-1, param_dtype=jnp.float32)
    mine = QuantDense(features=(4, 16), axis=-1)
    k = jax.random.key(7)
    vr = ref.init(k, x)
    vm = mine.init(k, x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vm)
    for a, b in zip(jax.tree.leaves(vr), jax.tree.leaves(vm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # non-quant forward equals DenseGeneral
    xr = jax.random.normal(k, (3, 10, 64))
    np.testing.assert_allclose(np.asarray(ref.apply(vr, xr)),
                               np.asarray(mine.apply(vm, xr)), rtol=2e-5,
                               atol=2e-5)


def test_fused_qk_projection_matches_unfused():
    """Self-attention (q_in is k_in) takes the fused concatenated-kernel
    projection path; it must equal the unfused two-matmul computation on the
    same parameters."""
    from npvp_tpu.nn.layers import MultiHeadAttention

    mha = MultiHeadAttention(embed_dim=32, num_heads=4)
    k = jax.random.key(11)
    x = jax.random.normal(k, (2, 6, 32))
    v = jax.random.normal(jax.random.fold_in(k, 1), (2, 6, 32))
    variables = mha.init(k, x, x, v)          # fused path (q_in is k_in)
    fused = mha.apply(variables, x, x, v)
    unfused = mha.apply(variables, x, x + 0.0, v)  # distinct array object
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=2e-5, atol=2e-5)


def test_predictor_int8_mode_feature_drift():
    """One parameter set; int8 exec mode drifts <5% in feature space from the
    fp32 reference path (bf16 path drift is ~1.7% — DESIGN.md)."""
    cfg = _tiny_cfg()
    p = cfg.Predictor
    m_xla = build_predictor(cfg, jnp.float32, exec_mode="xla")
    m_int8 = build_predictor(cfg, jnp.float32, exec_mode="int8")
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(3, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(3, 6, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    feats = jax.random.normal(jax.random.key(0), (2, 3, 8, 8, 64))
    variables = m_xla.init({"params": jax.random.key(1),
                            "latent": jax.random.key(2)}, feats, oc, tc, 3)
    # identical tree across modes — one checkpoint serves all exec modes
    v2 = m_int8.init({"params": jax.random.key(1),
                      "latent": jax.random.key(2)}, feats, oc, tc, 3)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))
    rngs = {"latent": jax.random.key(3)}
    a = m_xla.apply(variables, feats, oc, tc, 3, rngs=rngs).pred_features
    b = m_int8.apply(variables, feats, oc, tc, 3, rngs=rngs).pred_features
    rel = float(jnp.abs(a - b).mean() / (jnp.abs(a).mean() + 1e-9))
    assert rel < 0.05, rel


@pytest.mark.slow
def test_full_pipeline_int8_psnr_drift():
    """End-to-end image drift of the int8 serving path vs the fp32 parity
    path stays above 40 dB PSNR (measured ≈ 60 dB on random weights)."""
    from npvp_tpu.models.inference import VideoPredictor

    cfg = _tiny_cfg()
    vp32 = VideoPredictor.from_random_init(cfg, dtype=jnp.float32)
    vp8 = VideoPredictor.from_random_init(cfg, dtype=jnp.float32,
                                          exec_mode="int8")
    vp8.ae_vars, vp8.predictor_vars = vp32.ae_vars, vp32.predictor_vars
    frames = np.random.default_rng(0).standard_normal(
        (2, 5, 64, 64, 1)).astype(np.float32) * 0.3
    a = np.asarray(vp32.vfp(frames, 5, rng=jax.random.key(7)))
    b = np.asarray(vp8.vfp(frames, 5, rng=jax.random.key(7)))
    mse = np.mean((a - b) ** 2)
    psnr_db = 10 * np.log10(4.0 / mse)  # Tanh output range 2
    assert psnr_db > 40.0, psnr_db


def test_static_act_scale_matches_dynamic():
    """STATIC_ACT_SCALE (the static-calibration experiment, round-3 VERDICT
    item 6) must reproduce the dynamic path's math when set to the batch's
    true abs-max/127 — and restore dynamic behavior when cleared."""
    import npvp_tpu.nn.quant as q

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 6, 8), np.float32)
    w = rng.standard_normal((8, 5), np.float32)
    ref = x @ w
    try:
        q.STATIC_ACT_SCALE = float(np.abs(x).max() / 127.0)
        out = np.asarray(q.int8_contract(jnp.asarray(x), jnp.asarray(w),
                                         out_dtype=jnp.float32))
        # per-tensor scale is coarser than per-row but bounded at int8 grain
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02
        # 2-axis contraction (the attention out-projection shape)
        x2 = rng.standard_normal((3, 7, 2, 4), np.float32)
        w2 = rng.standard_normal((2, 4, 5), np.float32)
        ref2 = np.einsum("bthd,hdc->btc", x2, w2)
        out2 = np.asarray(q.int8_contract(jnp.asarray(x2), jnp.asarray(w2),
                                          n_contract=2,
                                          out_dtype=jnp.float32))
        assert np.abs(out2 - ref2).max() / np.abs(ref2).max() < 0.05
    finally:
        q.STATIC_ACT_SCALE = None
    dyn = np.asarray(q.int8_contract(jnp.asarray(x), jnp.asarray(w),
                                     out_dtype=jnp.float32))
    assert np.abs(dyn - ref).max() / np.abs(ref).max() < 0.02
