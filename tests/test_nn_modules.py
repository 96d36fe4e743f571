import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.nn.layers import LayerNormHWC, MultiHeadAttention
from npvp_tpu.nn.losses import kl_divergence, l1_loss
from npvp_tpu.nn.neural_process import NRMLP, EventEncoder, pos_feat_fuse
from npvp_tpu.nn.vidhrformer import (encoder_temporal_allow, window_partition,
                                     window_reverse)


def test_nrmlp_fourier_mapping_and_add_mode():
    model = NRMLP(out_channels=16, d_model=32, fuse_method="Add")
    coords = jax.random.uniform(jax.random.key(0), (12, 3))
    params = model.init(jax.random.key(1), coords)
    beta, gamma = model.apply(params, coords)
    assert beta.shape == (12, 16)
    np.testing.assert_array_equal(np.asarray(gamma), 0.0)

    # B init: N(0,1) * scale=10 (reference models/submodules.py:277-284)
    B = params["params"]["B"]
    assert B.shape == (32, 3)
    assert 5.0 < float(jnp.std(B)) < 20.0


def test_nrmlp_spade_mode_has_gamma_head():
    model = NRMLP(out_channels=8, d_model=16, fuse_method="SPADE")
    coords = jnp.zeros((4, 3))
    params = model.init(jax.random.key(0), coords)
    assert "mlp_gamma" in params["params"]
    beta, gamma = model.apply(params, coords)
    assert gamma.shape == beta.shape
    assert float(jnp.abs(gamma).max()) > 0.0


def test_pos_feat_fuse_layer_norm_formula():
    x = jax.random.normal(jax.random.key(0), (2, 3, 4, 4, 8))
    T, H, W, C = 3, 4, 4, 8
    beta = jax.random.normal(jax.random.key(1), (T * H * W, C))
    gamma = jax.random.normal(jax.random.key(2), (T * H * W, C))
    out = pos_feat_fuse(x, beta, gamma, "layer")
    assert out.shape == x.shape

    # manual: per-(n, t) frame layernorm over (H, W, C), then modulation
    xf = np.asarray(x, np.float64)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    normalized = (xf - mean) / np.sqrt(var + 1e-5)
    g = np.asarray(gamma).reshape(T, H, W, C)[None]
    b = np.asarray(beta).reshape(T, H, W, C)[None]
    expect = normalized * (1 + g) + b
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)


def test_pos_feat_fuse_rejects_unknown_norm():
    x = jnp.zeros((1, 1, 2, 2, 4))
    b = jnp.zeros((4, 4))
    with pytest.raises(ValueError):
        pos_feat_fuse(x, b, b, "group")


def test_window_partition_roundtrip():
    x = jax.random.normal(jax.random.key(0), (3, 8, 8, 16))
    w = window_partition(x, 4)
    assert w.shape == (3 * 4, 16, 16)
    back = window_reverse(w, 4, 3, 8, 8)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_window_partition_center_padding():
    # H=W=6, window=4 → pad to 8 with 1 on each side (center padding,
    # reference models/VidHRFormer.py:488-511)
    x = jax.random.normal(jax.random.key(0), (2, 6, 6, 4))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 4)
    back = window_reverse(w, 4, 2, 6, 6)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))
    # first window's top-left token is a padded zero
    np.testing.assert_array_equal(np.asarray(w[0, 0]), 0.0)


def test_window_partition_groups_correct_pixels():
    # channel value encodes (h, w); check window 0 holds the top-left 4×4
    hh = jnp.arange(8)[:, None] * 10 + jnp.arange(8)[None, :]
    x = hh[None, :, :, None].astype(jnp.float32)
    w = window_partition(x, 4)
    got = np.asarray(w[0, :, 0]).reshape(4, 4)
    expect = np.asarray(hh[:4, :4])
    np.testing.assert_array_equal(got, expect)


def test_encoder_temporal_allow_reference_semantics():
    # reference models/VidHRFormer.py:100-107: all queries except the last
    # cannot attend to the last key
    allow = np.asarray(encoder_temporal_allow(4))
    assert allow.shape == (4, 4)
    assert allow[3, 3]
    assert not allow[0, 3] and not allow[2, 3]
    assert allow[:, :3].all()


def test_encoder_temporal_allow_masked():
    obs = jnp.array([True, False, True, True, False])
    allow = np.asarray(encoder_temporal_allow(5, obs))
    # non-observed keys always blocked
    assert not allow[:, 1].any() and not allow[:, 4].any()
    # last observed position is 3: blocked for others, visible to itself
    assert allow[3, 3]
    assert not allow[0, 3] and not allow[2, 3]
    assert allow[0, 0] and allow[0, 2]


def test_multihead_attention_masking_blocks_leakage():
    mha = MultiHeadAttention(embed_dim=8, num_heads=2)
    q = jax.random.normal(jax.random.key(0), (2, 5, 8))
    kv = jax.random.normal(jax.random.key(1), (2, 5, 8))
    params = mha.init(jax.random.key(2), q, kv, kv)
    mask = jnp.ones((5, 5), bool).at[:, -1].set(False)
    out1 = mha.apply(params, q, kv, kv, mask=mask[None, None])
    kv2 = kv.at[:, -1].set(100.0)  # perturb the masked key/value
    out2 = mha.apply(params, q, kv2, kv2, mask=mask[None, None])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_layernorm_hwc():
    ln = LayerNormHWC()
    x = jax.random.normal(jax.random.key(0), (3, 4, 4, 8)) * 5 + 2
    params = ln.init(jax.random.key(1), x)
    y = np.asarray(ln.apply(params, x))
    np.testing.assert_allclose(y.mean(axis=(1, 2, 3)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(1, 2, 3)), 1.0, atol=1e-3)


def test_l1_loss_and_masked_variant():
    pred = jnp.ones((2, 4, 3, 3, 1))
    gt = jnp.zeros((2, 4, 3, 3, 1))
    assert float(l1_loss(pred, gt)) == pytest.approx(1.0)
    assert float(l1_loss(pred, gt, lam=0.5)) == pytest.approx(0.5)

    # masked: only frames 1, 2 count; make their error 2.0
    pred = pred.at[:, 1:3].set(2.0)
    mask = jnp.array([0.0, 1.0, 1.0, 0.0])
    assert float(l1_loss(pred, gt, mask=mask)) == pytest.approx(2.0)


def test_kl_divergence_closed_form():
    # KL(N(0,1) || N(0,1)) = 0
    z = jnp.zeros((4, 2, 2, 3))
    assert float(kl_divergence(z, z, z, z)) == pytest.approx(0.0, abs=1e-6)
    # KL(N(1,1) || N(0,1)) = 0.5 per element, summed / N, beta=2
    mu1 = jnp.ones((4, 5))
    got = kl_divergence(mu1, jnp.zeros((4, 5)), jnp.zeros((4, 5)),
                        jnp.zeros((4, 5)), beta=2.0)
    assert float(got) == pytest.approx(2.0 * 0.5 * 20 / 4)


def test_event_encoder_deterministic_and_stochastic():
    det = EventEncoder(hidden_channels=8, stochastic=False)
    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 6))
    variables = det.init(jax.random.key(1), x)
    mu = det.apply(variables, x)
    assert mu.shape == x.shape

    sto = EventEncoder(hidden_channels=8, stochastic=True)
    variables = sto.init({"params": jax.random.key(1),
                          "latent": jax.random.key(2)}, x)
    z, mu, logvar = sto.apply(variables, x,
                              rngs={"latent": jax.random.key(3)})
    assert z.shape == mu.shape == logvar.shape == x.shape
    # sampling differs from the mean almost surely
    assert float(jnp.abs(z - mu).max()) > 1e-4
    # sample=False returns the mean
    z2, mu2, _ = sto.apply(variables, x, sample=False,
                           rngs={"latent": jax.random.key(3)})
    np.testing.assert_allclose(np.asarray(z2), np.asarray(mu2))
