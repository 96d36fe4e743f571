"""Coverage for the less-traveled config branches: evt_former=False, SPADE
fusion, learn_3d autoencoder, checkpoint resume, best-metric retention."""

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
from npvp_tpu.models.predictor import NPPredictor
from npvp_tpu.nn.resnet_ae import FrameAutoEncoder


def test_predictor_without_evt_former():
    """evt_former=False: event coding = pos-fused mean of raw features
    (reference models/Predictor.py:348)."""
    T, H, W, C = 4, 8, 8, 8
    model = NPPredictor(embed_dim=C, num_heads=2, transformer_layers=1,
                        evt_former=False, evt_hidden_channels=4,
                        dim_feedforward=16, dropout=0.0, drop_path=0.0)
    h, w = spatial_index_lists(H, W)
    oc = coordinate_grid(jnp.arange(2, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(2, 4, dtype=jnp.float32), h, w, T, H, W)
    obs = jax.random.uniform(jax.random.key(0), (2, 2, H, W, C))
    variables = model.init({"params": jax.random.key(1)}, obs, oc, tc, 2)
    assert "evt_former_stack" not in variables["params"]
    out = model.apply(variables, obs, oc, tc, 2)
    assert out.pred_features.shape == (2, 2, H, W, C)
    assert np.isfinite(np.asarray(out.pred_features)).all()


def test_predictor_spade_fusion():
    T, H, W, C = 4, 8, 8, 8
    model = NPPredictor(embed_dim=C, num_heads=2, transformer_layers=1,
                        evt_former_num_layers=1, evt_hidden_channels=4,
                        dim_feedforward=16, fuse_method="SPADE",
                        dropout=0.0, drop_path=0.0)
    h, w = spatial_index_lists(H, W)
    oc = coordinate_grid(jnp.arange(2, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(2, 4, dtype=jnp.float32), h, w, T, H, W)
    obs = jax.random.uniform(jax.random.key(0), (1, 2, H, W, C))
    variables = model.init({"params": jax.random.key(1)}, obs, oc, tc, 2)
    assert "mlp_gamma" in variables["params"]["nrmlp"]
    out = model.apply(variables, obs, oc, tc, 2)
    assert np.isfinite(np.asarray(out.pred_features)).all()


def test_autoencoder_learn_3d():
    """learn_3d=True activates the temporal conv + 1D non-local attention
    half of Factorized3DConvAttn (reference models/submodules.py:62-67)."""
    ae = FrameAutoEncoder(img_channels=1, ngf=4, n_downsampling=2,
                          num_res_blocks=1, learn_3d=True)
    x = jax.random.uniform(jax.random.key(0), (2, 3, 16, 16, 1))
    variables = ae.init(jax.random.key(1), x)
    enc_params = variables["params"]["encoder"]
    assert "temporal_conv" in enc_params["block2_attn"]
    assert "attn1d" in enc_params["block2_attn"]
    rec, feats = ae.apply(variables, x, train=False)
    assert rec.shape == x.shape
    assert np.isfinite(np.asarray(rec)).all()

    # temporal attention actually mixes time: perturbing frame 0 changes the
    # features of frame 2 (impossible with learn_3d=False)
    x2 = x.at[:, 0].add(0.5)
    _, feats2 = ae.apply(variables, x2, train=False)
    assert np.abs(np.asarray(feats2[:, 2]) - np.asarray(feats[:, 2])).max() \
        > 1e-6

    ae_2d = FrameAutoEncoder(img_channels=1, ngf=4, n_downsampling=2,
                             num_res_blocks=1, learn_3d=False)
    v2d = ae_2d.init(jax.random.key(1), x)
    _, f1 = ae_2d.apply(v2d, x, train=False)
    _, f2 = ae_2d.apply(v2d, x2, train=False)
    np.testing.assert_allclose(np.asarray(f1[:, 2]), np.asarray(f2[:, 2]),
                               atol=1e-6)


def test_stage1_resume(tmp_path, monkeypatch):
    from npvp_tpu.data import loader as loader_mod
    from npvp_tpu.data.smmnist import StochasticMovingMNIST
    from npvp_tpu.train import stage1_ae
    from tests.test_training import tiny_config

    orig = StochasticMovingMNIST

    def factory(*args, **kwargs):
        kwargs.setdefault("image_size", 16)
        kwargs.setdefault("digit_size", 8)
        return orig(*args, **kwargs)

    monkeypatch.setattr(loader_mod, "StochasticMovingMNIST", factory)

    cfg = tiny_config(tmp_path)
    state = stage1_ae.train(cfg, max_steps=2)
    assert int(state.step) == 2
    # resume continues from the saved step
    cfg.AE.resume_ckpt = cfg.AE.ckpt_save_dir
    cfg.AE.epochs = 2
    state2 = stage1_ae.train(cfg, max_steps=3)
    assert int(state2.step) >= 3


def test_checkpoint_best_retention(tmp_path):
    from npvp_tpu.core.checkpoint import CheckpointManager

    mngr = CheckpointManager(tmp_path / "ck", max_to_keep=2, monitor="m",
                             mode="min")
    state = {"x": jnp.zeros(2)}
    for step, metric in [(0, 3.0), (1, 1.0), (2, 2.0), (3, 5.0)]:
        mngr.save(step, {"x": jnp.full(2, float(step))},
                  metrics={"m": metric})
    mngr.wait()
    assert mngr.best_step() == 1  # lowest metric survives retention
    restored = mngr.restore({"x": jnp.zeros(2)}, step=mngr.best_step())
    np.testing.assert_array_equal(np.asarray(restored["x"]), 1.0)
    mngr.close()
