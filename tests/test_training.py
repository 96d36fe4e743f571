"""End-to-end training smoke tests (stage 1 → stage 2) on the procedural
SM-MNIST fixture, plus the masked-mode ≡ static-mode equivalence proof for
the unified/rand-context design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.core.config import Config
from npvp_tpu.models.coords import (coordinate_grid, full_coordinate_volume,
                                    spatial_index_lists)
from npvp_tpu.models.predictor import NPPredictor


def tiny_config(tmp_path) -> Config:
    cfg = Config()
    cfg.Dataset.name = "SMMNIST"
    cfg.Dataset.img_size = 16
    cfg.Dataset.num_past_frames = 2
    cfg.Dataset.num_future_frames = 2
    cfg.Dataset.test_num_past_frames = 2
    cfg.Dataset.test_num_future_frames = 2
    cfg.Dataset.batch_size = 2
    cfg.Dataset.dev_set_size = 4
    cfg.Dataset.num_workers = 1
    cfg.Dataset.phase = "debug"
    cfg.AE.ngf = 4
    cfg.AE.n_downsampling = 1
    cfg.AE.num_res_blocks = 1
    cfg.AE.out_layer = "Sigmoid"
    cfg.AE.epochs = 1
    cfg.AE.ckpt_save_dir = str(tmp_path / "ae_ckpt")
    cfg.AE.tensorboard_save_dir = str(tmp_path / "ae_tb")
    cfg.Predictor.max_T = 4
    cfg.Predictor.max_H = 8
    cfg.Predictor.max_W = 8
    cfg.Predictor.embed_dim = 8
    cfg.Predictor.num_heads = 2
    cfg.Predictor.transformer_layers = 1
    cfg.Predictor.evt_former_num_layers = 1
    cfg.Predictor.evt_hidden_channels = 4
    cfg.Predictor.dim_feedforward = 16
    cfg.Predictor.epochs = 1
    cfg.Predictor.ckpt_save_dir = str(tmp_path / "pred_ckpt")
    cfg.Predictor.tensorboard_save_dir = str(tmp_path / "pred_tb")
    cfg.Predictor.resume_AE_ckpt = cfg.AE.ckpt_save_dir
    cfg.Env.compute_dtype = "float32"
    cfg.Env.visual_callback = False
    return cfg.validate()


# SM-MNIST digit canvas must match img_size; patch a small canvas dataset.
@pytest.fixture()
def small_smmnist(monkeypatch):
    from npvp_tpu.data import loader as loader_mod
    from npvp_tpu.data.smmnist import StochasticMovingMNIST

    orig = StochasticMovingMNIST

    def factory(*args, **kwargs):
        kwargs.setdefault("image_size", 16)
        kwargs.setdefault("digit_size", 8)
        return orig(*args, **kwargs)

    monkeypatch.setattr(loader_mod, "StochasticMovingMNIST", factory)


def test_stage1_then_stage2_deterministic(tmp_path, small_smmnist):
    from npvp_tpu.train import stage1_ae, stage2_predictor

    cfg = tiny_config(tmp_path)
    state = stage1_ae.train(cfg, max_steps=2)
    assert int(state.step) == 2
    assert (tmp_path / "ae_ckpt").exists()

    state2 = stage2_predictor.train(cfg, max_steps=2)
    assert int(state2.step) == 2
    assert (tmp_path / "pred_ckpt").exists()
    # metrics logged
    assert (tmp_path / "pred_tb" / "metrics.jsonl").exists()


def test_stage2_stochastic_rand_context(tmp_path, small_smmnist):
    from npvp_tpu.train import stage1_ae, stage2_predictor

    cfg = tiny_config(tmp_path)
    stage1_ae.train(cfg, max_steps=1)
    cfg.Predictor.stochastic = True
    cfg.Predictor.rand_context = True
    cfg.Predictor.min_lo = 1
    cfg.Predictor.max_lo = 3
    state = stage2_predictor.train(cfg, max_steps=2)
    assert int(state.step) == 2


def make_tiny_predictor(stochastic=False, dropout=0.0):
    return NPPredictor(embed_dim=8, num_heads=2, window_size=4,
                       transformer_layers=1, evt_former_num_layers=1,
                       evt_hidden_channels=4, dim_feedforward=16,
                       stochastic=stochastic, dropout=dropout,
                       drop_path=0.0)


def test_masked_mode_equals_static_mode():
    """A full-max_T masked run must reproduce the compact static run at the
    target positions — the correctness proof for replacing the reference's
    per-batch tensor re-slicing (models/Predictor.py:241-251) with masks."""
    T, H, W, C = 4, 8, 8, 8
    To = 2
    model = make_tiny_predictor()
    h, w = spatial_index_lists(H, W)

    clip_feats = jax.random.uniform(jax.random.key(0), (2, T, H, W, C))
    # static: observe frames [0, 1], predict frames [2, 3]
    oc = coordinate_grid(jnp.arange(To, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(To, T, dtype=jnp.float32), h, w, T, H, W)
    variables = model.init({"params": jax.random.key(1)},
                           clip_feats[:, :To], oc, tc, T - To)
    static_out = model.apply(variables, clip_feats[:, :To], oc, tc, T - To)

    # masked: full clip + masks over all T
    all_coords = full_coordinate_volume(T, H, W).reshape(-1, 3)
    obs_mask = jnp.array([True, True, False, False])
    masked_out = model.apply(variables, clip_feats, all_coords, all_coords,
                             T, obs_mask=obs_mask, tgt_mask=~obs_mask)

    np.testing.assert_allclose(
        np.asarray(masked_out.pred_features[:, To:]),
        np.asarray(static_out.pred_features), atol=2e-4)


def test_masked_mode_no_target_leakage():
    """Perturbing *target* frames of the input clip must not change the
    prediction (only observed frames may influence it)."""
    T, H, W, C = 4, 8, 8, 8
    model = make_tiny_predictor()
    all_coords = full_coordinate_volume(T, H, W).reshape(-1, 3)
    obs_mask = jnp.array([True, False, True, False])

    clip = jax.random.uniform(jax.random.key(0), (1, T, H, W, C))
    variables = model.init({"params": jax.random.key(1)}, clip, all_coords,
                           all_coords, T, obs_mask=obs_mask,
                           tgt_mask=~obs_mask)
    out1 = model.apply(variables, clip, all_coords, all_coords, T,
                       obs_mask=obs_mask, tgt_mask=~obs_mask)
    clip2 = clip.at[:, 1].add(100.0).at[:, 3].add(-50.0)
    out2 = model.apply(variables, clip2, all_coords, all_coords, T,
                       obs_mask=obs_mask, tgt_mask=~obs_mask)
    np.testing.assert_allclose(np.asarray(out1.pred_features[:, 1]),
                               np.asarray(out2.pred_features[:, 1]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.pred_features[:, 3]),
                               np.asarray(out2.pred_features[:, 3]),
                               atol=1e-5)


def test_stochastic_train_vs_eval_latent_paths():
    """NPVP-S: training decodes from the posterior sample, eval from the
    prior sample (reference models/Predictor.py:308-326)."""
    T, H, W, C = 4, 8, 8, 8
    To = 2
    model = make_tiny_predictor(stochastic=True)
    h, w = spatial_index_lists(H, W)
    oc = coordinate_grid(jnp.arange(To, dtype=jnp.float32), h, w, T, H, W)
    tc = coordinate_grid(jnp.arange(To, T, dtype=jnp.float32), h, w, T, H, W)
    obs = jax.random.uniform(jax.random.key(0), (2, To, H, W, C))
    tgt = jax.random.uniform(jax.random.key(1), (2, T - To, H, W, C))
    rngs = {"params": jax.random.key(2), "latent": jax.random.key(3),
            "dropout": jax.random.key(4), "droppath": jax.random.key(5)}
    variables = model.init(rngs, obs, oc, tc, T - To, target_feats_gt=tgt,
                           train=True)

    out_train, _ = model.apply(variables, obs, oc, tc, T - To,
                               target_feats_gt=tgt, train=True,
                               rngs={"latent": jax.random.key(6),
                                     "dropout": jax.random.key(7),
                                     "droppath": jax.random.key(8)},
                               mutable=["batch_stats"])
    assert out_train.mu_p is not None and out_train.logvar_p is not None
    assert np.isfinite(np.asarray(out_train.pred_features)).all()

    # eval: no target needed, prior is used
    out_eval = model.apply(variables, obs, oc, tc, T - To,
                           rngs={"latent": jax.random.key(9)})
    assert out_eval.mu_p is None
    assert np.isfinite(np.asarray(out_eval.pred_features)).all()

    # two different latent keys → different stochastic predictions
    out_eval2 = model.apply(variables, obs, oc, tc, T - To,
                            rngs={"latent": jax.random.key(10)})
    assert np.abs(np.asarray(out_eval.pred_features)
                  - np.asarray(out_eval2.pred_features)).max() > 1e-6
    # same key → identical
    out_eval3 = model.apply(variables, obs, oc, tc, T - To,
                            rngs={"latent": jax.random.key(9)})
    np.testing.assert_allclose(np.asarray(out_eval.pred_features),
                               np.asarray(out_eval3.pred_features))


def test_stage2_vfi_mode(tmp_path, small_smmnist):
    from npvp_tpu.train import stage1_ae, stage2_predictor

    cfg = tiny_config(tmp_path)
    stage1_ae.train(cfg, max_steps=1)
    cfg.Predictor.VFI = True
    cfg.Predictor.context_num_p = 1
    cfg.Predictor.context_num_f = 1
    cfg.Predictor.num_interpolate = 2
    state = stage2_predictor.train(cfg, max_steps=2)
    assert int(state.step) == 2


def test_evaluate_cli(tmp_path, small_smmnist, capsys):
    import json

    from npvp_tpu.eval import evaluate as ev

    cfg = tiny_config(tmp_path)
    results = ev.evaluate(cfg, max_batches=1, random_init=True)
    assert "PSNR" in results and "SSIM" in results and "MSE" in results
    assert len(results["PSNR_per_t"]) == cfg.Dataset.test_num_future_frames
    assert np.isfinite(results["PSNR"])


@pytest.mark.slow
def test_trainers_run_with_fsdp(tmp_path, small_smmnist, monkeypatch):
    """Env.fsdp=True end-to-end through both trainers: the train state is
    ZeRO-3-sharded over the data axis (core.mesh fsdp rules) and the steps
    run green with the sharded layout surviving into the returned state."""
    import npvp_tpu.core.mesh as mesh_mod
    from npvp_tpu.train import stage1_ae, stage2_predictor

    # the tiny config's leaves are all below the production FSDP_MIN_SIZE
    monkeypatch.setattr(mesh_mod, "FSDP_MIN_SIZE", 64)
    cfg = tiny_config(tmp_path)
    cfg.Env.fsdp = True
    stage1_ae.train(cfg, max_steps=1)
    # K=2 multi-step dispatch on top of the ZeRO-3 layout: the lax.scan
    # over optimizer steps must carry the sharded state
    cfg.Env.steps_per_dispatch = 2
    state = stage2_predictor.train(cfg, max_steps=2)
    assert int(state.step) == 2
    specs = [tuple(l.sharding.spec)
             for l in jax.tree_util.tree_leaves(state.params)
             if hasattr(l, "sharding") and hasattr(l.sharding, "spec")]
    assert any("data" in s for s in specs)


def test_multi_step_dispatch_equals_per_step(tmp_path, small_smmnist):
    """K gradient steps batched into one lax.scan program (multi-step
    dispatch, Env.steps_per_dispatch) follow the SAME training trajectory as
    K individual dispatches: the rng stream is identical
    (fold_in(base_rng, state.step) on both paths); values agree to the
    last-ulp compile variation between the two XLA programs."""
    import jax
    from npvp_tpu.core.mesh import make_mesh, shard_state
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage1_ae import build_ae
    from npvp_tpu.train.stage2_predictor import (init_predictor_state,
                                                 make_steps)

    cfg = tiny_config(tmp_path)
    cfg.Predictor.stochastic = True
    cfg.Predictor.rand_context = True
    cfg.Predictor.min_lo = 1
    cfg.Predictor.max_lo = 3
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    ae = build_ae(cfg, jnp.float32)
    d = cfg.Dataset
    ae_vars = ae.init(jax.random.key(0),
                      jnp.zeros((1, 2, d.img_size, d.img_size,
                                 d.img_channels)))
    predictor = build_predictor(cfg, jnp.float32)
    T = cfg.Predictor.max_T
    rng = np.random.default_rng(0)
    batches = [{"clip": rng.random((2, T, d.img_size, d.img_size, 1),
                                   np.float32),
                "obs_mask": np.array([True, False, True, False]),
                "tgt_mask": np.array([False, True, False, True])}
               for _ in range(3)]
    base_rng = jax.random.key(7)

    def fresh_state():
        return shard_state(mesh, init_predictor_state(cfg, predictor, 10))

    train_step, _, place, _, _, multi = make_steps(
        cfg, predictor, ae, ae_vars, mesh, mode="rand_context")

    s1 = fresh_state()
    per_metrics = []
    for b in batches:
        s1, m = train_step(s1, place(b),
                           jax.random.fold_in(base_rng, int(s1.step)))
        per_metrics.append(float(m["loss"]))

    s2 = fresh_state()
    s2, ms = multi.train(s2, multi.place_stack(batches), base_rng)

    np.testing.assert_allclose(np.asarray(ms["loss"], np.float32),
                               np.asarray(per_metrics, np.float32),
                               rtol=1e-6)
    # Adam amplifies last-ulp gradient differences early (update magnitude
    # ~lr=1e-4); compare absolutely against that scale
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=1e-5),
        s1.params, s2.params)
    assert int(s2.step) == 3


def test_stage1_multi_step_dispatch_equals_per_step(tmp_path):
    """Stage-1 analogue of the dispatch-chunking equivalence: the AE step
    draws no rng, so K steps scanned in one program must follow the exact
    per-step trajectory (BN statistics thread through the scan carry)."""
    import jax
    from npvp_tpu.core.mesh import make_mesh, replicated
    from npvp_tpu.train.stage1_ae import build_ae, init_state, make_steps

    cfg = tiny_config(tmp_path)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    ae = build_ae(cfg, jnp.float32)
    d = cfg.Dataset
    clip = (1, 4, d.img_size, d.img_size, d.img_channels)
    rng = np.random.default_rng(3)
    batches = [{"past": rng.random((2, 2, d.img_size, d.img_size, 1),
                                   np.float32),
                "future": rng.random((2, 2, d.img_size, d.img_size, 1),
                                     np.float32)}
               for _ in range(3)]

    (train_step, eval_step, _vis,
     train_multi, eval_multi) = make_steps(ae, mesh, replicated(mesh))

    s1 = init_state(cfg, ae, clip)
    per_loss, per_val = [], []
    for b in batches:
        s1, m = train_step(s1, b)
        per_loss.append(float(m["L1_loss_train"]))
        per_val.append(float(eval_step(s1, b)["L1_loss_valid"]))

    s2 = init_state(cfg, ae, clip)
    s2, ms = train_multi(s2, batches)
    np.testing.assert_allclose(np.asarray(ms["L1_loss_train"], np.float32),
                               np.asarray(per_loss, np.float32), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=0, atol=1e-5),
        s1.params, s2.params)
    assert int(s2.step) == 3

    vms = eval_multi(s2, batches)
    assert np.asarray(vms["L1_loss_valid"]).shape == (3,)
