"""Inference API + CLI: five tasks, checkpoint round-trip, timing protocol."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.core.config import Config
from npvp_tpu.models.inference import VideoPredictor


def small_cfg():
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
    cfg.AE.ngf = 4
    cfg.AE.n_downsampling = 1
    cfg.AE.num_res_blocks = 1
    cfg.AE.out_layer = "Sigmoid"
    cfg.Predictor.max_T = 4
    cfg.Predictor.embed_dim = 8
    cfg.Predictor.num_heads = 2
    cfg.Predictor.transformer_layers = 1
    cfg.Predictor.evt_former_num_layers = 1
    cfg.Predictor.evt_hidden_channels = 4
    cfg.Predictor.dim_feedforward = 16
    cfg.Predictor.stochastic = True
    cfg.Env.compute_dtype = "float32"
    return cfg.validate()


@pytest.fixture(scope="module")
def vp():
    return VideoPredictor.from_random_init(small_cfg(), dtype=jnp.float32)


def test_all_five_tasks(vp):
    frames = jax.random.uniform(jax.random.key(0), (2, 2, 16, 16, 1))
    out = vp.vfp(frames, num_future=2)
    assert out.shape == (2, 2, 16, 16, 1)
    out = vp.vpe(frames, num_past=2)
    assert out.shape == (2, 2, 16, 16, 1)
    out = vp.vfi(frames, context_p=1, context_f=1, num_interpolate=2)
    assert out.shape == (2, 2, 16, 16, 1)
    out = vp.vrc(frames, [0, 2], [1, 3])
    assert out.shape == (2, 2, 16, 16, 1)
    # HVRC: fractional target times
    out = vp.hvrc(frames, [0.0, 1.0], [1.5, 2.25, 3.0])
    assert out.shape == (2, 3, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_program_cache_reuses_by_tp_shape(vp):
    frames = jax.random.uniform(jax.random.key(0), (1, 2, 16, 16, 1))
    vp._compiled.clear()
    vp.predict(frames, [0, 1], [2, 3])
    assert len(vp._compiled) == 1
    # different VALUES, same TP shape → no new program
    vp.predict(frames, [1, 2], [2.5, 3.5])
    assert len(vp._compiled) == 1
    vp.predict(frames, [0, 1], [2.0, 2.5, 3.0])
    assert len(vp._compiled) == 2


def test_stochastic_rng_controls_samples(vp):
    frames = jax.random.uniform(jax.random.key(0), (1, 2, 16, 16, 1))
    a = vp.vfp(frames, 2, rng=jax.random.key(1))
    b = vp.vfp(frames, 2, rng=jax.random.key(2))
    c = vp.vfp(frames, 2, rng=jax.random.key(1))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_from_checkpoints_roundtrip(tmp_path):
    """Train-free checkpoint round-trip: save random-init states with the
    trainer's checkpoint layout, reload through the inference constructor."""
    from npvp_tpu.core.checkpoint import CheckpointManager
    from npvp_tpu.core.optim import make_ae_optimizer
    from npvp_tpu.core.train_state import TrainState
    from npvp_tpu.train.stage1_ae import build_ae, init_state
    from npvp_tpu.train.stage2_predictor import init_predictor_state
    from npvp_tpu.models.predictor import build_predictor

    cfg = small_cfg()
    ae = build_ae(cfg, jnp.float32)
    ae_state = init_state(cfg, ae, (1, 4, 16, 16, 1))
    m1 = CheckpointManager(tmp_path / "ae")
    m1.save(0, ae_state)
    m1.wait()

    predictor = build_predictor(cfg, jnp.float32)
    pred_state = init_predictor_state(cfg, predictor, 1)
    m2 = CheckpointManager(tmp_path / "pred")
    m2.save(0, pred_state)
    m2.wait()

    vp = VideoPredictor.from_checkpoints(cfg, tmp_path / "ae",
                                         tmp_path / "pred",
                                         dtype=jnp.float32)
    frames = jax.random.uniform(jax.random.key(0), (1, 2, 16, 16, 1))
    out = vp.vfp(frames, 2)
    assert np.isfinite(np.asarray(out)).all()

    # loaded params actually drive the forward: perturbing them changes it
    out2 = vp.vfp(frames, 2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_inference_cli_runs(tmp_path, monkeypatch, capsys):
    from npvp_tpu.data import loader as loader_mod
    from npvp_tpu.data.smmnist import StochasticMovingMNIST
    from npvp_tpu.train import inference as cli

    orig = StochasticMovingMNIST

    def factory(*args, **kwargs):
        kwargs.setdefault("image_size", 16)
        kwargs.setdefault("digit_size", 8)
        return orig(*args, **kwargs)

    monkeypatch.setattr(loader_mod, "StochasticMovingMNIST", factory)

    cfg_path = tmp_path / "cfg.json"
    cfg = small_cfg()
    cfg.save(cfg_path)
    cli.main(["--config_path", str(cfg_path), "--random_init",
              "--batches", "1", "--tasks", "VFP", "HVRC",
              "--gif_dir", str(tmp_path / "gifs")])
    out = json.loads(capsys.readouterr().out)
    assert "VFP" in out and "HVRC" in out
    assert out["VFP"]["PSNR"] > 0
    assert (tmp_path / "gifs" / "VFP.gif").exists()
    assert "PSNR" not in out["HVRC"]  # fractional times have no ground truth


def test_task_split_clamps_to_trained_range():
    """Every task split stays inside [0, T) with >=1 target, even when the
    test protocol asks for a context P >= T (the reference asserts
    t <= max_T, models/submodules.py:349-351)."""
    from npvp_tpu.train.inference import task_split

    for task in ("VPE", "VFI", "VRC", "HVRC"):
        for P, T in ((5, 15), (10, 10), (20, 10), (1, 4)):
            to, tp = task_split(task, P, T, seed=3)
            assert len(tp) >= 1, (task, P, T)
            assert len(to) >= 1, (task, P, T)
            for arr in (to, tp):
                assert np.all(np.asarray(arr, np.float64) >= 0), (task, P, T)
                assert np.all(np.asarray(arr, np.float64) <= T - 0.5), (
                    task, P, T)
            # observed indices must be valid integer frame positions
            assert np.all(np.asarray(to) == np.asarray(to).astype(int))


def test_export_task_bundle_roundtrip(vp, tmp_path):
    """export_task writes a self-contained serving bundle whose deserialized
    program (jax.export StableHLO) reproduces the live freeze_task output,
    including the stochastic path through the raw-key-data calling
    convention."""
    frames = np.random.default_rng(0).random((2, 2, 16, 16, 1), np.float32)
    rng = jax.random.key(7)
    expect = np.asarray(vp.freeze_task([0.0, 1.0], [2.0, 3.0])(frames, rng))

    bundle = tmp_path / "vfp_2to2"
    vp.export_task(bundle, [0.0, 1.0], [2.0, 3.0], batch_size=2,
                   platforms=("cpu",))
    assert (bundle / "program.jaxexport").exists()
    assert (bundle / "variables.pkl").exists()
    meta = json.loads((bundle / "meta.json").read_text())
    assert meta["tp_list"] == [2.0, 3.0]

    serve = VideoPredictor.serve_exported(bundle)
    got = np.asarray(serve(frames, rng))
    assert got.shape == (2, 2, 16, 16, 1)
    np.testing.assert_allclose(got, expect, atol=1e-5)

    # a different rng draws a different stochastic sample
    other = np.asarray(serve(frames, jax.random.key(8)))
    assert np.abs(other - got).max() > 1e-6

    # arbitrary request sizes are chunked/padded to the exported batch:
    # a smaller request reproduces its rows of the full-batch call (clips
    # are independent — frozen BN stats), a larger one round-trips shape
    np.testing.assert_allclose(np.asarray(serve(frames[:1], rng)),
                               expect[:1], atol=1e-5)
    big = np.concatenate([frames, frames[:1]])
    assert np.asarray(serve(big, rng)).shape == (3, 2, 16, 16, 1)

    # wrong non-batch shape rejected with the bundle's recorded shape
    with pytest.raises(AssertionError):
        serve(frames[:, :1])


def test_export_serving_cli(tmp_path, capsys):
    """The export CLI writes a loadable bundle for a canonical task using
    the config's test-protocol frame counts."""
    from npvp_tpu.tools import export_serving as cli

    cfg_path = tmp_path / "cfg.json"
    small_cfg().save(cfg_path)
    out_dir = tmp_path / "bundle"
    cli.main(["--config_path", str(cfg_path), "--random_init",
              "--task", "VFP", "--batch_size", "2",
              "--platforms", "cpu", "--out", str(out_dir)])
    assert "exported task" in capsys.readouterr().out
    serve = VideoPredictor.serve_exported(out_dir)
    frames = np.random.default_rng(1).random((2, 2, 16, 16, 1), np.float32)
    pred = np.asarray(serve(frames))
    assert pred.shape == (2, 2, 16, 16, 1) and np.isfinite(pred).all()
