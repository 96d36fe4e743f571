import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npvp_tpu.eval.fvd import FVD, frechet_distance, preprocess_videos
from npvp_tpu.eval.metrics import mse_score, pred_ave_metrics, psnr, ssim


def test_psnr_closed_form():
    x = jnp.zeros((2, 8, 8, 1))
    y = jnp.full((2, 8, 8, 1), 0.1)
    # mse = 0.01 → psnr = -10 log10(0.01 + 1e-8) ≈ 20
    assert float(psnr(x, y)) == pytest.approx(20.0, abs=0.01)
    # identical images → capped by eps at 80
    assert float(psnr(x, x)) == pytest.approx(80.0, abs=0.1)
    per_sample = psnr(x, y, mean_flag=False)
    assert per_sample.shape == (2,)


def test_mse_score():
    x = jnp.zeros((2, 4, 4, 1))
    y = jnp.ones((2, 4, 4, 1))
    assert float(mse_score(x, y)) == pytest.approx(16.0)


def test_ssim_properties():
    rng = jax.random.key(0)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-4)
    noise = x + jax.random.normal(jax.random.key(1), x.shape) * 0.5
    assert float(ssim(x, jnp.clip(noise, 0, 1))) < 0.8
    per_sample = ssim(x, x, mean_flag=False)
    assert per_sample.shape == (2,)


def test_ssim_matches_torch_reference_formula():
    """Cross-validate against an independent torch implementation of the
    standard Gaussian-window SSIM (the reference's formulation,
    utils/metrics.py:47-109)."""
    import math

    import torch
    import torch.nn.functional as F

    def torch_ssim(a, b):
        ws, sigma, C = 11, 1.5, a.shape[1]
        g = torch.tensor([math.exp(-(i - ws // 2) ** 2 / (2 * sigma ** 2))
                          for i in range(ws)])
        g = (g / g.sum()).unsqueeze(1)
        win = (g @ g.t()).expand(C, 1, ws, ws).contiguous()
        mu1 = F.conv2d(a, win, padding=ws // 2, groups=C)
        mu2 = F.conv2d(b, win, padding=ws // 2, groups=C)
        s1 = F.conv2d(a * a, win, padding=ws // 2, groups=C) - mu1 ** 2
        s2 = F.conv2d(b * b, win, padding=ws // 2, groups=C) - mu2 ** 2
        s12 = F.conv2d(a * b, win, padding=ws // 2, groups=C) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
        return float(m.mean())

    rng = np.random.default_rng(0)
    a = rng.random((2, 24, 24, 3)).astype(np.float32)
    b = rng.random((2, 24, 24, 3)).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_ssim(torch.tensor(a).permute(0, 3, 1, 2),
                        torch.tensor(b).permute(0, 3, 1, 2))
    assert ours == pytest.approx(theirs, abs=1e-4)


def test_pred_ave_metrics_protocol():
    # two fake batches; predictor returns gt shifted by a constant
    batches = [{"past": np.zeros((2, 2, 8, 8, 1), np.float32),
                "future": np.full((2, 3, 8, 8, 1), 0.5, np.float32)}
               for _ in range(2)]

    def predict(batch):
        return batch["future"] + 0.1

    renorm = lambda x: x
    per_t = pred_ave_metrics(predict, batches, psnr, renorm, 3)
    assert per_t.shape == (3,)
    np.testing.assert_allclose(per_t, 20.0, atol=0.01)


def test_frechet_distance():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (500, 16))
    b = rng.normal(0, 1, (500, 16))
    near = frechet_distance(a, b)
    far = frechet_distance(a, rng.normal(3, 1, (500, 16)))
    assert near < 1.0
    assert far > 100.0


def test_preprocess_videos():
    vids = np.random.default_rng(0).random((2, 3, 32, 32, 1))
    out = preprocess_videos(vids)
    assert out.shape == (2, 3, 224, 224, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


@pytest.mark.slow
def test_i3d_architecture_shapes():
    fvd = FVD(dtype=jnp.float32).init_random()
    vids = np.random.default_rng(0).random((2, 16, 64, 64, 1), np.float32)
    feats = fvd.features(vids, batch_size=2)
    assert feats.shape == (2, 400)
    assert np.isfinite(feats).all()


def test_evaluate_streams_fvd_features(monkeypatch, tmp_path):
    """The evaluation loop accumulates I3D *features* batch-wise (never the
    raw frame sets — round-2 VERDICT item 7) and reports an FVD scalar.
    The I3D network is stubbed: this pins the streaming wiring, not I3D."""
    from npvp_tpu.core.config import Config
    from npvp_tpu.eval import evaluate as ev
    from npvp_tpu.eval import fvd as fvd_mod

    calls = {"n": 0, "sizes": []}

    class _StubFVD:
        def features(self, videos, batch_size=8):
            videos = np.asarray(videos)
            calls["n"] += 1
            calls["sizes"].append(videos.shape[0])
            rng = np.random.default_rng(videos.shape[0])
            return rng.standard_normal((videos.shape[0], 16)).astype(
                np.float32)

    monkeypatch.setattr(fvd_mod.FVD, "from_checkpoint",
                        classmethod(lambda cls, p: _StubFVD()))

    cfg = Config()
    p = cfg.Predictor
    p.embed_dim, p.num_heads = 64, 4
    p.transformer_layers, p.evt_former_num_layers = 2, 1
    p.dim_feedforward, p.evt_hidden_channels = 128, 32
    p.max_T = 15
    cfg.AE.ngf, cfg.AE.n_downsampling = 8, 3
    cfg.Dataset.name = "SMMNIST"
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_workers = 1
    cfg.validate()
    res = ev.evaluate(cfg, fvd_i3d_ckpt="stub", max_batches=2,
                      random_init=True, task="VFP")
    assert np.isfinite(res["FVD"])
    # one fake + one real featurization per batch — streamed, not one
    # concatenated call at the end
    assert calls["n"] == 4
    assert all(s == 2 for s in calls["sizes"])


def test_fused_clip_metrics_match_per_slice_path():
    """The single-dispatch fused metric kernel (renorm folded in) must equal
    the per-timestep host path it replaced."""
    from npvp_tpu.data.transforms import ReNormalize
    from npvp_tpu.eval.evaluate import _make_clip_metrics, _per_seq_metric

    rng = np.random.default_rng(7)
    pred = rng.standard_normal((2, 3, 16, 16, 1)).astype(np.float32)
    gt = pred + 0.1 * rng.standard_normal(pred.shape).astype(np.float32)
    renorm = ReNormalize(mean=0.5, std=0.25)
    fused = _make_clip_metrics(renorm)
    got = fused(pred, gt)
    for name, fn in (("PSNR", psnr), ("SSIM", ssim), ("MSE", mse_score)):
        want = np.stack(
            [_per_seq_metric(fn, jnp.asarray(renorm(pred[:, t])),
                             jnp.asarray(renorm(gt[:, t])))
             for t in range(pred.shape[1])], axis=1)
        np.testing.assert_allclose(got[name], want, rtol=2e-5, atol=2e-5,
                                   err_msg=name)


def test_evaluate_serving_modes():
    """evaluate(dtype=..., exec_mode=...) runs the protocol on the serving
    numerics (bf16 / int8) and reports the same metric keys as the fp32
    quality path — the instrument behind tools/exec_mode_fidelity.py."""
    import jax.numpy as jnp

    from npvp_tpu.core.config import Config
    from npvp_tpu.eval import evaluate as ev

    cfg = Config()
    p = cfg.Predictor
    p.embed_dim, p.num_heads = 64, 4
    p.transformer_layers, p.evt_former_num_layers = 1, 1
    p.dim_feedforward, p.evt_hidden_channels = 128, 32
    p.max_T = 15
    cfg.AE.ngf, cfg.AE.n_downsampling = 8, 3
    cfg.Dataset.name = "SMMNIST"
    cfg.Dataset.batch_size = 2
    cfg.Dataset.num_workers = 1
    cfg.validate()
    res = ev.evaluate(cfg, max_batches=1, random_init=True, task="VFP",
                      dtype=jnp.bfloat16, exec_mode="int8")
    assert np.isfinite(res["PSNR"]) and np.isfinite(res["SSIM"])
