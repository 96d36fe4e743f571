"""Measure the sliding-window protocol's quality cost on a trained model.

Round-2 VERDICT item 5: ``VideoPredictor.vfp_windowed`` re-bases each
window's time origin, justified by a translation-equivariance argument
(training samples every clip position). This tool replaces the argument with
a number: on a horizon that fits max_T *directly* (SM-MNIST 5→10 with
max_T=15), it evaluates VFP both ways —

  direct    — one in-range window, target times 5..14
  windowed  — forced through two re-based 5-frame windows
              (``vfp_windowed(chunk=5)``): predictions of times 5..9 become
              the re-based context for times 10..14

and reports per-timestep PSNR/SSIM for both, i.e. an upper bound on what the
KTH 10→20 protocol (which has no in-range alternative — the reference
asserts t ≤ max_T, models/submodules.py:349-351) pays per extra window.

Usage:
    python tools/window_drift.py --config_path <yaml> [--max_batches N]
        [--out <json>] [--override k=v ...]
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from npvp_tpu.train.common import build_argparser, load_cli_config

    ap = build_argparser("sliding-window drift measurement")
    ap.add_argument("--max_batches", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from npvp_tpu.data.loader import DataModule
    from npvp_tpu.eval.evaluate import _make_clip_metrics
    from npvp_tpu.models.inference import VideoPredictor

    cfg = load_cli_config(args)
    dm = DataModule(cfg)
    vp = VideoPredictor.from_checkpoints(
        cfg, cfg.Predictor.resume_AE_ckpt, cfg.Predictor.ckpt_save_dir,
        dtype=jnp.float32)  # quality path: fp32 parity math

    P = cfg.Dataset.test_num_past_frames
    F = cfg.Dataset.test_num_future_frames
    assert P + F <= cfg.Predictor.max_T, (
        "direct path must be in-range for the comparison")

    sums = {k: np.zeros(F) for k in
            ("PSNR_direct", "PSNR_windowed", "SSIM_direct", "SSIM_windowed")}
    count = 0
    rng0 = jax.random.key(cfg.Env.rand_seed)
    clip_metrics = _make_clip_metrics(dm.renorm)  # one dispatch per clip
    assert clip_metrics is not None, "dataset renorm is not affine"
    for bi, batch in enumerate(dm.test_loader()):
        if bi >= args.max_batches:
            break
        past = jnp.asarray(batch["past"])
        gt = np.asarray(batch["future"], np.float32)
        rng = jax.random.fold_in(rng0, bi)
        direct = np.asarray(vp.vfp(past, F, rng=rng), np.float32)
        windowed = np.asarray(
            vp.vfp_windowed(past, F, rng=rng, chunk=max(1, F // 2)),
            np.float32)
        for name, pred in (("direct", direct), ("windowed", windowed)):
            per = clip_metrics(pred, gt)
            sums[f"PSNR_{name}"] += per["PSNR"].sum(axis=0)
            sums[f"SSIM_{name}"] += per["SSIM"].sum(axis=0)
        count += direct.shape[0]
        print(f"batch {bi}: n={count}", flush=True)

    results = {k: (v / max(count, 1)).tolist() for k, v in sums.items()}
    results["n_sequences"] = count
    results["PSNR_drift_mean"] = float(
        np.mean(np.array(results["PSNR_direct"])
                - np.array(results["PSNR_windowed"])))
    results["SSIM_drift_mean"] = float(
        np.mean(np.array(results["SSIM_direct"])
                - np.array(results["SSIM_windowed"])))
    # the drift that matters: the SECOND window's frames (re-based context)
    h = F // 2
    results["PSNR_drift_second_window"] = float(
        np.mean(np.array(results["PSNR_direct"][h:])
                - np.array(results["PSNR_windowed"][h:])))
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        pathlib.Path(args.out).write_text(text)


if __name__ == "__main__":
    main()
