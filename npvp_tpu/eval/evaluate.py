"""Evaluation CLI: per-timestep PSNR/SSIM/MSE (+FVD) on a test set.

The offline evaluation entry point the reference keeps in a notebook
(reference Inference.ipynb cells 1-4 + utils/metrics.py:111-140): loads the
two-stage checkpoints, runs the chosen task over the test loader, and reports
the per-future-timestep metric protocol.

Tasks (coordinate choices only — reference Inference.ipynb cell 4):

- **VFP** (default): observe the test past frames, predict the full test
  future horizon. Horizons beyond ``max_T`` (e.g. the KTH 10→20 protocol,
  BASELINE.md) run the sliding-window decomposition — the reference asserts
  t ≤ max_T (models/submodules.py:349-351), so re-based windows are the only
  in-range realization of the protocol.
- **VPE / VFI / VRC / HVRC**: evaluated on the leading ``max_T``-frame
  segment of each test clip, mirroring the notebook's constructions (which
  never query beyond max_T). HVRC's fractional-time targets have no ground
  truth; its metrics cover the integer targets only.

Stochastic models (NPVP-S) support the standard best-of-N protocol
(``--num_samples N``): N latent draws per sequence, the best per-sequence
sample selected independently per metric, as in SVG/SAVP-style evaluation.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from npvp_tpu.core.config import Config
from npvp_tpu.data.loader import DataModule
from npvp_tpu.eval.metrics import mse_score, psnr, ssim
from npvp_tpu.models.inference import VideoPredictor
from npvp_tpu.train.common import build_argparser, load_cli_config

TASKS = ("VFP", "VPE", "VFI", "VRC", "HVRC")


def _task_split(task: str, cfg: Config, seed: int = 0):
    """(to_list, tp_list, metric_tp_indices) for the non-VFP tasks on the
    leading max_T-frame segment. ``metric_tp_indices`` selects the targets
    that have ground truth (integer times)."""
    p, d = cfg.Predictor, cfg.Dataset
    S = p.max_T
    P = min(d.test_num_past_frames, S - 1)
    if task == "VPE":
        to = np.arange(S - P, S, dtype=np.float32)
        tp = np.arange(S - P, dtype=np.float32)
    elif task == "VFI":
        cp, cf = (P + 1) // 2, P // 2
        to = np.concatenate([np.arange(cp), np.arange(S - cf, S)]
                            ).astype(np.float32)
        tp = np.arange(cp, S - cf, dtype=np.float32)
    elif task == "VRC":
        perm = np.random.default_rng(seed).permutation(S)
        to = np.sort(perm[:P]).astype(np.float32)
        tp = np.sort(perm[P:]).astype(np.float32)
    elif task == "HVRC":
        perm = np.random.default_rng(seed).permutation(S)
        to = np.sort(perm[:P]).astype(np.float32)
        ints = np.sort(perm[P:]).astype(np.float32)
        halves = (ints[:-1] + 0.5)[ints[:-1] + 0.5 <= S]
        tp = np.sort(np.concatenate([ints, halves.astype(np.float32)]))
    else:
        raise ValueError(f"unknown task {task!r}")
    metric_idx = np.where(tp == np.round(tp))[0]
    return to, tp, metric_idx


def _per_seq_metric(metric, pred_t, gt_t):
    # psnr/ssim/mse_score share the mean_flag=False per-sequence signature
    return np.asarray(metric(pred_t, gt_t, mean_flag=False))


def _make_clip_metrics(renorm):
    """One jitted dispatch computing per-sequence per-timestep PSNR/SSIM/MSE
    for a whole (N, T, H, W, C) model-space clip pair, with the affine
    renormalization folded in. Replaces 3·T small device round-trips per
    clip — each pays 10-45 ms through the TPU tunnel, which dominates
    full-test-set evaluation wall time. Returns None for a non-affine
    renormalizer (caller falls back to the per-slice host path)."""
    from npvp_tpu.data.transforms import ReNormalize

    if not isinstance(renorm, ReNormalize):
        return None
    mean = jnp.asarray(renorm.mean, jnp.float32)
    std = jnp.asarray(renorm.std, jnp.float32)

    @jax.jit
    def clip_metrics(pred, gt):
        def one_t(pt, gt_t):
            p = jnp.clip(pt * std + mean, 0.0, 1.0)
            g = jnp.clip(gt_t * std + mean, 0.0, 1.0)
            return (psnr(p, g, mean_flag=False),
                    ssim(p, g, mean_flag=False),
                    mse_score(p, g, mean_flag=False))

        return jax.vmap(one_t, in_axes=1, out_axes=1)(
            pred.astype(jnp.float32), gt.astype(jnp.float32))

    def compute(pred, gt):
        P, S, M = clip_metrics(jnp.asarray(pred), jnp.asarray(gt))
        return {"PSNR": np.asarray(P), "SSIM": np.asarray(S),
                "MSE": np.asarray(M)}

    return compute


def evaluate(cfg: Config, fvd_i3d_ckpt: str | None = None,
             max_batches: int | None = None, random_init: bool = False,
             task: str = "VFP", num_samples: int = 1,
             baseline: bool = False, gif_dir: str | None = None,
             gif_sequences: int = 4, ae_ceiling: bool = False,
             dtype=jnp.float32, exec_mode: str | None = None) -> dict:
    """``baseline=True`` adds a copy-nearest-observed-frame row
    (``<metric>_baseline``) — the trivial predictor every learned model must
    clearly beat for a quality table to mean anything. ``gif_dir`` writes
    GT|prediction side-by-side GIFs (PSNR-best latent draw) for the first
    ``gif_sequences`` sequences of the first batch (the reference's visual
    artifact, utils/train_summary.py:233-271). ``ae_ceiling=True`` adds the
    frozen-AE ground-truth reconstruction row (``<metric>_ae_ceiling``) —
    the predictor emits AE features, so this is its quality ceiling.

    ``dtype``/``exec_mode`` default to the fp32 parity path (bit-exact vs
    the reference computation — tests/test_converter.py); passing the
    serving configurations (bf16 / "pallas" / "int8") instead measures the
    deployed numerics' quality on the same protocol
    (tools/exec_mode_fidelity.py)."""
    assert task in TASKS, task
    dm = DataModule(cfg, jax.process_index(), jax.process_count())
    d, p = cfg.Dataset, cfg.Predictor
    if random_init:
        vp = VideoPredictor.from_random_init(cfg, dtype=dtype,
                                             exec_mode=exec_mode)
    else:
        vp = VideoPredictor.from_checkpoints(
            cfg, cfg.Predictor.resume_AE_ckpt, cfg.Predictor.ckpt_save_dir,
            dtype=dtype, exec_mode=exec_mode)

    if not p.stochastic:
        num_samples = 1

    if task == "VFP":
        num_future = d.test_num_future_frames
        metric_idx = np.arange(num_future)
        obs_t = np.arange(d.test_num_past_frames, dtype=np.float32)
        tgt_t = d.test_num_past_frames + np.arange(num_future,
                                                   dtype=np.float32)

        def predict_and_gt(batch, rng):
            pred = vp.vfp(jnp.asarray(batch["past"]), num_future, rng)
            return pred, np.asarray(batch["future"], np.float32)

        def observed(batch):
            return np.asarray(batch["past"], np.float32)
    else:
        clip_len = d.test_num_past_frames + d.test_num_future_frames
        if clip_len < p.max_T:
            raise ValueError(
                f"task {task} evaluates the leading max_T={p.max_T} frames "
                f"but test clips are only {clip_len} long; increase "
                "Dataset.test_num_{past,future}_frames")
        to, tp, metric_idx = _task_split(task, cfg, seed=cfg.Env.rand_seed)
        obs_t, tgt_t = to, tp[metric_idx]

        def predict_and_gt(batch, rng):
            clip = np.concatenate([batch["past"], batch["future"]],
                                  axis=1)[:, :p.max_T]
            pred = vp.predict(jnp.asarray(clip[:, to.astype(int)]), to, tp,
                              rng)
            gt = clip[:, tp[metric_idx].astype(int)].astype(np.float32)
            return pred, gt

        def observed(batch):
            clip = np.concatenate([batch["past"], batch["future"]],
                                  axis=1)[:, :p.max_T]
            return clip[:, to.astype(int)].astype(np.float32)

    # copy-nearest-observed-frame baseline: for each target time, repeat the
    # closest observed frame
    nearest = np.argmin(np.abs(np.asarray(obs_t)[None, :]
                               - np.asarray(tgt_t)[:, None]), axis=1)

    # stream the test loader — the BAIR 2→28 / Cityscapes 128² protocols
    # don't fit materialized in host RAM (round-2 verdict item 7)
    loader = dm.test_loader()
    if max_batches is not None:
        import itertools

        loader = itertools.islice(iter(loader), max_batches)

    T_m = len(metric_idx)
    metric_fns = {"PSNR": psnr, "SSIM": ssim, "MSE": mse_score}
    higher_better = {"PSNR": True, "SSIM": True, "MSE": False}
    fused_metrics = _make_clip_metrics(dm.renorm)

    def per_clip(pred, gt):
        """(N, T_m) per-sequence scores for every metric, model-space in."""
        if fused_metrics is not None:
            return fused_metrics(pred, gt)
        out = {}
        frames_t = [(jnp.asarray(dm.renorm(pred[:, t])),
                     jnp.asarray(dm.renorm(gt[:, t]))) for t in range(T_m)]
        for name, fn in metric_fns.items():
            out[name] = np.stack([_per_seq_metric(fn, pt, gt_t)
                                  for pt, gt_t in frames_t], axis=1)
        return out
    totals = {k: np.zeros(T_m) for k in metric_fns}
    base_totals = {k: np.zeros(T_m) for k in metric_fns} if baseline else None
    ceil_totals = {k: np.zeros(T_m) for k in metric_fns} if ae_ceiling else None
    count = 0
    fvd = None
    fake_feats, real_feats = [], []  # (N, 400) I3D features per batch
    if fvd_i3d_ckpt is not None:
        from npvp_tpu.eval.fvd import FVD

        fvd = FVD.from_checkpoint(fvd_i3d_ckpt)
    base_rng = jax.random.key(cfg.Env.rand_seed)
    for bi, batch in enumerate(loader):
        # scores[s][name]: (N, T_m) per-sequence per-timestep values
        scores = []
        first_preds = [] if (gif_dir is not None and bi == 0) else None
        for s in range(num_samples):
            rng = jax.random.fold_in(jax.random.fold_in(base_rng, bi), s)
            pred, gt = predict_and_gt(batch, rng)
            pred = np.asarray(pred, np.float32)[:, metric_idx]
            if first_preds is not None:
                first_preds.append(pred)
            if s == 0 and fvd is not None:
                # accumulate 400-d I3D features batch-wise (one latent draw
                # per sequence) — never the raw frames
                fake_feats.append(fvd.features(dm.renorm(pred)))
                real_feats.append(fvd.features(dm.renorm(gt)))
            scores.append(per_clip(pred, gt))
        n = scores[0]["PSNR"].shape[0]
        best_by_metric = {}
        for name in metric_fns:
            stacked = np.stack([s[name] for s in scores])  # (S, N, T)
            seq_mean = stacked.mean(axis=2)                # (S, N)
            best = (np.argmax(seq_mean, axis=0) if higher_better[name]
                    else np.argmin(seq_mean, axis=0))      # (N,)
            best_by_metric[name] = best
            chosen = stacked[best, np.arange(n)]           # (N, T)
            totals[name] += chosen.sum(axis=0)
        if first_preds is not None:
            from npvp_tpu.core.metrics import save_clip_gifs

            stack = np.stack(first_preds)                  # (S, N, T, ...)
            best = best_by_metric["PSNR"]
            for i in range(min(gif_sequences, n)):
                save_clip_gifs(
                    Path(gif_dir) / f"{task}_seq{i}.gif",
                    {"gt": gt[i], "pred": stack[best[i], i]},
                    renorm=dm.renorm)
        if baseline:
            # copy-nearest-observed baseline vs the same GT
            base_clip = observed(batch)[:, nearest]        # (N, T_m, ...)
            for name, v in per_clip(base_clip, gt).items():
                base_totals[name] += v.sum(axis=0)
        if ae_ceiling:
            rec = np.asarray(vp.reconstruct(gt), np.float32)
            for name, v in per_clip(rec, gt).items():
                ceil_totals[name] += v.sum(axis=0)
        count += n

    results = {"task": task, "num_samples": num_samples}
    for name in metric_fns:
        per_t = totals[name] / max(count, 1)
        results[f"{name}_per_t"] = per_t.tolist()
        results[name] = float(per_t.mean())
    if baseline:
        for name in metric_fns:
            per_t = base_totals[name] / max(count, 1)
            results[f"{name}_baseline_per_t"] = per_t.tolist()
            results[f"{name}_baseline"] = float(per_t.mean())
    if ae_ceiling:
        for name in metric_fns:
            per_t = ceil_totals[name] / max(count, 1)
            results[f"{name}_ae_ceiling_per_t"] = per_t.tolist()
            results[f"{name}_ae_ceiling"] = float(per_t.mean())

    if fvd is not None:
        from npvp_tpu.eval.fvd import frechet_distance

        results["FVD"] = frechet_distance(np.concatenate(fake_feats),
                                          np.concatenate(real_feats))
    return results


def main(argv=None):
    parser = build_argparser("NPVP-TPU evaluation")
    parser.add_argument("--task", type=str, default="VFP", choices=TASKS)
    parser.add_argument("--num_samples", type=int, default=1,
                        help="best-of-N latent draws (NPVP-S only)")
    parser.add_argument("--i3d_ckpt", type=str, default=None,
                        help="converted I3D weights (.pkl) for FVD")
    parser.add_argument("--baseline", action="store_true",
                        help="add copy-nearest-observed-frame metric rows")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)
    cfg = load_cli_config(args)
    results = evaluate(cfg, args.i3d_ckpt, args.max_batches, task=args.task,
                       num_samples=args.num_samples, baseline=args.baseline)
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main(sys.argv[1:])
