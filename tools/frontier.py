"""Speed/quality frontier: serving-time depth reduction on trained weights.

Round-4 VERDICT next-4: the ≥10× throughput question must be answered with
a measured frontier, not an exact-parity speed-of-light argument. The
North-star tolerance is PSNR/SSIM *parity*, which admits architecture
changes at serving time. The cheapest family of such changes needs no
retraining at all: run only the first K of the trained decoder's 8 NAR
blocks (early exit — flax ignores the unused ``layer_{K..7}`` params when
a truncated module consumes the full checkpoint) and/or the first K of
the 4 EVT-former blocks, keeping the shared final norm.

For each variant this tool measures, on the real chip, in ONE process:

- throughput: the bench.py serving protocol (batch 64, the config's own
  VFP task — SMMNIST 5→10,
  ``freeze_task``, bf16 + pallas), INTERLEAVED round-robin across
  variants (the chip is shared — only within-process interleaved ratios
  support decisions, CLAUDE.md), reporting per-variant min block time and
  the per-round speedup ratio vs 'full';
- quality: the five-task protocol (npvp_tpu.eval.evaluate, fp32 parity
  path, copy baseline on the full variant) with ``--max_batches``
  bounding the set, reporting per-task PSNR/SSIM deltas vs 'full'.

Usage (chip-yield aware — wrap in tools/chip_lock_run.sh while a
supervised trainer is running):

    tools/chip_lock_run.sh python tools/frontier.py \
        --config_path npvp_tpu/configs/config_SMMNIST_Unified_NPVP-D.yaml \
        --override Predictor.ckpt_save_dir=results/.../weights.npz \
          Predictor.resume_AE_ckpt=results/.../weights_stage1.npz \
        --variants full L6 L4 L4evt2 --quality --max_batches 10 \
        --out_dir results/SMMNIST_Unified_NPVP-D
"""

import argparse
import copy
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# variant name -> Predictor config mutations (depth knobs only: the same
# trained npz serves every variant)
VARIANTS = {
    "full": {},
    "L6": {"transformer_layers": 6},
    "L4": {"transformer_layers": 4},
    "L2": {"transformer_layers": 2},
    "evt2": {"evt_former_num_layers": 2},
    "L6evt2": {"transformer_layers": 6, "evt_former_num_layers": 2},
    "L4evt2": {"transformer_layers": 4, "evt_former_num_layers": 2},
    "L2evt1": {"transformer_layers": 2, "evt_former_num_layers": 1},
}


def variant_cfg(cfg, name):
    c = copy.deepcopy(cfg)
    for k, v in VARIANTS[name].items():
        setattr(c.Predictor, k, v)
    return c.validate()


def bench_variants(cfg, names, blocks=6, n=20):
    """Interleaved serving throughput (predicted frames/s) per variant."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from npvp_tpu.models.inference import VideoPredictor

    d = cfg.Dataset
    npz = str(cfg.Predictor.ckpt_save_dir)
    # the trained config's own VFP task (SMMNIST: 5 observed -> 10
    # predicted, max_T=15 — NOT bench.py's KTH 10->10 flagship shape, whose
    # coordinates would violate this config's max_T bound)
    n_past, n_fut = d.test_num_past_frames, d.test_num_future_frames
    obs_t, tgt_t = np.arange(n_past), np.arange(n_past, n_past + n_fut)
    preds = {}
    for name in names:
        vp = VideoPredictor.from_weights(variant_cfg(cfg, name), npz,
                                         dtype=jnp.bfloat16,
                                         exec_mode="pallas")
        preds[name] = vp.freeze_task(obs_t, tgt_t)
    batch = 64
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, n_past, d.img_size, d.img_size, d.img_channels), np.float32))
    key = jax.random.key(0)
    for name in names:   # compile/warm every variant before any timing
        np.asarray(preds[name](frames, key))
        print(f"[frontier] {name} compiled", file=sys.stderr, flush=True)

    times = {name: [] for name in names}
    for r in range(blocks):
        for name in names:   # round-robin: each round samples every variant
            t0 = time.perf_counter()
            for i in range(n):
                out = preds[name](frames, jax.random.fold_in(key, r * n + i))
            np.asarray(out[0, 0, 0, 0])   # host fetch fences the tunnel
            times[name].append((time.perf_counter() - t0) / n)
    res = {}
    for name in names:
        # ratio computed within each round: same-moment chip conditions
        per_round = [times[names[0]][r] / times[name][r]
                     for r in range(blocks)]
        sec = float(np.min(times[name]))
        res[name] = {
            "sec_per_batch_min": sec,
            "fps": batch * len(tgt_t) / sec,
            "speedup_vs_full_median": float(np.median(per_round)),
            "speedup_vs_full_rounds": [round(x, 3) for x in per_round],
        }
    return res


def quality_variants(cfg, names, tasks, max_batches, num_samples,
                     cache_path=None):
    """``cache_path``: completed (variant, task) cells persist there after
    every eval and are skipped on relaunch — the axon tunnel flaps for
    hours at a time (rounds 3 and 5), and a 25-cell pass must not restart
    from zero each flap."""
    from npvp_tpu.eval.evaluate import evaluate

    res = {}
    if cache_path and cache_path.exists():
        res = json.loads(cache_path.read_text())
        done = sum(len(v) for v in res.values())
        print(f"[frontier] resuming quality pass: {done} cached cell(s)",
              file=sys.stderr, flush=True)
    for name in names:
        c = variant_cfg(cfg, name)
        res.setdefault(name, {})
        for task in tasks:
            if task in res[name]:
                continue
            r = evaluate(c, max_batches=max_batches, task=task,
                         num_samples=num_samples,
                         baseline=(name == names[0]))
            res[name][task] = {k: r[k] for k in
                               ("PSNR", "SSIM", "MSE") if k in r}
            if name == names[0]:
                for k in ("PSNR_baseline", "SSIM_baseline"):
                    if k in r:
                        res[name][task][k] = r[k]
            if cache_path:
                cache_path.write_text(json.dumps(res, indent=1))
            print(f"[frontier] {name} {task}: "
                  f"PSNR {r['PSNR']:.2f} SSIM {r['SSIM']:.4f}",
                  file=sys.stderr, flush=True)
    return res


def to_markdown(rep):
    names = rep["variants"]
    lines = ["# Serving depth/quality frontier", "",
             f"config `{rep['config']}` · weights "
             f"`{rep['weights']}` · protocol: fps = batch-64 config VFP task "
             "freeze_task bf16+pallas, interleaved round-robin "
             f"({rep.get('fps_blocks', 0)} rounds); quality = fp32 parity "
             f"path, max_batches={rep.get('max_batches')}, best-of-"
             f"{rep.get('num_samples')} latent samples", ""]
    fps = rep.get("fps") or {}
    qual = rep.get("quality") or {}
    tasks = rep.get("tasks", [])
    hdr = "| variant | layers | fps | speedup |"
    sep = "|---|---|---|---|"
    for t in tasks:
        hdr += f" {t} PSNR | Δ |"
        sep += "---|---|"
    lines += [hdr, sep]
    for name in names:
        muts = VARIANTS[name]
        depth = (f"{muts.get('transformer_layers', 8)}+"
                 f"{muts.get('evt_former_num_layers', 4)}")
        f = fps.get(name, {})
        row = (f"| {name} | {depth} | {f.get('fps', float('nan')):.0f} | "
               f"{f.get('speedup_vs_full_median', float('nan')):.2f}× |")
        for t in tasks:
            q = qual.get(name, {}).get(t, {})
            q0 = qual.get(names[0], {}).get(t, {})
            p = q.get("PSNR", float("nan"))
            dp = p - q0.get("PSNR", float("nan"))
            row += f" {p:.2f} | {dp:+.2f} |"
        lines.append(row)
    if qual:
        base = qual.get(names[0], {})
        brow = [f"{t}: {base.get(t, {}).get('PSNR_baseline', float('nan')):.2f}"
                for t in tasks]
        lines += ["", "Copy-nearest-observed-frame baseline PSNR — "
                  + ", ".join(brow) + ". A variant whose PSNR approaches "
                  "the baseline has stopped modeling dynamics."]
    return "\n".join(lines) + "\n"


def main(argv=None):
    from npvp_tpu.train.common import build_argparser, load_cli_config

    ap = build_argparser("serving depth/quality frontier")
    ap.add_argument("--variants", nargs="+", default=["full", "L6", "L4"],
                    choices=list(VARIANTS))
    ap.add_argument("--fps_blocks", type=int, default=6)
    ap.add_argument("--no_fps", action="store_true")
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--tasks", nargs="+",
                    default=["VFP", "VPE", "VFI", "VRC", "HVRC"])
    ap.add_argument("--max_batches", type=int, default=10)
    ap.add_argument("--num_samples", type=int, default=1)
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args(argv)
    cfg = load_cli_config(args)
    names = args.variants
    if names[0] != "full":
        names = ["full"] + [n for n in names if n != "full"]

    rep = {"config": args.config_path,
           "weights": str(cfg.Predictor.ckpt_save_dir),
           "variants": names, "tasks": args.tasks if args.quality else [],
           "max_batches": args.max_batches, "num_samples": args.num_samples,
           "fps_blocks": args.fps_blocks}
    out_dir = pathlib.Path(args.out_dir or "results")
    out_dir.mkdir(parents=True, exist_ok=True)
    if not args.no_fps:
        rep["fps"] = bench_variants(cfg, names, blocks=args.fps_blocks)
    if args.quality:
        rep["quality"] = quality_variants(
            cfg, names, args.tasks, args.max_batches, args.num_samples,
            cache_path=out_dir / "frontier_quality_partial.json")
    (out_dir / "frontier.json").write_text(json.dumps(rep, indent=1))
    (out_dir / "frontier.md").write_text(to_markdown(rep))
    print(f"wrote {out_dir}/frontier.json and frontier.md")


if __name__ == "__main__":
    main()
