"""Five-task quality report for a trained checkpoint (round-3 VERDICT #1).

Runs the full evaluation protocol (reference utils/metrics.py:111-140 via
npvp_tpu.eval.evaluate) for every task on the checkpoint named by the
config, with best-of-N latent sampling for stochastic models and the
copy-nearest-observed-frame baseline rows, and writes one JSON + one
markdown table under ``results/<run-name>/``.

Usage:
    python tools/quality_report.py [--config_path <yaml>] [--num_samples N]
        [--max_batches N] [--tasks VFP VPE ...] [--random_init]
        [--override k=v ...]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    from npvp_tpu.eval.evaluate import TASKS, evaluate
    from npvp_tpu.train.common import build_argparser, load_cli_config

    ap = build_argparser("five-task quality report")
    ap.add_argument("--tasks", nargs="+", default=list(TASKS))
    ap.add_argument("--num_samples", type=int, default=5)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--random_init", action="store_true")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args(argv)
    cfg = load_cli_config(args)

    run = pathlib.Path(cfg.Predictor.ckpt_save_dir).name
    out_dir = pathlib.Path(args.out_dir or f"results/{run}")
    out_dir.mkdir(parents=True, exist_ok=True)

    report = {"config": args.config_path, "run": run,
              "num_samples": args.num_samples,
              "random_init": bool(args.random_init),
              "max_batches": args.max_batches, "tasks": {}}
    for task in args.tasks:
        t0 = time.time()
        res = evaluate(cfg, max_batches=args.max_batches,
                       random_init=args.random_init, task=task,
                       num_samples=args.num_samples, baseline=True,
                       gif_dir=str(out_dir / "gifs"), ae_ceiling=True)
        res["eval_wall_s"] = round(time.time() - t0, 1)
        report["tasks"][task] = res
        print(f"{task}: PSNR {res['PSNR']:.2f} (baseline "
              f"{res.get('PSNR_baseline', float('nan')):.2f})  SSIM "
              f"{res['SSIM']:.4f} (baseline "
              f"{res.get('SSIM_baseline', float('nan')):.4f})", flush=True)

    (out_dir / "quality.json").write_text(json.dumps(report, indent=2))

    lines = [
        f"# Quality report — {run}",
        "",
        f"config `{args.config_path}` · best-of-{args.num_samples} latent "
        f"samples · base = copy nearest observed frame · ceil = frozen-AE "
        f"GT reconstruction (the predictor's quality ceiling)"
        + (" · **RANDOM INIT (no training)**" if args.random_init else ""),
        "",
        "| task | PSNR | PSNR base | PSNR ceil | SSIM | SSIM base "
        "| SSIM ceil | MSE | MSE base |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for task, r in report["tasks"].items():
        lines.append(
            f"| {task} | {r['PSNR']:.2f} | "
            f"{r.get('PSNR_baseline', float('nan')):.2f} | "
            f"{r.get('PSNR_ae_ceiling', float('nan')):.2f} | "
            f"{r['SSIM']:.4f} | {r.get('SSIM_baseline', float('nan')):.4f} |"
            f" {r.get('SSIM_ae_ceiling', float('nan')):.4f} |"
            f" {r['MSE']:.5f} | {r.get('MSE_baseline', float('nan')):.5f} |")
    for task, r in report["tasks"].items():
        per_t = r.get("PSNR_per_t")
        if per_t:
            lines += ["", f"## {task} per-timestep PSNR", "",
                      "| t | PSNR | baseline |", "|---|---|---|"]
            base = r.get("PSNR_baseline_per_t") or [float("nan")] * len(per_t)
            for i, (a, b) in enumerate(zip(per_t, base)):
                lines.append(f"| {i} | {a:.2f} | {b:.2f} |")
    (out_dir / "quality.md").write_text("\n".join(lines) + "\n")
    print(f"wrote {out_dir}/quality.json and quality.md")


if __name__ == "__main__":
    main()
