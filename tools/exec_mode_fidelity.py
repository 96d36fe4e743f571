"""Serving-numerics fidelity on a TRAINED checkpoint.

DESIGN.md's execution-mode drift numbers (bf16+tanh ≈1.7% feature-space
drift, int8 ≈60 dB PSNR agreement) were measured on random weights; this
tool measures what a deployment decision actually needs: the evaluation
protocol's PSNR/SSIM (reference utils/metrics.py:111-140) for each serving
configuration of the *trained* model, against the fp32 parity path.

Modes: fp32 (quality path — dtype fp32, XLA), bf16 (serving dtype, XLA),
pallas (serving default — bf16 + fused per-site attention kernels), int8
(dynamic-quant serving matmuls). All modes share one checkpoint, one data
stream, and one latent draw seed, so metric deltas are numerics-only.

    python tools/exec_mode_fidelity.py --config_path <yaml> \
        [--modes fp32 bf16 pallas int8] [--task VFP] [--max_batches N] \
        [--out_dir results/<run>] [--override k=v ...]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

MODES = {
    "fp32": ("float32", None),
    "bf16": ("bfloat16", None),
    "pallas": ("bfloat16", "pallas"),
    "int8": ("bfloat16", "int8"),
}


def main(argv=None):
    import jax.numpy as jnp

    from npvp_tpu.eval.evaluate import evaluate
    from npvp_tpu.train.common import build_argparser, load_cli_config

    ap = build_argparser("serving exec-mode fidelity on a trained ckpt")
    ap.add_argument("--modes", nargs="+", default=list(MODES),
                    choices=list(MODES))
    ap.add_argument("--task", default="VFP")
    ap.add_argument("--num_samples", type=int, default=1)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--random_init", action="store_true")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args(argv)
    cfg = load_cli_config(args)

    run = pathlib.Path(cfg.Predictor.ckpt_save_dir).name
    out_dir = pathlib.Path(args.out_dir or f"results/{run}")
    out_dir.mkdir(parents=True, exist_ok=True)

    report = {"config": args.config_path, "run": run, "task": args.task,
              "num_samples": args.num_samples,
              "max_batches": args.max_batches, "modes": {}}
    for mode in args.modes:
        dtype_name, exec_mode = MODES[mode]
        t0 = time.time()
        res = evaluate(cfg, task=args.task, num_samples=args.num_samples,
                       max_batches=args.max_batches,
                       random_init=args.random_init,
                       dtype=jnp.dtype(dtype_name), exec_mode=exec_mode)
        row = {"PSNR": float(res["PSNR"]), "SSIM": float(res["SSIM"]),
               "MSE": float(res["MSE"]), "seconds": time.time() - t0}
        report["modes"][mode] = row
        print(f"{mode}: PSNR={row['PSNR']:.3f} SSIM={row['SSIM']:.4f} "
              f"({row['seconds']:.0f}s)", flush=True)

    ref = report["modes"].get("fp32")
    lines = [f"# Exec-mode fidelity — {run} ({args.task}, "
             f"best-of-{args.num_samples})", "",
             "| mode | PSNR (dB) | ΔPSNR vs fp32 | SSIM | ΔSSIM |",
             "|---|---|---|---|---|"]
    for mode, row in report["modes"].items():
        dp = f"{row['PSNR'] - ref['PSNR']:+.3f}" if ref else "—"
        ds = f"{row['SSIM'] - ref['SSIM']:+.4f}" if ref else "—"
        lines.append(f"| {mode} | {row['PSNR']:.3f} | {dp} | "
                     f"{row['SSIM']:.4f} | {ds} |")
    (out_dir / "exec_mode_fidelity.json").write_text(
        json.dumps(report, indent=2))
    (out_dir / "exec_mode_fidelity.md").write_text("\n".join(lines) + "\n")
    print(f"wrote {out_dir}/exec_mode_fidelity.{{json,md}}")


if __name__ == "__main__":
    main(sys.argv[1:])
