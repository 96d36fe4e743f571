"""Evaluation CLI: per-timestep PSNR/SSIM/MSE (+FVD) on a test set.

The offline evaluation entry point the reference keeps in a notebook
(reference Inference.ipynb + utils/metrics.py:111-140): loads the two-stage
checkpoints, runs the configured task over the test loader, and reports the
per-future-timestep metric protocol.
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
from npvp_tpu.eval.metrics import mse_score, pred_ave_metrics, psnr, ssim
from npvp_tpu.models.inference import VideoPredictor
from npvp_tpu.train.common import build_argparser, load_cli_config


def evaluate(cfg: Config, fvd_i3d_ckpt: str | None = None,
             max_batches: int | None = None, random_init: bool = False
             ) -> dict:
    dm = DataModule(cfg, jax.process_index(), jax.process_count())
    d = cfg.Dataset
    # quality evaluation runs the fp32 parity path (bit-exact vs the
    # reference computation — tests/test_converter.py); bf16+tanh-GELU is
    # the serving path
    if random_init:
        vp = VideoPredictor.from_random_init(cfg, dtype=jnp.float32)
    else:
        vp = VideoPredictor.from_checkpoints(
            cfg, cfg.Predictor.resume_AE_ckpt, cfg.Predictor.ckpt_save_dir,
            dtype=jnp.float32)

    num_past = d.test_num_past_frames
    num_future = d.test_num_future_frames

    def predict(batch):
        return vp.vfp(jnp.asarray(batch["past"]), num_future)

    loader = list(dm.test_loader())
    if max_batches is not None:
        loader = loader[:max_batches]

    results = {}
    for name, fn in (("PSNR", psnr), ("SSIM", ssim), ("MSE", mse_score)):
        per_t = pred_ave_metrics(predict, loader, fn, dm.renorm, num_future)
        results[f"{name}_per_t"] = per_t.tolist()
        results[name] = float(per_t.mean())

    if fvd_i3d_ckpt is not None:
        from npvp_tpu.eval.fvd import FVD

        fvd = FVD.from_checkpoint(fvd_i3d_ckpt)
        fakes, reals = [], []
        for batch in loader:
            fakes.append(dm.renorm(np.asarray(predict(batch))))
            reals.append(dm.renorm(np.asarray(batch["future"])))
        results["FVD"] = fvd(np.concatenate(fakes), np.concatenate(reals))
    return results


def main(argv=None):
    parser = build_argparser("NPVP-TPU evaluation")
    parser.add_argument("--i3d_ckpt", type=str, default=None,
                        help="converted I3D weights (.pkl) for FVD")
    parser.add_argument("--max_batches", type=int, default=None)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args(argv)
    cfg = load_cli_config(args)
    results = evaluate(cfg, args.i3d_ckpt, args.max_batches)
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text)


if __name__ == "__main__":
    main(sys.argv[1:])
