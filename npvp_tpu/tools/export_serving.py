"""Export a trained model to a self-contained serving bundle.

CLI front-end for :meth:`VideoPredictor.export_task`: loads the stage-1/
stage-2 checkpoints named by the config, specializes the serving program to
one task shape (coordinates as compile-time constants — the headline-speed
path), lowers it for the requested platforms via ``jax.export`` (a CPU host
can produce a TPU artifact), and writes ``program.jaxexport`` +
``variables.pkl`` + ``meta.json``. Serve with::

    from npvp_tpu.models.inference import VideoPredictor
    fn = VideoPredictor.serve_exported("bundle_dir")   # no model code needed
    pred = fn(observed_frames)                          # (N, TP, H, W, C)

The reference has no serving-export story (its deployment unit is the
Lightning checkpoint + the full model source, Inference.ipynb cell 1);
this is the TPU-native equivalent of a compiled model server artifact.

Example::

    python -m npvp_tpu.tools.export_serving \
        --config_path npvp_tpu/configs/config_SMMNIST_Unified_NPVP-S.yaml \
        --task VFP --batch_size 8 --out bundles/smmnist_vfp
"""

from __future__ import annotations

import sys

import numpy as np

from npvp_tpu.models.coords import task_time_lists
from npvp_tpu.models.inference import VideoPredictor
from npvp_tpu.train.common import build_argparser, load_cli_config


def main(argv=None):
    parser = build_argparser("NPVP-TPU serving-bundle export")
    parser.add_argument("--task", default="VFP",
                        help="VFP | VPE | VFI (canonical index lists), or "
                             "use --to_list/--tp_list for arbitrary times")
    parser.add_argument("--to_list", nargs="*", type=float, default=None,
                        help="observed times (overrides --task)")
    parser.add_argument("--tp_list", nargs="*", type=float, default=None,
                        help="target times (overrides --task)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--platforms", nargs="*", default=["cpu", "tpu"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--random_init", action="store_true",
                        help="random weights (artifact-format smoke only)")
    args = parser.parse_args(argv)
    cfg = load_cli_config(args)

    if (args.to_list is None) != (args.tp_list is None):
        parser.error("--to_list and --tp_list must be given together")
    if args.to_list is not None:
        to_list, tp_list = args.to_list, args.tp_list
    else:
        d = cfg.Dataset
        to, tp = task_time_lists(args.task, d.test_num_past_frames,
                                 d.test_num_future_frames,
                                 context_p=d.test_num_past_frames // 2,
                                 context_f=d.test_num_past_frames // 2)
        to_list, tp_list = np.asarray(to).tolist(), np.asarray(tp).tolist()

    if args.random_init:
        vp = VideoPredictor.from_random_init(cfg)
    else:
        vp = VideoPredictor.from_checkpoints(
            cfg, cfg.Predictor.resume_AE_ckpt, cfg.Predictor.ckpt_save_dir)
    vp.export_task(args.out, to_list, tp_list, args.batch_size,
                   platforms=tuple(args.platforms))
    print(f"exported task to={to_list} tp={tp_list} "
          f"batch={args.batch_size} platforms={args.platforms} -> {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
