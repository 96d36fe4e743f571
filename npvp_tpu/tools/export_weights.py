"""Compact, git-committable trained-weights artifact.

Round-3 lesson: only the git tree survives between build rounds — the Orbax
checkpoint directories (fp32 params + optimizer moments, ~1.2 GB per save at
flagship scale) were wiped with the filesystem, which made "resume the
400-epoch run" impossible a round later. This tool exports the *evaluation*
state (params + batch_stats for the frozen AE and the predictor — no
optimizer moments) to one compressed ``.npz`` small enough to commit
(~50-120 MB at flagship scale in float16), and loads it back into a
:class:`~npvp_tpu.models.inference.VideoPredictor`.

Precision: weights are stored in float16 except arrays whose magnitude
exceeds float16 range (kept float32 — e.g. BatchNorm running variances can
be large). The measured quality cost of serving the flagship model in
bfloat16 is +0.002 dB PSNR vs fp32 (results/SMMNIST_Unified_NPVP-S/
exec_mode_fidelity_fullset.md); float16 carries 3 more mantissa bits.

Export (after training):
    python -m npvp_tpu.tools.export_weights --config_path <yaml> \
        --out results/<run>/weights.npz

Consume: ``VideoPredictor.from_weights(cfg, "weights.npz")``, or any
checkpoint-consuming CLI with
``--override Predictor.ckpt_save_dir=<...>/weights.npz`` (the loaders
treat a ``.npz`` checkpoint path as a weights artifact).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

SEP = "/"
META_KEY = "__meta__"
_F16_MAX = 60000.0  # stay clear of float16 inf (65504)


def _flatten(tree, prefix: str, out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{SEP}{k}", out)
    else:
        out[prefix] = np.asarray(tree)


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, value in flat.items():
        parts = path.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_weights(path: str | Path, ae_vars: dict, pred_vars: dict,
                 meta: dict | None = None) -> None:
    """Write {ae,pred} x {params,batch_stats} to one compressed npz."""
    flat: Dict[str, np.ndarray] = {}
    _flatten({"ae": ae_vars, "pred": pred_vars}, "vars", flat)
    stored = {}
    for k, v in flat.items():
        if v.dtype in (np.float32, np.float64):
            v = v.astype(np.float32)
            if np.abs(v).max(initial=0.0) < _F16_MAX:
                v = v.astype(np.float16)
        stored[k] = v
    stored[META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **stored)


def load_weights(path: str | Path) -> Tuple[dict, dict, dict]:
    """Returns (ae_vars, pred_vars, meta); float arrays come back float32."""
    with np.load(path) as data:
        meta = json.loads(bytes(data[META_KEY])) if META_KEY in data else {}
        flat = {}
        for k in data.files:
            if k == META_KEY:
                continue
            v = data[k]
            if v.dtype in (np.float16, np.float64):
                v = v.astype(np.float32)
            flat[k] = v
    # empty halves (e.g. an AE-only artifact) flatten to no keys at all
    tree = _unflatten(flat).get("vars", {})
    ae_vars = {k: tree.get("ae", {}).get(k, {})
               for k in ("params", "batch_stats")}
    pred_vars = {k: tree.get("pred", {}).get(k, {})
                 for k in ("params", "batch_stats")}
    return ae_vars, pred_vars, meta


def warm_start_state(state, npz_path: str | Path, which: str):
    """Adopt a committed weights artifact into a fresh TrainState.

    ``which`` selects the ``"ae"`` or ``"pred"`` half of the artifact. The
    returned state carries the artifact's params/batch_stats (cast to the
    template's dtypes), the artifact's saved step (so ``start_epoch``
    derives correctly), and *fresh* optimizer moments — the artifact
    deliberately omits them to stay git-committable, so a warm-started run
    is a continuation of the weights, not a bit-exact resume of the
    optimizer trajectory. Shapes are validated leaf-by-leaf up front.
    """
    import jax
    import jax.numpy as jnp

    ae_vars, pred_vars, meta = load_weights(npz_path)
    loaded = ae_vars if which == "ae" else pred_vars

    def adopt(path, tmpl, val):
        val = np.asarray(val)
        if tuple(tmpl.shape) != val.shape:
            name = SEP.join(str(getattr(p, "key", p)) for p in path)
            raise ValueError(
                f"weights artifact {npz_path}: '{which}/{name}' has shape "
                f"{val.shape}, model expects {tuple(tmpl.shape)} — config "
                "mismatch?")
        return jnp.asarray(val, dtype=tmpl.dtype)

    params = jax.tree_util.tree_map_with_path(
        adopt, state.params, loaded["params"])
    batch_stats = jax.tree_util.tree_map_with_path(
        adopt, state.batch_stats, loaded["batch_stats"])
    step = int(meta.get(f"{which}_step", 0))
    return state.replace(params=params, batch_stats=batch_stats, step=step)


def main(argv=None):
    from npvp_tpu.core.checkpoint import CheckpointManager
    from npvp_tpu.core.config import load_config
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.train.common import build_argparser

    parser = build_argparser("export trained weights to a committable npz")
    parser.add_argument("--out", required=True)
    parser.add_argument("--ae_ckpt", default=None,
                        help="Orbax dir or .npz artifact "
                             "(default cfg.Predictor.resume_AE_ckpt)")
    parser.add_argument("--pred_ckpt", default=None,
                        help="Orbax dir (default cfg.Predictor.ckpt_save_dir)")
    parser.add_argument("--ae_only", action="store_true",
                        help="export the stage-1 AE only (no predictor "
                             "checkpoint exists yet)")
    parser.add_argument("--best", action="store_true",
                        help="export the best-metric step instead of latest")
    args = parser.parse_args(argv)
    cfg = load_config(args.config_path, overrides=args.override)
    if cfg.Env.platform:
        import jax

        jax.config.update("jax_platforms", cfg.Env.platform)
    ae_dir = args.ae_ckpt or cfg.Predictor.resume_AE_ckpt
    pred_dir = args.pred_ckpt or cfg.Predictor.ckpt_save_dir

    import jax.numpy as jnp

    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.train.stage1_ae import build_ae, init_state
    from npvp_tpu.train.stage2_predictor import init_predictor_state

    d = cfg.Dataset
    clip_len = d.num_past_frames + d.num_future_frames
    if str(ae_dir).endswith(".npz"):
        # chain from an earlier artifact (e.g. a committed stage-1 export)
        ae_vars, _, ae_meta = load_weights(ae_dir)
        ae_step = int(ae_meta.get("ae_step", 0))
    else:
        ae = build_ae(cfg, jnp.float32)
        ae_mngr = CheckpointManager(ae_dir, monitor="L1_loss_valid",
                                    mode="min")
        ae_state = ae_mngr.restore(
            init_state(cfg, ae, (1, clip_len, d.img_size, d.img_size,
                                 d.img_channels)),
            step=(ae_mngr.best_step() if args.best else None))
        ae_vars = {"params": ae_state.params,
                   "batch_stats": ae_state.batch_stats}
        ae_step = int(ae_state.step)

    if args.ae_only:
        pred_vars, pred_step = {}, 0
    else:
        pred_mngr = CheckpointManager(pred_dir, monitor="loss_val",
                                      mode="min")
        pred_step = (pred_mngr.best_step() if args.best else None)
        pred_state = pred_mngr.restore(
            init_predictor_state(cfg, build_predictor(cfg, jnp.float32), 1),
            step=pred_step)
        pred_vars = {"params": pred_state.params,
                     "batch_stats": pred_state.batch_stats}
        pred_step = int(pred_state.step)

    meta = {"config_path": args.config_path,
            "ae_step": ae_step, "pred_step": pred_step}
    save_weights(args.out, ae_vars, pred_vars, meta)
    size = Path(args.out).stat().st_size / 1e6
    print(f"wrote {args.out}: {size:.1f} MB, meta={meta}")
    if not args.ae_only:
        # round-trip sanity: the artifact must reload into a working predictor
        vp = VideoPredictor.from_weights(cfg, args.out)
        assert vp is not None
        print("reload OK")


if __name__ == "__main__":
    main()
