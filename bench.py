"""Headline benchmark: KTH 64×64 unified NPVP-S inference throughput.

Protocol mirrors the reference's stored measurement (Inference.ipynb cells
22-24; BASELINE.md): batch 64, 10 observed → 10 predicted frames, full
pipeline (AE encode → NP predictor → AE decode), steady state. The reference's
steady-state GPU number is ~0.79 s/batch ⇒ ~810 predicted frames/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 64 * 10 / 0.79  # ≈ 810 predicted frames/s (steady state)


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)

    # coordinates are baked into the program (fixed per task — the serving
    # configuration); passing them as runtime args costs ~25% on this chip
    @jax.jit
    def pipeline(ae_vars, pred_vars, frames, key):
        feats = vp.ae.apply(ae_vars, frames, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": key})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    batch = 64
    frames = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 10, 64, 64, 1), dtype=np.float32))
    key = jax.random.key(0)

    # warmup/compile (fetch to host — on tunneled backends block_until_ready
    # alone can return before device completion)
    np.asarray(pipeline(vp.ae_vars, vp.predictor_vars, frames, key))

    # streaming throughput: dispatch back-to-back, fence with a host fetch of
    # the last output only (programs execute serially on one chip)
    reps = 3
    samples = []
    for r in range(reps):
        n = 20
        t0 = time.perf_counter()
        for i in range(n):
            out = pipeline(vp.ae_vars, vp.predictor_vars, frames,
                           jax.random.fold_in(key, r * n + i))
        np.asarray(out[0, 0, 0, 0])
        samples.append((time.perf_counter() - t0) / n)
    sec_per_batch = float(np.min(samples))
    fps = batch * 10 / sec_per_batch
    print(json.dumps({
        "metric": "KTH 64x64 unified NPVP-S predicted frames/sec/chip "
                  "(batch 64, VFP 10->10)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
