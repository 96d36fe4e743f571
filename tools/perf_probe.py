"""Ad-hoc TPU perf probe: compare serving exec modes end-to-end.

Runs the bench.py pipeline (KTH 64x64 unified NPVP-S, batch 64, VFP 10->10)
once per exec mode and prints ms/batch. Only end-to-end, back-to-back
dispatch numbers are meaningful through the axon tunnel (CLAUDE.md).

Usage: python tools/perf_probe.py [xla int8 ...]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def measure(exec_mode: str, batch: int = 64, reps: int = 3, n: int = 20):
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode=exec_mode)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)

    @jax.jit
    def pipeline(ae_vars, pred_vars, frames, key):
        feats = vp.ae.apply(ae_vars, frames, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": key})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 10, 64, 64, 1), dtype=np.float32))
    key = jax.random.key(0)
    t0 = time.perf_counter()
    np.asarray(pipeline(vp.ae_vars, vp.predictor_vars, frames, key))
    compile_s = time.perf_counter() - t0

    samples = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            out = pipeline(vp.ae_vars, vp.predictor_vars, frames,
                           jax.random.fold_in(key, r * n + i))
        np.asarray(out[0, 0, 0, 0])
        samples.append((time.perf_counter() - t0) / n)
    ms = float(np.min(samples)) * 1e3
    print(f"[{exec_mode}] compile={compile_s:.1f}s  {ms:.2f} ms/batch  "
          f"{batch * 10 / (ms / 1e3):.0f} frames/s", flush=True)
    return ms


if __name__ == "__main__":
    modes = sys.argv[1:] or ["xla", "int8"]
    for m in modes:
        measure(m)
