"""Interleaved A/B: output-projection fused into the attention kernel vs not.

The per-site attention kernel (npvp_tpu/kernels/temporal_attention.py) runs
at ~200 GB/s — well under the HBM roofline — and its (B, T, H·D) context
output round-trips through HBM only to be immediately consumed by the output
projection. Fusing that projection into the kernel (one (hd, C) dot per head,
fp32 accumulation) deletes a full context-tensor write+read per attention.

A = FUSE_OPROJ=True, B = False; both use exec_mode="pallas" with one
parameter set, alternating A,B within one process (the only measurement form
that survives the shared-TPU variance — DESIGN.md round-2 findings).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
PAIRS = 6


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.kernels import temporal_attention as ta_kernel
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from tools.ab_pallas import make_scanned

    cfg = _flagship_config()
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)

    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode="pallas")
    args = (vp.ae_vars, vp.predictor_vars, frames)

    # FUSE_OPROJ is read at trace time: build each program under its flag
    ta_kernel.FUSE_OPROJ = True
    fa = make_scanned(vp, oc, tc)
    t0 = time.perf_counter(); np.asarray(fa(*args)).ravel()[:1]
    print(f"fused: compiled in {time.perf_counter() - t0:.0f}s", flush=True)

    ta_kernel.FUSE_OPROJ = False
    fb = make_scanned(vp, oc, tc)
    t0 = time.perf_counter(); np.asarray(fb(*args)).ravel()[:1]
    print(f"unfused: compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    ta_kernel.FUSE_OPROJ = True

    # numerical sanity: same params, same math up to fp32-accum association
    ya = np.asarray(fa(*args), np.float32)
    yb = np.asarray(fb(*args), np.float32)
    print(f"max |fused - unfused| = {np.abs(ya - yb).max():.4f}", flush=True)

    ratios = []
    for i in range(PAIRS):
        t0 = time.perf_counter(); np.asarray(fa(*args)).ravel()[:1]
        ta = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter(); np.asarray(fb(*args)).ravel()[:1]
        tb = (time.perf_counter() - t0) / ITERS
        ratios.append(tb / ta)
        print(f"pair {i}: fused {ta * 1e3:.1f} ms  unfused {tb * 1e3:.1f} ms  "
              f"unfused/fused = {tb / ta:.3f}", flush=True)
    print(f"median unfused/fused: {np.median(ratios):.3f} "
          f"(>1 means fusion wins)", flush=True)


if __name__ == "__main__":
    main()
