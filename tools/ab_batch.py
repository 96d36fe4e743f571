"""Interleaved batch-scaling A/B of the flagship serving pipeline.

Round-3 VERDICT item 5: "batch 256 gave LOWER frames/s than 64" was
measured on the round-1 404 ms-era program; the round-3 program is 2.5x
faster and differently bound, so the conclusion needed re-measuring before
it keeps gating the headline protocol. Runs the serving pipeline (pallas
exec mode, the headline configuration) at several batch sizes, interleaved
within one process, and reports frames/s per size.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

BATCHES = (64, 128, 256)
ITERS = 6
ROUNDS = 5


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode="pallas")
    key = jax.random.key(0)

    def one(ae_vars, pred_vars, x):
        feats = vp.ae.apply(ae_vars, x, train=False,
                            method=FrameAutoEncoder.encode)
        pf = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                rngs={"latent": key}).pred_features
        return vp.ae.apply(ae_vars, pf, train=False,
                           method=FrameAutoEncoder.decode)

    @jax.jit
    def scanned(ae_vars, pred_vars, x):
        def body(c, _):
            y = one(ae_vars, pred_vars, c)
            fb = jnp.tanh(jnp.mean(y).astype(jnp.float32))
            return c + (fb * 1e-3).astype(c.dtype), None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    inputs = {}
    for b in BATCHES:
        inputs[b] = jnp.asarray(np.random.default_rng(0).standard_normal(
            (b, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
        t0 = time.perf_counter()
        np.asarray(scanned(vp.ae_vars, vp.predictor_vars,
                           inputs[b])).ravel()[:1]
        print(f"batch {b}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

    fps = {b: [] for b in BATCHES}
    for r in range(ROUNDS):
        line = []
        for b in BATCHES:
            t0 = time.perf_counter()
            np.asarray(scanned(vp.ae_vars, vp.predictor_vars,
                               inputs[b])).ravel()[:1]
            dt = (time.perf_counter() - t0) / ITERS
            f = b * 10 / dt
            fps[b].append(f)
            line.append(f"b{b} {dt * 1e3:.1f} ms = {f:.0f} fps")
        print(f"round {r}: " + "  ".join(line), flush=True)
    meds = {b: float(np.median(fps[b])) for b in BATCHES}
    base = meds[64]
    print("median fps:", {b: f"{v:.0f} ({v / base:.2f}x vs 64)"
                          for b, v in meds.items()}, flush=True)


if __name__ == "__main__":
    main()
