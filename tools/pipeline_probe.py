"""Full-pipeline timing: back-to-back dispatches vs one scanned program.

If the scanned per-iteration time is much lower than the dispatched one, the
axon-tunnel dispatch overhead (not device compute) bounds the dispatched
number, and the serving engine should execute its steady-state loop
on-device.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    exec_mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode=exec_mode)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    batch = 64
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    key = jax.random.key(0)

    def one(ae_vars, pred_vars, x, k):
        feats = vp.ae.apply(ae_vars, x, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": k})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    # --- back-to-back dispatches (bench.py protocol)
    f1 = jax.jit(one)
    np.asarray(f1(vp.ae_vars, vp.predictor_vars, frames, key))
    n = 20
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            out = f1(vp.ae_vars, vp.predictor_vars, frames,
                     jax.random.fold_in(key, i))
        np.asarray(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"[{exec_mode}] dispatched: {best * 1e3:.2f} ms/batch", flush=True)

    # --- one scanned program (fresh pseudo-frames per iteration derived from
    # the previous output, so nothing is loop-invariant except weights)
    iters = 16

    @jax.jit
    def scanned(ae_vars, pred_vars, x, k):
        def body(c, i):
            xx, kk = c
            y = one(ae_vars, pred_vars, xx, kk)
            nxt = xx + (jnp.tanh(jnp.mean(y).astype(jnp.float32)) * 1e-3
                        ).astype(xx.dtype)
            return (nxt, jax.random.fold_in(kk, i)), None
        (xx, _), _ = jax.lax.scan(body, (x, k), jnp.arange(iters))
        return xx

    np.asarray(scanned(vp.ae_vars, vp.predictor_vars, frames, key))[0, 0, 0]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = scanned(vp.ae_vars, vp.predictor_vars, frames, key)
        np.asarray(out[0, 0, 0, 0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"[{exec_mode}] scanned:    {best * 1e3:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
