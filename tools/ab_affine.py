"""Interleaved A/B: affine-fused attention projections vs the generic
pre-fused path, full pipeline at flagship shapes."""

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
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.models.predictor import build_predictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16)  # affine
    pred_generic = build_predictor(cfg, jnp.bfloat16).clone(
        affine_posfuse=False)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    key = jax.random.key(0)

    def scanned(predictor):
        def one(ae_vars, pred_vars, x):
            feats = vp.ae.apply(ae_vars, x, train=False,
                                method=FrameAutoEncoder.encode)
            pf = predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": key}).pred_features
            return vp.ae.apply(ae_vars, pf, train=False,
                               method=FrameAutoEncoder.decode)

        @jax.jit
        def fn(ae_vars, pred_vars, x):
            def body(c, _):
                y = one(ae_vars, pred_vars, c)
                fb = jnp.tanh(jnp.mean(y).astype(jnp.float32))
                return c + (fb * 1e-3).astype(c.dtype), None
            return jax.lax.scan(body, x, None, length=ITERS)[0]

        return fn

    fa = scanned(vp.predictor)
    fb = scanned(pred_generic)
    args = (vp.ae_vars, vp.predictor_vars, frames)
    np.asarray(fa(*args)).ravel()[:1]
    np.asarray(fb(*args)).ravel()[:1]
    ratios = []
    for i in range(PAIRS):
        t0 = time.perf_counter(); np.asarray(fa(*args)).ravel()[:1]
        ta = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter(); np.asarray(fb(*args)).ravel()[:1]
        tb = (time.perf_counter() - t0) / ITERS
        ratios.append(tb / ta)
        print(f"pair {i}: affine {ta * 1e3:.1f} ms  generic {tb * 1e3:.1f} ms"
              f"  generic/affine = {tb / ta:.3f}", flush=True)
    print(f"median generic/affine: {np.median(ratios):.3f} "
          f"(>1 means affine wins)", flush=True)


if __name__ == "__main__":
    main()
