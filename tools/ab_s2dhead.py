"""Interleaved A/B: sub-pixel (stride-4) AE output head vs the direct 7×7
conv, full flagship pipeline (the head's C_out=1 conv measured 3.9 ms at
~4 TF/s in the trace — tools/trace_probe.py `add_tanh_fusion`)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8
PAIRS = 8


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder, ResnetDecoder

    cfg = _flagship_config()
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    key = jax.random.key(0)

    dec_s2d = ResnetDecoder(out_channels=1, ngf=cfg.AE.ngf,
                            n_downsampling=cfg.AE.n_downsampling,
                            out_layer=cfg.AE.out_layer, s2d_head=True,
                            dtype=jnp.bfloat16)

    def make(use_s2d):
        def one(ae_vars, pred_vars, x):
            feats = vp.ae.apply(ae_vars, x, train=False,
                                method=FrameAutoEncoder.encode)
            pf = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                    rngs={"latent": key}).pred_features
            if use_s2d:
                return dec_s2d.apply(
                    {"params": ae_vars["params"]["decoder"],
                     "batch_stats": ae_vars["batch_stats"]["decoder"]},
                    pf, train=False)
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

    fa = make(True)
    fb = make(False)
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
        print(f"pair {i}: s2d {ta * 1e3:.1f} ms  direct {tb * 1e3:.1f} ms  "
              f"direct/s2d = {tb / ta:.3f}", flush=True)
    print(f"median direct/s2d: {np.median(ratios):.3f} "
          f"(>1 means s2d head wins)", flush=True)


if __name__ == "__main__":
    main()
