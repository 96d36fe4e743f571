"""Unified decomposition probe — ONE process, ONE methodology.

Measures (all as lax.scan loops with full-tensor-reduction feedback so
nothing slices/hoists):
  encode | decode(subpixel) | decode(convtranspose) | evt-former |
  predictor | full pipeline (scanned) | full pipeline (dispatched)

Resolves section-vs-whole discrepancies within a single run.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


ITERS = 8


def timed_scan(section, variables, x0, label, reps=3):
    """section(variables, x) → y (any shape); loops via feedback."""
    def fn(v, x):
        def body(c, _):
            y = section(v, c)
            fb = jnp.tanh(jnp.mean(y).astype(jnp.float32))
            return c + (fb * 1e-3).astype(c.dtype), None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(variables, x0)
    np.asarray(out).ravel()[:1]
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(variables, x0)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    # subtract one-dispatch overhead estimate? report raw per-iter
    print(f"{label}: {best / ITERS * 1e3:.2f} ms/iter "
          f"(total {best * 1e3:.0f} ms, compile {compile_s:.0f}s)",
          flush=True)
    return best / ITERS


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
    batch = 64
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    feats = jnp.asarray(np.random.default_rng(1).standard_normal(
        (batch, 10, 8, 8, 512), dtype=np.float32), jnp.bfloat16) * 0.1
    key = jax.random.key(0)

    enc = lambda v, x: vp.ae.apply(v, x, train=False,
                                   method=FrameAutoEncoder.encode)
    t_enc = timed_scan(enc, vp.ae_vars, frames, "encode      ")

    dec = lambda v, f: vp.ae.apply(v, f, train=False,
                                   method=FrameAutoEncoder.decode)
    t_dec = timed_scan(dec, vp.ae_vars, feats, "decode subpx")

    dec_ct_mod = ResnetDecoder(out_channels=1, ngf=cfg.AE.ngf,
                               n_downsampling=cfg.AE.n_downsampling,
                               out_layer=cfg.AE.out_layer, subpixel=False,
                               dtype=jnp.bfloat16)
    dec_params = vp.ae_vars["params"]["decoder"]
    dec_stats = vp.ae_vars["batch_stats"]["decoder"]
    dec_ct = lambda v, f: dec_ct_mod.apply(v, f, train=False)
    t_dct = timed_scan(dec_ct, {"params": dec_params,
                                "batch_stats": dec_stats}, feats,
                       "decode convT")

    def evt(v, f):
        def inner(mdl):
            op_beta, op_gamma = mdl.nrmlp(oc)
            mem, _ = mdl.event_coding(f, op_beta, op_gamma)
            return mem
        return vp.predictor.apply(v, rngs={"latent": key}, method=inner)

    t_evt = timed_scan(evt, vp.predictor_vars, feats, "evt-former  ")

    pred = lambda v, f: vp.predictor.apply(v, f, oc, tc, 10,
                                           rngs={"latent": key}
                                           ).pred_features
    t_prd = timed_scan(pred, vp.predictor_vars, feats, "predictor   ")

    def full(v2, x):
        ae_vars, pred_vars = v2
        f = enc(ae_vars, x)
        pf = vp.predictor.apply(pred_vars, f, oc, tc, 10,
                                rngs={"latent": key}).pred_features
        return dec(ae_vars, pf)

    t_full = timed_scan(full, (vp.ae_vars, vp.predictor_vars), frames,
                        "full scanned")

    print(f"sum(enc+dec+pred) = {(t_enc + t_dec + t_prd) * 1e3:.2f} ms vs "
          f"full {t_full * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
