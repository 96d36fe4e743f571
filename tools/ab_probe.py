"""Interleaved A/B probe — the only measurement form that survives the
shared-TPU throughput variance (DESIGN.md round-2 findings).

Compares the full inference pipeline with the sub-pixel decoder (A) vs the
raw ConvTranspose decoder (B), alternating A,B,A,B,... and reporting each
pair's ratio plus the median.
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


def make_scanned(vp, decoder, oc, tc):
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    key = jax.random.key(0)

    def one(ae_vars, pred_vars, x):
        feats = vp.ae.apply(ae_vars, x, train=False,
                            method=FrameAutoEncoder.encode)
        pf = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                rngs={"latent": key}).pred_features
        return decoder(ae_vars, pf)

    @jax.jit
    def fn(ae_vars, pred_vars, x):
        def body(c, _):
            y = one(ae_vars, pred_vars, c)
            fb = jnp.tanh(jnp.mean(y).astype(jnp.float32))
            return c + (fb * 1e-3).astype(c.dtype), None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    return fn


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import ResnetDecoder

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

    # build BOTH variants explicitly — FrameAutoEncoder.decode follows the
    # config default (subpixel=False since the losing measurement), so the A
    # side must force subpixel=True itself
    mk_dec = lambda subpx: ResnetDecoder(
        out_channels=1, ngf=cfg.AE.ngf,
        n_downsampling=cfg.AE.n_downsampling,
        out_layer=cfg.AE.out_layer, subpixel=subpx, dtype=jnp.bfloat16)
    dec_subpx, dec_ct = mk_dec(True), mk_dec(False)

    def apply_dec(dec, ae_vars, pf):
        return dec.apply({"params": ae_vars["params"]["decoder"],
                          "batch_stats": ae_vars["batch_stats"]["decoder"]},
                         pf, train=False)

    decoder_subpx = lambda ae_vars, pf: apply_dec(dec_subpx, ae_vars, pf)
    decoder_ct = lambda ae_vars, pf: apply_dec(dec_ct, ae_vars, pf)

    fa = make_scanned(vp, decoder_subpx, oc, tc)
    fb = make_scanned(vp, decoder_ct, oc, tc)
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
        print(f"pair {i}: subpx {ta * 1e3:.1f} ms  convT {tb * 1e3:.1f} ms  "
              f"convT/subpx = {tb / ta:.3f}", flush=True)
    print(f"median convT/subpx: {np.median(ratios):.3f} "
          f"(>1 means sub-pixel wins)", flush=True)


if __name__ == "__main__":
    main()
