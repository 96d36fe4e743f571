"""Interleaved A/B: fused temporal-attention Pallas kernel vs the XLA path.

Round-2 VERDICT item 3: the trace attributes ~38.6 ms/batch (~20% of device
time) to XLA's attention-layout canonicalization; the kernel
(npvp_tpu/kernels/temporal_attention.py) consumes the (B, T, H·D) layout
directly for the temporal + cross attentions. This probe measures the full
flagship serving pipeline with ``exec_mode="pallas"`` (A) vs ``"xla"`` (B),
alternating A,B,A,B within one process — the only measurement form that
survives the shared-TPU variance (DESIGN.md round-2 findings).

For sub-5% effects, confirm with the per-module join:
``python tools/hlo_probe.py pallas`` + ``tools/trace_probe.py pallas`` +
``tools/hlo_probe.py join``.
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


def make_scanned(vp, oc, tc):
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    key = jax.random.key(0)

    def one(ae_vars, pred_vars, x):
        feats = vp.ae.apply(ae_vars, x, train=False,
                            method=FrameAutoEncoder.encode)
        pf = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
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


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor

    cfg = _flagship_config()
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)

    # one parameter set, two execution paths (CLAUDE.md rule)
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode="pallas")
    from npvp_tpu.models.predictor import build_predictor

    vp_xla_predictor = build_predictor(cfg, jnp.bfloat16, exec_mode="xla")

    fa = make_scanned(vp, oc, tc)  # pallas

    class _V:
        pass

    vx = _V()
    vx.ae, vx.predictor = vp.ae, vp_xla_predictor
    fb = make_scanned(vx, oc, tc)  # xla

    args = (vp.ae_vars, vp.predictor_vars, frames)
    for name, f in (("pallas", fa), ("xla", fb)):
        t0 = time.perf_counter()
        np.asarray(f(*args)).ravel()[:1]
        print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)

    ratios = []
    for i in range(PAIRS):
        t0 = time.perf_counter(); np.asarray(fa(*args)).ravel()[:1]
        ta = (time.perf_counter() - t0) / ITERS
        t0 = time.perf_counter(); np.asarray(fb(*args)).ravel()[:1]
        tb = (time.perf_counter() - t0) / ITERS
        ratios.append(tb / ta)
        print(f"pair {i}: pallas {ta * 1e3:.1f} ms  xla {tb * 1e3:.1f} ms  "
              f"xla/pallas = {tb / ta:.3f}", flush=True)
    print(f"median xla/pallas: {np.median(ratios):.3f} "
          f"(>1 means the kernel wins)", flush=True)


if __name__ == "__main__":
    main()
