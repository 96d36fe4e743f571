"""Interleaved A/B: static-calibrated int8 vs dynamic int8 vs bf16 serving.

Round-3 VERDICT item 6: round 2 measured the dynamic-int8 pipeline LOSING
end-to-end (221.6 vs 179.5 ms bf16) because per-token abs-max quantization
adds HBM traffic. Static calibration (npvp_tpu/nn/quant.STATIC_ACT_SCALE)
removes exactly that: the activation scale becomes a program constant, so
the quantize is one fused elementwise op (no reduction pass) and the rescale
folds the scalar into the per-channel weight scales. A single global scalar
reproduces the compute/traffic structure of a per-site-calibrated program
(per-site values change constants, not structure), so this probe answers
the PERF question; fidelity of a calibrated deployment is a separate
measurement (tools/exec_mode_fidelity.py pattern).

Protocol: full flagship serving pipeline, ITERS iterations per arm inside
one lax.scan program, arms alternated within one process — the only
measurement form that survives the shared-TPU variance (CLAUDE.md).
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


def compile_arm(name, fn, args):
    """First execution (= remote compile) with retries: the axon tunnel
    sporadically drops the compile response mid-body (observed round 4:
    'response body closed before all bytes were read')."""
    for attempt in range(3):
        t0 = time.perf_counter()
        try:
            np.asarray(fn(*args)).ravel()[:1]
            print(f"{name}: compiled in {time.perf_counter() - t0:.0f}s",
                  flush=True)
            return
        except Exception as e:  # noqa: BLE001 — tunnel errors vary
            if attempt == 2:
                raise
            print(f"{name}: compile attempt {attempt} failed ({e}); "
                  "retrying in 30s", flush=True)
            time.sleep(30)


def make_scanned(ae, predictor, oc, tc):
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    key = jax.random.key(0)

    def one(ae_vars, pred_vars, x):
        feats = ae.apply(ae_vars, x, train=False,
                         method=FrameAutoEncoder.encode)
        pf = predictor.apply(pred_vars, feats, oc, tc, 10,
                             rngs={"latent": key}).pred_features
        return ae.apply(ae_vars, pf, train=False,
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
    import npvp_tpu.nn.quant as quant
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.models.predictor import build_predictor

    cfg = _flagship_config()
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)

    # one parameter set, three execution paths (CLAUDE.md rule)
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode="int8")
    args = (vp.ae_vars, vp.predictor_vars, frames)

    # STATIC_ACT_SCALE is read at TRACE time — build the dynamic program,
    # then set it and build the static program from the same modules
    fns = {}
    fns["int8_dyn"] = make_scanned(vp.ae, vp.predictor, oc, tc)
    compile_arm("int8_dyn", fns["int8_dyn"], args)

    quant.STATIC_ACT_SCALE = 0.05  # structure-equivalent to calibrated
    pred_static = build_predictor(cfg, jnp.bfloat16, exec_mode="int8")
    fns["int8_static"] = make_scanned(vp.ae, pred_static, oc, tc)
    compile_arm("int8_static", fns["int8_static"], args)
    quant.STATIC_ACT_SCALE = None

    pred_bf16 = build_predictor(cfg, jnp.bfloat16, exec_mode="xla")
    fns["bf16"] = make_scanned(vp.ae, pred_bf16, oc, tc)
    compile_arm("bf16", fns["bf16"], args)

    # the serving headline runs exec_mode="pallas" — int8_static must beat
    # THIS arm (not just xla-bf16) to move the headline
    pred_pl = build_predictor(cfg, jnp.bfloat16, exec_mode="pallas")
    fns["pallas"] = make_scanned(vp.ae, pred_pl, oc, tc)
    compile_arm("pallas", fns["pallas"], args)

    names = list(fns)
    times = {n: [] for n in names}
    for i in range(PAIRS):
        line = []
        for n in names:
            t0 = time.perf_counter()
            np.asarray(fns[n](*args)).ravel()[:1]
            dt = (time.perf_counter() - t0) / ITERS
            times[n].append(dt)
            line.append(f"{n} {dt * 1e3:.1f} ms")
        print(f"round {i}: " + "  ".join(line), flush=True)
    med = {n: float(np.median(times[n])) for n in names}
    print("medians:", {n: f"{v * 1e3:.1f} ms" for n, v in med.items()},
          flush=True)
    print(f"bf16/int8_static = {med['bf16'] / med['int8_static']:.3f} "
          f"(>1 means static int8 wins); "
          f"int8_dyn/int8_static = {med['int8_dyn'] / med['int8_static']:.3f}; "
          f"pallas/int8_static = {med['pallas'] / med['int8_static']:.3f} "
          f"(>1 means it beats the serving default)",
          flush=True)


if __name__ == "__main__":
    main()
