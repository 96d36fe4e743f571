"""Capture a jax.profiler trace of the flagship pipeline on the TPU.

If device traces come through the axon tunnel, the per-op breakdown tells us
exactly where the ~180 ms/batch goes. Output: /tmp/npvp_trace (TensorBoard
profile plugin format); summarize_trace() prints the top ops from the
trace.json.gz event file if present.
"""

import glob
import gzip
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

OUT = "/tmp/npvp_trace"
# traced pipeline iterations — hlo_probe.join_trace divides event durations
# by this, so the two tools must share it
TRACE_ITERS = 3


def build_train_program():
    """The flagship stage-2 train step, EXACTLY as bench.py --train runs it:
    both call ``bench.flagship_train_program`` (the single construction
    site) so tools/hlo_probe.py and this tracer probe the identical
    program."""
    from bench import flagship_train_program

    train_step, args, _cfg = flagship_train_program()
    return train_step, args


def trace_train():
    """Capture a profiler trace of TRACE_ITERS flagship train steps."""
    train_step, (state, batch, key) = build_train_program()
    state, metrics = train_step(state, batch, key)  # compile
    np.asarray(metrics["loss"])
    jax.profiler.start_trace(OUT)
    for i in range(TRACE_ITERS):
        state, metrics = train_step(state, batch, jax.random.fold_in(key, i))
    np.asarray(metrics["loss"])  # host fetch fences the tunnel
    jax.profiler.stop_trace()
    print("train trace written", flush=True)
    summarize()


def main():
    from __graft_entry__ import _flagship_config
    from npvp_tpu.models.coords import coordinate_grid, spatial_index_lists
    from npvp_tpu.models.inference import VideoPredictor
    from npvp_tpu.nn.resnet_ae import FrameAutoEncoder

    cfg = _flagship_config()
    if "s2d" in sys.argv[1:]:
        cfg.AE.s2d_head = True
    mode = "pallas" if "pallas" in sys.argv[1:] else None
    vp = VideoPredictor.from_random_init(cfg, dtype=jnp.bfloat16,
                                         exec_mode=mode)
    p = cfg.Predictor
    h, w = spatial_index_lists(p.max_H, p.max_W)
    oc = coordinate_grid(jnp.arange(10, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    tc = coordinate_grid(jnp.arange(10, 20, dtype=jnp.float32), h, w,
                         p.max_T, p.max_H, p.max_W)
    frames = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 10, 64, 64, 1), dtype=np.float32), jnp.bfloat16)
    key = jax.random.key(0)

    @jax.jit
    def pipeline(ae_vars, pred_vars, x, k):
        feats = vp.ae.apply(ae_vars, x, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": k})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    np.asarray(pipeline(vp.ae_vars, vp.predictor_vars, frames, key))
    jax.profiler.start_trace(OUT)
    for i in range(TRACE_ITERS):
        out = pipeline(vp.ae_vars, vp.predictor_vars, frames,
                       jax.random.fold_in(key, i))
    np.asarray(out[0, 0, 0, 0])
    jax.profiler.stop_trace()
    print("trace written", flush=True)

    summarize()


def summarize(top=40):
    files = glob.glob(OUT + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace.json.gz found; files:",
              glob.glob(OUT + "/**/*", recursive=True)[:20], flush=True)
        return
    events = []
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "X":
            events.append(ev)
    # device ops: pids whose name mentions TPU/device
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name or "Chip" in name}
    agg = {}
    full = {}
    for ev in events:
        if dev_pids and ev["pid"] not in dev_pids:
            continue
        name = ev["name"].split(".")[0]
        agg[name] = agg.get(name, 0.0) + ev.get("dur", 0.0)
        full[ev["name"]] = full.get(ev["name"], 0.0) + ev.get("dur", 0.0)
    total = sum(agg.values())
    print(f"device pids: {dev_pids or 'ALL'}; total {total / 1e3:.1f} ms",
          flush=True)
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur / 1e3:9.2f} ms  {name}", flush=True)
    print("--- top individual ops ---", flush=True)
    for name, dur in sorted(full.items(), key=lambda kv: -kv[1])[:top]:
        if name.startswith("jit_"):
            continue
        print(f"{dur / 1e3:9.2f} ms  {name}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summarize":
        summarize()
    elif len(sys.argv) > 1 and sys.argv[1] == "train":
        # exact match, same rule as hlo_probe.py — `trace_probe.py s2d train`
        # must NOT silently trace the train program while hlo_probe dumps
        # the s2d serving HLO (the join requires identical programs)
        trace_train()
    else:
        main()
