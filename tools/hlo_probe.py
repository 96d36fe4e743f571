"""Dump the optimized HLO of the flagship inference pipeline and map the
profiler's hot op names (fusion.NNNN / copy.NNNN / reshape.NNNN) back to the
instructions — shapes, operands, and source metadata — so trace findings
("20% of device time is copy/reshape") become actionable.

Usage:
    python tools/hlo_probe.py                # compile + write /tmp/pipeline_hlo.txt
    python tools/hlo_probe.py fusion.3611 …  # grep instructions by name
"""

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = "/tmp/pipeline_hlo.txt"
TRACE_DIR = "/tmp/npvp_trace"


def compile_and_dump_train():
    """Dump the optimized HLO of the flagship stage-2 train step — the SAME
    program tools/trace_probe.py train captures (shared builder)."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from trace_probe import build_train_program

    train_step, args = build_train_program()
    txt = train_step.lower(*args).compile().as_text()
    pathlib.Path(OUT).write_text(txt)
    print(f"wrote {OUT}: {len(txt) / 1e6:.1f} MB (train step)")


def compile_and_dump():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    @jax.jit
    def pipeline(ae_vars, pred_vars, frames, key):
        feats = vp.ae.apply(ae_vars, frames, train=False,
                            method=FrameAutoEncoder.encode)
        out = vp.predictor.apply(pred_vars, feats, oc, tc, 10,
                                 rngs={"latent": key})
        return vp.ae.apply(ae_vars, out.pred_features, train=False,
                           method=FrameAutoEncoder.decode)

    # MATCH tools/trace_probe.py exactly (bf16 frames) so HLO instruction
    # names line up with the trace's op names and the two can be joined
    frames = jnp.zeros((64, 10, 64, 64, 1), jnp.bfloat16)
    txt = pipeline.lower(vp.ae_vars, vp.predictor_vars, frames,
                         jax.random.key(0)).compile().as_text()
    pathlib.Path(OUT).write_text(txt)
    print(f"wrote {OUT}: {len(txt) / 1e6:.1f} MB")


def lookup(names):
    txt = pathlib.Path(OUT).read_text()
    for name in names:
        print(f"===== {name}")
        # the defining line (fusion roots include the fused computation name)
        for m in re.finditer(rf"^\s*%?{re.escape(name)}\s*=.*$", txt,
                             re.MULTILINE):
            print(m.group(0)[:400])
        # fused computation body, if any
        m = re.search(rf"%fused_computation[^\n]*{re.escape(name)}", txt)
        if m:
            print(m.group(0)[:400])


def _trace_iters() -> int:
    """Pipeline iterations per trace — shared with tools/trace_probe.py so
    the per-iteration division can't silently drift from the capture loop."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    import trace_probe

    return trace_probe.TRACE_ITERS


def join_trace(top=30):
    """Join the profiler trace (tools/trace_probe.py output) with the HLO
    dump: device ms per source module (metadata op_name buckets)."""
    import collections
    import glob
    import gzip
    import json

    txt = pathlib.Path(OUT).read_text()
    meta = {}
    for m in re.finditer(r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"', txt):
        meta[m.group(1)] = m.group(2)
    files = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        print("no trace found — run tools/trace_probe.py first "
              "(same variant as the HLO dump!)")
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    mod = collections.Counter()
    matched = total = 0.0
    for ev in data.get("traceEvents", []):
        a = ev.get("args") or {}
        if ev.get("ph") != "X" or "hlo_category" not in a:
            continue
        dur = ev["dur"] / 1e3 / _trace_iters()  # per-iteration ms
        total += dur
        op = meta.get(ev["name"])
        if op is None:
            mod["<unmatched>"] += dur
            continue
        matched += dur
        b = re.sub(r"layer_\d+", "layer_*", op)
        parts = [p for p in b.split("/") if "jit(" not in p]
        mod["/".join(parts[:4])] += dur
    print(f"matched {matched:.1f} / {total:.1f} ms")
    for k, v in mod.most_common(top):
        print(f"{v:7.2f} ms  {k}")


if __name__ == "__main__":
    # usage: hlo_probe.py            -> compile + dump default pipeline
    #        hlo_probe.py s2d        -> compile + dump with AE.s2d_head on
    #        hlo_probe.py join       -> join latest trace with the dump
    #        hlo_probe.py <op> ...   -> look up instruction(s) in the dump
    if len(sys.argv) > 1 and sys.argv[1] == "join":
        join_trace()
    elif len(sys.argv) > 1 and sys.argv[1] == "train":
        compile_and_dump_train()
    elif len(sys.argv) == 1 or sys.argv[1] in ("s2d", "pallas"):
        compile_and_dump()
    else:
        lookup(sys.argv[1:])
