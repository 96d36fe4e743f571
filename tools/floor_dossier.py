"""Speed-of-light floor dossier (round-3 VERDICT item 4).

Computes, from the latest profiler trace (tools/trace_probe.py output) and
the matching HLO dump (tools/hlo_probe.py — SAME program variant!), a
per-operation roofline analysis of the flagship serving pipeline:

  for every device op: achieved TF/s and GB/s (the trace carries
  ``model_flops`` and ``bytes_accessed`` per event), and its speed-of-light
  time  t_SoL = max(flops / PEAK_FLOPS, bytes / PEAK_BW)

Summing t_SoL over the whole program gives the hardware floor *for this
exact HLO*: the time the chip would need if every op ran simultaneously at
both the MXU peak and the HBM roofline. The per-category table shows where
the gap concentrates and what efficiency each bucket achieves.

Caveats (stated in DESIGN.md where the output is recorded):
- ``model_flops`` is XLA's own cost model; for matmul/conv fusions it is
  dominated by the MACs and is accurate, for elementwise fusions it counts
  cheap vector ALU work that is never the binding resource (their floor is
  bandwidth, which the table shows separately).
- the SoL bound assumes perfect overlap of compute and memory within each
  op and zero gaps between ops — unreachable; 50-70% of peak inside the
  binding resource is the practical ceiling for narrow shapes (measured:
  isolated 512-wide dots reach 18-55 TF/s on this chip, tools/dot_probe.py).

Usage: python tools/floor_dossier.py [markdown]
"""

import collections
import glob
import gzip
import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.trace_probe import TRACE_ITERS

PEAK_TFLOPS = 197e12   # TPU v5e bf16 MXU peak
PEAK_BW = 819e9        # TPU v5e HBM bandwidth

HLO_DUMP = "/tmp/pipeline_hlo.txt"
TRACE_DIR = "/tmp/npvp_trace"


def load_trace():
    files = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True))
    if not files:
        raise SystemExit("no trace found — run tools/trace_probe.py first")
    with gzip.open(files[-1], "rt") as f:
        return json.load(f), files[-1]


def module_map():
    try:
        txt = pathlib.Path(HLO_DUMP).read_text()
    except FileNotFoundError:
        return {}
    meta = {}
    for m in re.finditer(r'%(\S+?) = .*?metadata=\{op_name="([^"]*)"', txt):
        meta[m.group(1)] = m.group(2)
    return meta


def main(markdown=False):
    data, path = load_trace()
    meta = module_map()
    cats = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0.0])
    # aggregate by op NAME first: the trace has one event per op per
    # pipeline iteration — per-event rows would list each op TRACE_ITERS
    # times at 1/TRACE_ITERS of its per-iteration cost and mis-rank the
    # headroom table
    by_op = collections.defaultdict(lambda: [0.0, 0.0, 0.0, ""])
    for ev in data.get("traceEvents", []):
        a = ev.get("args") or {}
        if ev.get("ph") != "X" or "hlo_category" not in a:
            continue
        ms = ev["dur"] / 1e3 / TRACE_ITERS
        flops = float(a.get("model_flops", 0)) / TRACE_ITERS
        bytes_ = float(a.get("bytes_accessed", 0)) / TRACE_ITERS
        sol = max(flops / PEAK_TFLOPS, bytes_ / PEAK_BW) * 1e3  # ms
        c = cats[a["hlo_category"]]
        c[0] += ms; c[1] += flops; c[2] += bytes_; c[3] += sol
        o = by_op[ev["name"]]
        o[0] += ms; o[1] += flops; o[2] += bytes_; o[3] = a["hlo_category"]
    ops = [(ms, fl, by,
            max(fl / PEAK_TFLOPS, by / PEAK_BW) * 1e3, name, cat)
           for name, (ms, fl, by, cat) in by_op.items()]

    total_ms = sum(c[0] for c in cats.values())
    total_sol = sum(c[3] for c in cats.values())
    sep = "|" if markdown else "  "
    print(f"trace: {path}  ({TRACE_ITERS} iterations)")
    print(f"device total {total_ms:.1f} ms/batch; speed-of-light floor "
          f"for this HLO {total_sol:.1f} ms  "
          f"(= {total_ms / total_sol:.2f}x above SoL)\n")
    hdr = ["category", "ms", "SoL ms", "eff", "TF/s", "GB/s", "bound"]
    if markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
    else:
        print(f"{hdr[0]:<28}{hdr[1]:>8}{hdr[2]:>8}{hdr[3]:>6}"
              f"{hdr[4]:>7}{hdr[5]:>7}  {hdr[6]}")
    for name, (ms, fl, by, sol) in sorted(cats.items(),
                                          key=lambda kv: -kv[1][0]):
        tfs = fl / (ms / 1e3) / 1e12 if ms else 0
        gbs = by / (ms / 1e3) / 1e9 if ms else 0
        bound = ("MXU" if fl / PEAK_TFLOPS > by / PEAK_BW else "HBM")
        row = [name, f"{ms:.1f}", f"{sol:.1f}",
               f"{sol / ms:.2f}" if ms else "-",
               f"{tfs:.0f}", f"{gbs:.0f}", bound]
        if markdown:
            print("| " + " | ".join(row) + " |")
        else:
            print(f"{row[0]:<28}{row[1]:>8}{row[2]:>8}{row[3]:>6}"
                  f"{row[4]:>7}{row[5]:>7}  {row[6]}")

    print("\ntop-15 ops by (ms - SoL) headroom:")
    ops.sort(key=lambda o: -(o[0] - o[3]))
    for ms, fl, by, sol, name, cat in ops[:15]:
        mod = meta.get(name, "")
        mod = re.sub(r"layer_\d+", "layer_*", mod)
        mod = "/".join(p for p in mod.split("/") if "jit(" not in p)[:60]
        tfs = fl / (ms / 1e3) / 1e12 if ms else 0
        print(f"  {ms:6.2f} ms (SoL {sol:5.2f}, {tfs:5.1f} TF/s)  "
              f"{name[:28]:<28} {mod}")


if __name__ == "__main__":
    main(markdown="markdown" in sys.argv[1:])
