"""Semantics tests for the perf-measurement instruments.

tools/floor_dossier.py and tools/hlo_probe.py join decide sub-5% perf
claims (CLAUDE.md), so their aggregation rules are pinned here against a
synthetic trace + HLO dump: per-op aggregation across TRACE_ITERS
iterations must yield per-iteration ms/flops/bytes, the roofline uses
t_SoL = max(flops/peak, bytes/bw), and the module join buckets by HLO
metadata op_name with jit(...) frames stripped and layer indices wildcarded.
"""

import gzip
import json

import pytest

import tools.floor_dossier as fd
import tools.hlo_probe as hp
from tools.trace_probe import TRACE_ITERS

HLO_TEXT = """
  %fusion.1 = f32[8,8]{1,0} fusion(%p0), kind=kOutput, metadata={op_name="jit(step)/jvp(Model)/decoder/layer_3/ffn/dot_general" source_file="m.py" source_line=1}
  %copy.2 = f32[8,8]{1,0} copy(%p1)
"""


def _write_fixture(tmp_path):
    hlo = tmp_path / "hlo.txt"
    hlo.write_text(HLO_TEXT)
    trace_dir = tmp_path / "trace"
    trace_dir.mkdir()
    # fusion.1: one event per iteration carrying that execution's duration
    # and flops/bytes (the profiler's convention); 2 ms per execution,
    # scaled so per-iteration SoL = 1.0 ms (compute-bound)
    events = [
        {"ph": "X", "name": "fusion.1", "dur": 2000.0,
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": fd.PEAK_TFLOPS * 1e-3,
                  "bytes_accessed": fd.PEAK_BW * 0.5e-3}}
        for _ in range(TRACE_ITERS)
    ]
    # copy.2: bandwidth-bound, 0.5 ms per execution exactly at the roofline
    events += [
        {"ph": "X", "name": "copy.2", "dur": 500.0,
         "args": {"hlo_category": "data formatting", "model_flops": 0,
                  "bytes_accessed": fd.PEAK_BW * 0.5e-3}}
        for _ in range(TRACE_ITERS)
    ]
    # an event without hlo_category (host-side) must be ignored
    events.append({"ph": "X", "name": "ignored", "dur": 9e9, "args": {}})
    with gzip.open(trace_dir / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return hlo, trace_dir


def test_floor_dossier_aggregation(tmp_path, monkeypatch, capsys):
    hlo, trace_dir = _write_fixture(tmp_path)
    monkeypatch.setattr(fd, "HLO_DUMP", str(hlo))
    monkeypatch.setattr(fd, "TRACE_DIR", str(trace_dir))
    fd.main()
    out = capsys.readouterr().out
    # totals are per-iteration: 2.0 + 0.5 ms measured, 1.0 + 0.5 SoL
    assert "device total 2.5 ms/batch" in out
    assert "floor for this HLO 1.5 ms" in out
    assert "1.67x above SoL" in out
    conv = next(l for l in out.splitlines() if l.startswith("convolution"))
    # eff = SoL/ms = 0.50; achieved = half of each peak → MXU-bound
    assert "0.50" in conv and conv.rstrip().endswith("MXU")
    fmt = next(l for l in out.splitlines() if l.startswith("data"))
    assert "1.00" in fmt and fmt.rstrip().endswith("HBM")
    # the headroom table resolves fusion.1 to its source module
    assert "decoder/layer_*/ffn" in out


def test_join_trace_module_buckets(tmp_path, monkeypatch, capsys):
    hlo, trace_dir = _write_fixture(tmp_path)
    monkeypatch.setattr(hp, "OUT", str(hlo))
    monkeypatch.setattr(hp, "TRACE_DIR", str(trace_dir))
    hp.join_trace()
    out = capsys.readouterr().out
    # jit(step) frame stripped, layer index wildcarded, first 4 path parts
    assert "jvp(Model)/decoder/layer_*/ffn" in out
    # copy.2 has no HLO metadata → <unmatched>; per-iteration ms reported
    assert "<unmatched>" in out
    assert "matched 2.0 / 2.5 ms" in out


def test_packed_bias_and_pack_factor():
    """The site-packing rules (kernels/temporal_attention.py) that the
    dossier's kernel-bucket numbers depend on: G caps at one 128-lane tile
    and must divide both the site count and the block."""
    from npvp_tpu.kernels.temporal_attention import (_pack_factor,
                                                     _packed_bias)
    import numpy as np

    assert _pack_factor(4096, 10, 20, 64) == 4   # 8*20 > 128
    assert _pack_factor(4096, 10, 10, 64) == 8   # 8*10 <= 128... then 16*10>128
    assert _pack_factor(6, 10, 10, 6) == 2       # divisibility: 6 % 4 != 0
    b = np.asarray(_packed_bias(None, 2, 3, 4))
    assert b.shape == (6, 8)
    assert (b[:3, :4] == 0).all() and (b[3:, 4:] == 0).all()
    assert (b[:3, 4:] < -1e30).all() and (b[3:, :4] < -1e30).all()
