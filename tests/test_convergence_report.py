"""tools/convergence_report.py: trainer-log parsing + slope report."""

import json
import math
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import convergence_report as cr


def _write_log(path, n=120, dup_epoch=None):
    lines = []
    for e in range(n):
        val = 1.0 / (1.0 + 0.05 * e)  # decreasing, flattening
        lines.append(f"epoch {e}: Image_L1_train=0.1 loss_val={val:.6f}")
    if dup_epoch is not None:
        # supervisor relaunch replays an epoch — later line must win
        lines.append(f"epoch {dup_epoch}: Image_L1_train=0.1 loss_val=9.0")
    path.write_text("\n".join(lines) + "\n")


def test_parse_later_duplicate_wins(tmp_path):
    log = tmp_path / "t.log"
    _write_log(log, n=10, dup_epoch=3)
    rows = cr.parse_log(log)
    assert rows[3]["loss_val"] == 9.0
    assert len(rows) == 10


def test_report_best_and_slopes(tmp_path):
    log = tmp_path / "t.log"
    _write_log(log, n=120)
    rep = cr.report(cr.parse_log(log), "loss_val", stride=25)
    assert rep["epochs"] == 120
    assert rep["best_epoch"] == 119  # monotone decreasing
    assert all(s["slope"] < 0 for s in rep["slopes_per_100"])
    # flattening curve: later windows have smaller-magnitude slopes
    slopes = [s["slope"] for s in rep["slopes_per_100"]]
    assert abs(slopes[-1]) < abs(slopes[0])
    # sampled rows hit the stride plus the final epoch
    epochs = [e for e, _ in rep["sampled"]]
    assert epochs[0] == 0 and epochs[-1] == 119 and 25 in epochs


def test_cli_writes_md_and_json(tmp_path):
    log = tmp_path / "t.log"
    _write_log(log, n=60)
    out = tmp_path / "conv.md"
    subprocess.run([sys.executable, "tools/convergence_report.py", str(log),
                    "--out", str(out)],
                   check=True, cwd=Path(__file__).resolve().parents[1])
    assert "Best epoch" in out.read_text()
    rep = json.loads(out.with_suffix(".json").read_text())
    assert not math.isnan(rep["best_value"])


def test_cli_merges_continuation_logs(tmp_path):
    # a run continued across npz warm-starts writes a second log; epochs in
    # the later log must win (it replays the warm-start epoch)
    log_a, log_b = tmp_path / "a.log", tmp_path / "b.log"
    _write_log(log_a, n=40)
    lines = [f"epoch {e}: Image_L1_train=0.1 loss_val={0.5 / (1 + e):.6f}"
             for e in range(39, 80)]
    log_b.write_text("\n".join(lines) + "\n")
    out = tmp_path / "conv.md"
    # stride 13 makes epoch 39 (present in BOTH logs) land in the sampled
    # rows, so later-log-wins is actually observable (advisor round-4: with
    # the default stride 25 the old assertion was vacuous)
    proc = subprocess.run([sys.executable, "tools/convergence_report.py",
                           str(log_a), str(log_b), "--stride", "13",
                           "--out", str(out)],
                          check=True, capture_output=True, text=True,
                          cwd=Path(__file__).resolve().parents[1])
    rep = json.loads(out.with_suffix(".json").read_text())
    assert rep["epochs"] == 80
    assert rep["best_epoch"] == 79
    # epoch 39 exists in both logs; log_b's value must win
    assert any(e == 39 and abs(v - 0.5 / 40) < 1e-6
               for e, v in rep["sampled"]), rep["sampled"]
    # overlapping logs are flagged on stderr and in the markdown header
    assert "overrides 1 earlier-log epoch(s) 39" in proc.stderr
    assert "overrides 1 earlier-log epoch(s) 39" in out.read_text()


def test_cli_disjoint_logs_no_overlap_warning(tmp_path):
    log_a, log_b = tmp_path / "a.log", tmp_path / "b.log"
    _write_log(log_a, n=40)
    lines = [f"epoch {e}: loss_val={0.5 / (1 + e):.6f}" for e in range(40, 80)]
    log_b.write_text("\n".join(lines) + "\n")
    proc = subprocess.run([sys.executable, "tools/convergence_report.py",
                           str(log_a), str(log_b)],
                          check=True, capture_output=True, text=True,
                          cwd=Path(__file__).resolve().parents[1])
    assert "overrides" not in proc.stderr
    assert "overrides" not in proc.stdout


def test_missing_metric_exits_with_hint(tmp_path):
    log = tmp_path / "t.log"
    _write_log(log, n=5)
    try:
        cr.report(cr.parse_log(log), "nope", 25)
    except SystemExit as e:
        assert "loss_val" in str(e)
    else:
        raise AssertionError("expected SystemExit")
