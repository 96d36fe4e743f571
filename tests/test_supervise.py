"""tools/supervise.sh — the long-run crash/stall relaunch wrapper.

Round 3's NPVP-D run died in a TPU outage with the supervisor living only
in /tmp (VERDICT round-3, weak 5). The committed script's contract is
pinned here against a fake trainer:

- a crash is relaunched WITH a resume override once a checkpoint exists
  (and without one before any checkpoint was written);
- a stall (log silent beyond the threshold) is detected, the trainer is
  killed by PID, and the relaunch resumes;
- a clean exit stops the supervisor with rc=0.
"""

import os
import stat
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SUPERVISE = REPO / "tools" / "supervise.sh"

# A stand-in trainer with the real CLI shape (--override list, accumulating
# flags). Run 1: writes a checkpoint, crashes. Run 2: must see the resume
# override, completes.
FAKE_TRAINER = textwrap.dedent("""
    import json, os, sys, time
    ckpt = sys.argv[1]
    runfile = sys.argv[2]
    mode = sys.argv[3]            # "crash" | "stall"
    overrides = sys.argv[4:]
    runs = int(open(runfile).read()) if os.path.exists(runfile) else 0
    open(runfile, "w").write(str(runs + 1))
    print("trainer start, run", runs, "overrides", overrides, flush=True)
    resume = [o for o in overrides if o.startswith("P.resume_ckpt=")]
    if runs == 0:
        assert not resume, f"fresh launch must not resume: {overrides}"
        os.makedirs(os.path.join(ckpt, "100"), exist_ok=True)
        if mode == "crash":
            sys.exit(7)
        # stall: go silent forever (no output, never exits)
        time.sleep(3600)
    assert resume == [f"P.resume_ckpt={ckpt}"], overrides
    # base overrides must survive the supervisor's append
    assert "Env.steps_per_dispatch=16" in overrides, overrides
    print("resumed fine", flush=True)
    sys.exit(0)
""")


def _run_supervisor(tmp_path, mode, stall_s):
    trainer = tmp_path / "trainer.py"
    trainer.write_text(FAKE_TRAINER)
    ckpt = tmp_path / "ckpts"
    log = tmp_path / "run.log"
    runfile = tmp_path / "runs.txt"
    cmd = [str(SUPERVISE), "-l", str(log), "-c", str(ckpt),
           "-k", "P.resume_ckpt", "-s", str(stall_s), "-n", "5", "-d", "0",
           "--", sys.executable, str(trainer), str(ckpt), str(runfile),
           mode, "--override", "Env.steps_per_dispatch=16"]
    # the fake trainer treats everything after its 3 positionals as the
    # override list, mirroring argparse's accumulating --override
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    return proc, log, runfile


def test_supervisor_is_executable():
    assert os.access(SUPERVISE, os.X_OK), "tools/supervise.sh must be +x"
    assert stat.S_IMODE(SUPERVISE.stat().st_mode) & stat.S_IXUSR


def test_crash_relaunch_resumes(tmp_path):
    proc, log, runfile = _run_supervisor(tmp_path, "crash", stall_s=600)
    assert proc.returncode == 0, proc.stderr + log.read_text()
    assert runfile.read_text() == "2"  # exactly one relaunch
    text = log.read_text()
    assert "launching fresh" in text
    assert "launching with resume" in text
    assert "resumed fine" in text
    assert "trainer completed (rc=0)" in text


@pytest.mark.slow
def test_stall_kill_and_resume(tmp_path):
    # run 1 writes a checkpoint then goes silent; the watchdog must kill it
    # (log mtime stale > 6 s) and relaunch with the resume override
    proc, log, runfile = _run_supervisor(tmp_path, "stall", stall_s=6)
    assert proc.returncode == 0, proc.stderr + log.read_text()
    assert runfile.read_text() == "2"
    text = log.read_text()
    assert "STALL: log silent" in text
    assert "resumed fine" in text
