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
    # override list, mirroring argparse's accumulating --override.
    # Isolate the chip-yield paths: with the DEFAULT /tmp paths, a real
    # chip user on this box (the driver's bench.py, a quality run) would
    # pause this test's fake trainer and time the test out — observed live
    # in round 5 when bench.py ran beside the suite.
    env = dict(os.environ,
               NPVP_CHIP_LOCK=str(tmp_path / "chip.lock"),
               NPVP_CHIP_HOLDER=str(tmp_path / "chip_holder.pid"))
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120,
                          env=env)
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


def test_backend_probe_holds_relaunch(tmp_path):
    """Round-5 lesson: a dead tunnel with fast-failing backend init burns
    MAX_RELAUNCHES in ~90 s/attempt. With NPVP_PROBE_CMD set, a failed
    relaunch is HELD until the probe answers — attempts only ever count
    genuine trainer failures. Sequence: run 0 crashes → probe fails (no
    marker file) → supervisor holds, noting it → marker appears → run 1
    launches with the resume override and completes."""
    import time

    trainer = tmp_path / "trainer.py"
    trainer.write_text(FAKE_TRAINER)
    ckpt, log, runfile = tmp_path / "ckpts", tmp_path / "run.log", \
        tmp_path / "runs.txt"
    marker = tmp_path / "backend_up"
    cmd = [str(SUPERVISE), "-l", str(log), "-c", str(ckpt),
           "-k", "P.resume_ckpt", "-s", "600", "-n", "5", "-d", "0",
           "--", sys.executable, str(trainer), str(ckpt), str(runfile),
           "crash", "--override", "Env.steps_per_dispatch=16"]
    env = dict(os.environ,
               NPVP_CHIP_LOCK=str(tmp_path / "chip.lock"),
               NPVP_CHIP_HOLDER=str(tmp_path / "chip_holder.pid"),
               NPVP_PROBE_CMD=f"test -f {marker}",
               NPVP_PROBE_INTERVAL_S="1")
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if log.exists() and "holding relaunch" in log.read_text():
                break
            time.sleep(0.5)
        else:
            raise AssertionError("supervisor never held the relaunch: "
                                 + (log.read_text() if log.exists() else ""))
        assert runfile.read_text() == "1"  # still only the crashed run
        marker.touch()                     # "tunnel back up"
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    text = log.read_text()
    assert proc.returncode == 0, text
    assert runfile.read_text() == "2"
    assert "resumed fine" in text


# Chip-yield trainer: heartbeats every second for ~40 s then exits 0. Used
# to observe the supervisor SIGSTOP/SIGCONT it around a bench-style lock.
YIELD_TRAINER = textwrap.dedent("""
    import sys, time
    for i in range(40):
        print("tick", i, flush=True)
        time.sleep(1)
    print("done", flush=True)
""")


def _proc_state(pid):
    with open(f"/proc/{pid}/stat") as f:
        return f.read().rpartition(")")[2].split()[0]


def test_chip_yield_pauses_and_resumes(tmp_path):
    """Full chip-yield sequence (round-4 VERDICT next-1): trainer running →
    lock taken (live owner pid) → trainer SIGSTOPped within one poll cycle →
    stall clock suspended well past STALL_S → lock released → SIGCONT →
    trainer completes normally (no stall kill, no relaunch)."""
    import time

    lock = tmp_path / "chip.lock"
    holder = tmp_path / "holder.pid"
    trainer = tmp_path / "trainer.py"
    trainer.write_text(YIELD_TRAINER)
    log = tmp_path / "run.log"
    env = dict(os.environ, NPVP_CHIP_LOCK=str(lock),
               NPVP_CHIP_HOLDER=str(holder))
    sup = subprocess.Popen(
        [str(SUPERVISE), "-l", str(log), "-c", str(tmp_path / "ck"),
         "-k", "P.resume_ckpt", "-s", "8", "-n", "2", "-d", "0",
         "--", sys.executable, str(trainer)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        # wait for the trainer to come up and be advertised
        deadline = time.time() + 30
        while time.time() < deadline and not holder.exists():
            time.sleep(0.2)
        assert holder.exists(), "supervisor must advertise the trainer pid"
        tpid = int(holder.read_text())
        assert _proc_state(tpid) in ("S", "R")

        # bench-style exclusive section: lock with OUR (live) pid
        lock.write_text(str(os.getpid()))
        deadline = time.time() + 15
        while time.time() < deadline and _proc_state(tpid) not in ("T", "t"):
            time.sleep(0.2)
        assert _proc_state(tpid) in ("T", "t"), "trainer must be SIGSTOPped"

        # hold the lock past STALL_S (8 s): the suspended stall clock must
        # NOT kill the paused trainer
        time.sleep(12)
        assert _proc_state(tpid) in ("T", "t")
        assert "STALL" not in log.read_text()

        lock.unlink()
        deadline = time.time() + 15
        while time.time() < deadline and _proc_state(tpid) in ("T", "t"):
            time.sleep(0.2)
        assert _proc_state(tpid) in ("S", "R"), "trainer must be resumed"

        out = sup.communicate(timeout=90)
        assert sup.returncode == 0, (out, log.read_text())
        text = log.read_text()
        assert "pausing trainer" in text
        assert "chip lock released" in text
        assert "done" in text
        assert "STALL" not in text
        assert not holder.exists(), "holder file must be cleared on exit"
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait()


def test_term_kills_trainer_and_writes_own_pid(tmp_path):
    """Round-4b postmortem: the recorded supervisor pid was a `bash -c`
    wrapper; killing it orphaned supervise.sh, which relaunched the trainer
    over the round-end export. Contract now: the script writes its OWN pid
    to <log>.sup.pid, and TERMing that pid takes the trainer down too."""
    import time

    trainer = tmp_path / "trainer.py"
    trainer.write_text(YIELD_TRAINER)
    log = tmp_path / "run.log"
    env = dict(os.environ, NPVP_CHIP_LOCK=str(tmp_path / "l"),
               NPVP_CHIP_HOLDER=str(tmp_path / "h"))
    # launch via a wrapper shell, mirroring how sessions launch it
    sup = subprocess.Popen(
        ["bash", "-c", f"exec 2>/dev/null; {SUPERVISE} -l {log} "
         f"-c {tmp_path}/ck -k P.resume_ckpt -s 600 -n 2 -d 0 -- "
         f"{sys.executable} {trainer}"], env=env)
    try:
        deadline = time.time() + 30
        sup_pidfile = Path(str(log) + ".sup.pid")
        t_pidfile = Path(str(log) + ".pid")
        while time.time() < deadline and not (sup_pidfile.exists()
                                              and t_pidfile.exists()):
            time.sleep(0.2)
        spid, tpid = int(sup_pidfile.read_text()), int(t_pidfile.read_text())
        # give run_once a beat to enter its monitor loop, then TERM the
        # pid from the pidfile (NOT the wrapper)
        time.sleep(1)
        os.kill(spid, 15)
        deadline = time.time() + 30
        while time.time() < deadline and os.path.exists(f"/proc/{tpid}"):
            time.sleep(0.3)
        assert not os.path.exists(f"/proc/{tpid}"), \
            "trainer must die with the supervisor"
        assert "supervisor terminated" in log.read_text()
        # the trap sleeps between TERM and KILL of the trainer before
        # removing its pidfile — wait for the cleanup to land
        deadline = time.time() + 20
        while time.time() < deadline and sup_pidfile.exists():
            time.sleep(0.3)
        assert not sup_pidfile.exists()
    finally:
        if sup.poll() is None:
            sup.kill()
        sup.wait()


def test_stale_lock_is_ignored(tmp_path):
    """A lock whose owner pid is dead must not pause the trainer (a crashed
    bench cannot wedge training)."""
    import time

    lock = tmp_path / "chip.lock"
    holder = tmp_path / "holder.pid"
    # a pid that is certainly dead: spawn+reap a child
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    lock.write_text(str(p.pid))
    trainer = tmp_path / "trainer.py"
    trainer.write_text(textwrap.dedent("""
        import time
        for i in range(8):
            print("tick", i, flush=True)
            time.sleep(1)
    """))
    log = tmp_path / "run.log"
    env = dict(os.environ, NPVP_CHIP_LOCK=str(lock),
               NPVP_CHIP_HOLDER=str(holder))
    sup = subprocess.run(
        [str(SUPERVISE), "-l", str(log), "-c", str(tmp_path / "ck"),
         "-k", "P.resume_ckpt", "-s", "600", "-n", "2", "-d", "0",
         "--", sys.executable, str(trainer)],
        env=env, capture_output=True, text=True, timeout=60)
    assert sup.returncode == 0, sup.stderr + log.read_text()
    assert "pausing trainer" not in log.read_text()


def test_chip_lock_contextmanager(tmp_path, monkeypatch):
    """npvp_tpu.core.chip_lock.chip_lock writes our pid, waits for the
    holder pause, and removes the lock on exit (also on exception)."""
    lock = tmp_path / "chip.lock"
    holder = tmp_path / "holder.pid"
    monkeypatch.setenv("NPVP_CHIP_LOCK", str(lock))
    monkeypatch.setenv("NPVP_CHIP_HOLDER", str(holder))
    import npvp_tpu.core.chip_lock as cl

    # no holder: trivial path
    with cl.chip_lock(grace_s=1, drain_s=0):
        assert lock.read_text() == str(os.getpid())
    assert not lock.exists()

    # live holder already stopped: drain path, lock removed on exception
    p = subprocess.Popen([sys.executable, "-c",
                          "import time; time.sleep(60)"])
    try:
        holder.write_text(str(p.pid))
        os.kill(p.pid, 19)  # SIGSTOP
        with pytest.raises(RuntimeError):
            with cl.chip_lock(grace_s=5, drain_s=0):
                raise RuntimeError("boom")
        assert not lock.exists()
    finally:
        p.kill()
        p.wait()
