"""Chip-yield protocol between the driver's bench and long training runs.

Round-4 lesson (VERDICT round-4, weak 1 / next 1): two of four rounds lost
their ``BENCH_r{N}.json`` because a supervised trainer was holding the one
shared TPU chip when the driver ran ``bench.py``, starving the bench
through the driver's timeout. Timetable-based mitigation (a watchdog armed
at a guessed round length) failed twice; the fix is a *protocol*:

- any process that needs the chip exclusively (bench.py, quality runs,
  probes) takes :func:`chip_lock` — it writes its pid to :func:`lock_path`,
  waits for the supervised trainer (advertised in :func:`holder_path` by
  ``tools/supervise.sh``) to be SIGSTOPped, lets queued device work drain,
  and removes the lock on exit (including on signals, via context exit);
- ``tools/supervise.sh`` polls the lock every cycle: while a lock
  with a *live* owner pid exists it SIGSTOPs the trainer (suspending its
  stall clock); when the lock disappears or its owner dies it SIGCONTs.

A crashed lock-taker therefore cannot wedge training: the supervisor
treats a lock whose pid is gone as released. A wedged supervisor cannot
block the bench either: the lock-taker only *waits* for the pause up to
``grace_s`` and then proceeds regardless (one stopped trainer cannot
outcompete an exclusive benchmark for long; the wait is a courtesy that
empties the chip's queue, not a correctness requirement).

Paths are overridable via ``NPVP_CHIP_LOCK`` / ``NPVP_CHIP_HOLDER`` so
tests can run the full sequence against a fake trainer.
"""

from __future__ import annotations

import contextlib
import os
import time

DEFAULT_LOCK = "/tmp/npvp_chip.lock"
DEFAULT_HOLDER = "/tmp/npvp_chip_holder.pid"


def lock_path() -> str:
    return os.environ.get("NPVP_CHIP_LOCK", DEFAULT_LOCK)


def holder_path() -> str:
    return os.environ.get("NPVP_CHIP_HOLDER", DEFAULT_HOLDER)


def holder_pid() -> int | None:
    """Pid of the supervised chip-holding trainer, if one is alive."""
    try:
        with open(holder_path()) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    return pid if os.path.exists(f"/proc/{pid}") else None


def _is_stopped(pid: int) -> bool:
    """True if ``pid`` is in SIGSTOP state ('T' in /proc/<pid>/stat)."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            stat = f.read()
        # field 3 is the state; comm (field 2) may contain spaces/parens —
        # parse after the LAST ')'
        return stat.rpartition(")")[2].split()[0] in ("T", "t")
    except (OSError, IndexError):
        return False


@contextlib.contextmanager
def chip_lock(grace_s: float = 45.0, drain_s: float = 5.0,
              poll_s: float = 0.5):
    """Exclusive-chip section: pause any supervised trainer for the body.

    Writes this process's pid to ``LOCK_PATH``, waits up to ``grace_s`` for
    the advertised holder (if any) to reach stopped state, sleeps
    ``drain_s`` for already-dispatched device work to finish, yields, and
    removes the lock (the supervisor then SIGCONTs the trainer).
    """
    path = lock_path()
    with open(path, "w") as f:
        f.write(str(os.getpid()))
    try:
        pid = holder_pid()
        if pid is not None:
            deadline = time.monotonic() + grace_s
            while time.monotonic() < deadline:
                if _is_stopped(pid) or not os.path.exists(f"/proc/{pid}"):
                    break
                time.sleep(poll_s)
            else:
                print(f"[chip_lock] holder {pid} not paused after "
                      f"{grace_s:.0f}s — proceeding anyway", flush=True)
            time.sleep(drain_s)
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(path)
