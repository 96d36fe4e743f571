"""tools/evidence_cron.sh — periodic insurance snapshots into git.

Round-4 lesson (VERDICT round-4, weak 2 / next 5): evidence cadence was
tied to a human-guessed round deadline; the committed quality table lagged
the live run by 120+ epochs. The cron's contract, pinned against a sandbox
git repo and a fake exporter:

- every cycle while the supervisor is alive: export -> log copy ->
  convergence report -> commit, with the epoch number in the message;
- cycles with no change (same checkpoint, same log) do NOT create a
  commit;
- when the supervisor dies, one final snapshot is taken and the cron
  exits on its own.
"""

import os
import stat
import subprocess
import sys
import textwrap
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
CRON = REPO / "tools" / "evidence_cron.sh"

# Stand-in for export_weights: copies the "checkpoint" (a plain file whose
# content the test mutates to simulate training progress) to --out.
FAKE_EXPORT = textwrap.dedent("""
    import argparse, shutil, sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path"); ap.add_argument("--override")
    ap.add_argument("--ae_ckpt"); ap.add_argument("--pred_ckpt")
    ap.add_argument("--best", action="store_true"); ap.add_argument("--out")
    a = ap.parse_args()
    shutil.copy(a.pred_ckpt, a.out)
""")


def _git(repo, *args):
    return subprocess.run(["git", "-C", str(repo), *args],
                          capture_output=True, text=True, check=True)


def test_cron_commits_snapshots_and_skips_unchanged(tmp_path):
    repo = tmp_path / "repo"
    (repo / "results").mkdir(parents=True)
    _git(tmp_path, "init", "-q", str(repo))
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    (repo / "seed.txt").write_text("seed")
    _git(repo, "add", "seed.txt")
    _git(repo, "commit", "-q", "-m", "seed")

    export = tmp_path / "fake_export.py"
    export.write_text(FAKE_EXPORT)
    ckpt = tmp_path / "ckpt.bin"
    ckpt.write_text("weights-v1")
    train_log = tmp_path / "train.log"
    train_log.write_text("epoch 0: loss_val=1.0\nepoch 1: loss_val=0.5\n")
    sup_pidfile = tmp_path / "sup.pid"
    # a live "supervisor": this test process
    sup_pidfile.write_text(str(os.getpid()))

    env = dict(os.environ,
               EVIDENCE_REPO=str(repo),
               EVIDENCE_EXPORT_CMD=f"{sys.executable} {export}")
    cron = subprocess.Popen(
        [str(CRON), "2", str(sup_pidfile),
         "cfg.yaml", "ae.npz", str(ckpt),
         str(repo / "results" / "weights.npz"),
         str(train_log), str(repo / "results" / "train_log.txt"),
         str(repo / "results" / "convergence.md")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        def commits():
            out = _git(repo, "log", "--oneline").stdout.strip().splitlines()
            return [l for l in out if "Evidence cron" in l]

        # cycle 1: snapshot committed with the epoch in the message
        deadline = time.time() + 30
        while time.time() < deadline and not commits():
            time.sleep(0.5)
        assert commits(), cron.stderr
        assert "epoch 1" in commits()[0]
        assert (repo / "results" / "weights.npz").read_text() == "weights-v1"
        assert "Best epoch" in (repo / "results" / "convergence.md").read_text()

        # cycle 2+ with NO progress: no new commit
        time.sleep(5)
        assert len(commits()) == 1, commits()

        # progress: new checkpoint + new epochs -> exactly one more commit
        ckpt.write_text("weights-v2")
        train_log.write_text(train_log.read_text()
                             + "epoch 2: loss_val=0.25\n")
        deadline = time.time() + 30
        while time.time() < deadline and len(commits()) < 2:
            time.sleep(0.5)
        assert len(commits()) >= 2, commits()
        assert "epoch 2" in commits()[0]
        assert (repo / "results" / "weights.npz").read_text() == "weights-v2"

        # supervisor death -> final snapshot cycle, then clean exit
        ckpt.write_text("weights-v3")
        sup_pidfile.write_text("999999999")  # dead pid
        cron.wait(timeout=30)
        assert cron.returncode == 0
        assert (repo / "results" / "weights.npz").read_text() == "weights-v3"
        assert "final snapshot" in cron.stderr.read()
    finally:
        if cron.poll() is None:
            cron.kill()
            cron.wait()


def test_cron_is_executable():
    assert os.access(CRON, os.X_OK), "tools/evidence_cron.sh must be +x"
    assert stat.S_IMODE(CRON.stat().st_mode) & stat.S_IXUSR
