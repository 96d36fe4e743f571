#!/usr/bin/env bash
# Detached round-end watchdog for long TPU training runs.
#
# Round-3/4 lessons: (a) only the git tree survives between rounds — an
# Orbax checkpoint dir on /root is gone after a VM wipe, so trained evidence
# must land in git as an .npz weights artifact (tools/export_weights.py);
# (b) the driver runs bench.py on the one shared TPU chip at round end — a
# still-running trainer corrupts BENCH_r{N}.json.
#
# This script sleeps until DEADLINE (epoch seconds), then:
#   1. kills the supervisor + trainer by PIDFILE (never by pattern),
#   2. exports the latest+best predictor state to OUT_NPZ,
#   3. commits the artifact (and the training log copy) to git.
# It survives the builder session's death (nohup + detached).
#
# Usage: tools/round_end_watchdog.sh DEADLINE_EPOCH SUPERVISE_PIDFILE \
#            TRAINER_LOGFILE CONFIG_YAML AE_NPZ PRED_CKPT_DIR OUT_NPZ LOG_DEST
set -u
DEADLINE=$1; SUP_PIDFILE=$2; TRAIN_LOG=$3; CFG=$4; AE_NPZ=$5
PRED_CKPT=$6; OUT_NPZ=$7; LOG_DEST=$8
cd "$(dirname "$0")/.."

now=$(date +%s)
if [ "$DEADLINE" -gt "$now" ]; then
    sleep $((DEADLINE - now))
fi
echo "[watchdog $(date -u +%H:%M:%S)] deadline reached"

# 1. stop the supervisor first (so it cannot relaunch), then the trainer it
#    spawned (recorded in <logfile>.pid by supervise.sh). Also kill the
#    script's OWN pidfile <logfile>.sup.pid — round-4b postmortem: the
#    caller-supplied SUP_PIDFILE held a `bash -c` wrapper pid; killing only
#    it left supervise.sh alive to relaunch the trainer over the export.
for pf in "$SUP_PIDFILE" "${TRAIN_LOG}.sup.pid" "${TRAIN_LOG}.pid"; do
    if [ -f "$pf" ]; then
        pid=$(cat "$pf")
        kill "$pid" 2>/dev/null && echo "[watchdog] killed $pid ($pf)"
    fi
done
sleep 10
for pf in "$SUP_PIDFILE" "${TRAIN_LOG}.sup.pid" "${TRAIN_LOG}.pid"; do
    [ -f "$pf" ] && kill -9 "$(cat "$pf")" 2>/dev/null
done
sleep 5

# 2. export the best predictor + AE to a committable npz (CPU-only load).
python -m npvp_tpu.tools.export_weights --config_path "$CFG" \
    --override Env.platform=cpu \
    --ae_ckpt "$AE_NPZ" --pred_ckpt "$PRED_CKPT" --best --out "$OUT_NPZ"
rc=$?

# 3. commit whatever evidence exists (artifact may be absent if no ckpt yet).
cp -f "$TRAIN_LOG" "$LOG_DEST" 2>/dev/null || true
git add -f "$OUT_NPZ" "$LOG_DEST" 2>/dev/null
git commit -q -m "Watchdog: stop trainer before round-end bench; commit weights + log

No-Verification-Needed: automated artifact snapshot, no code change" \
    && echo "[watchdog] committed" || echo "[watchdog] nothing to commit (rc=$rc)"
