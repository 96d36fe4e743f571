#!/usr/bin/env bash
# Run supervisor for long TPU training runs (round-3 lesson, VERDICT item 1):
# the axon tunnel goes UNAVAILABLE for stretches of hours, in two modes —
# the trainer process CRASHES (backend init raises) or it STALLS (a hung
# in-process backend call that never returns). This wrapper relaunches the
# trainer on both, resuming from its own checkpoints.
#
# Usage:
#   tools/supervise.sh -l LOGFILE -c CKPT_DIR -k Group.resume_ckpt \
#       [-s STALL_SECS] [-n MAX_RELAUNCHES] [-d RETRY_DELAY_SECS] \
#       [-p MAX_PAUSE_SECS] \
#       -- python -m npvp_tpu.train.stage2_predictor --config_path CFG \
#            --override Env.steps_per_dispatch=16
#
# Behavior:
#   * runs the command, appending stdout+stderr to LOGFILE;
#   * whenever CKPT_DIR already contains a checkpoint (a numeric step
#     subdirectory), appends `--override Group.resume_ckpt=CKPT_DIR` so the
#     (re)launch resumes instead of restarting — the trainer CLI's --override
#     flag accumulates across repeats (train/common.py build_argparser);
#   * kills (by PID, never by pattern) and relaunches if LOGFILE stays
#     silent for STALL_SECS (default 1800 — the first remote compile can
#     legitimately take 600 s);
#   * relaunches on nonzero exit after RETRY_DELAY (default 60 s);
#   * exits 0 when the trainer completes, 1 after MAX_RELAUNCHES failures.
#
# Chip-yield protocol (round-4 VERDICT next-1; npvp_tpu/core/chip_lock.py):
#   * advertises the trainer pid in $NPVP_CHIP_HOLDER
#     (default /tmp/npvp_chip_holder.pid);
#   * while $NPVP_CHIP_LOCK (default /tmp/npvp_chip.lock) exists AND the
#     pid written inside it is alive, SIGSTOPs the trainer so an exclusive
#     chip user (the driver's bench.py, a quality run) gets the device;
#     the stall clock is suspended while paused;
#   * SIGCONTs when the lock disappears or its owner dies (a crashed
#     lock-taker cannot wedge training), or after MAX_PAUSE_SECS
#     (default 2700 — longer than bench.py's whole 1800 s budget) as a
#     backstop against a forgotten lockfile with a long-lived owner.
set -u

STALL_S=1800
MAX_RELAUNCHES=100
RETRY_DELAY=60
MAX_PAUSE_S=2700
LOG="" CKPT="" KEY=""
LOCK=${NPVP_CHIP_LOCK:-/tmp/npvp_chip.lock}
HOLDER=${NPVP_CHIP_HOLDER:-/tmp/npvp_chip_holder.pid}

while getopts "l:c:k:s:n:d:p:" opt; do
    case "$opt" in
        l) LOG=$OPTARG ;;
        c) CKPT=$OPTARG ;;
        k) KEY=$OPTARG ;;
        s) STALL_S=$OPTARG ;;
        n) MAX_RELAUNCHES=$OPTARG ;;
        d) RETRY_DELAY=$OPTARG ;;
        p) MAX_PAUSE_S=$OPTARG ;;
        *) echo "usage: see header of $0" >&2; exit 2 ;;
    esac
done
shift $((OPTIND - 1))
if [ "${1:-}" = "--" ]; then shift; fi
if [ -z "$LOG" ] || [ -z "$CKPT" ] || [ -z "$KEY" ] || [ $# -eq 0 ]; then
    echo "usage: $0 -l LOG -c CKPT_DIR -k Group.resume_ckpt -- CMD..." >&2
    exit 2
fi

mkdir -p "$(dirname "$LOG")"
PIDFILE="${LOG}.pid"
# The supervisor's OWN pid — of this script process, NOT any shell wrapper
# that launched it. Round-4b postmortem: the recorded "supervisor pid" was
# a `bash -c` wrapper; killing it left supervise.sh alive, which relaunched
# the trainer over the round-end export. Kill THIS pidfile instead.
SUP_PIDFILE="${LOG}.sup.pid"
echo $$ > "$SUP_PIDFILE"

note() { echo "[supervise $(date -u +%H:%M:%S)] $*" | tee -a "$LOG" >&2; }

# Dying must take the trainer along: a TERM/INT to the supervisor kills the
# current trainer by pid and exits, so no orphan keeps the chip.
TRAINER_PID=""
on_term() {
    note "supervisor terminated — stopping trainer ${TRAINER_PID:-<none>}"
    if [ -n "$TRAINER_PID" ]; then
        kill "$TRAINER_PID" 2>/dev/null
        sleep 3
        kill -9 "$TRAINER_PID" 2>/dev/null
    fi
    rm -f "$HOLDER" "$SUP_PIDFILE"
    exit 143
}
trap on_term TERM INT

has_ckpt() {
    # Orbax layout: one numeric subdirectory per saved step
    compgen -G "$CKPT/[0-9]*" > /dev/null 2>&1
}

wait_backend() {
    # Round-5 lesson: a multi-hour tunnel outage with fast-failing backend
    # init burns through MAX_RELAUNCHES (~90 s/attempt) and then training
    # stops silently. When NPVP_PROBE_CMD is set (opt-in — tests and
    # non-TPU runs skip this), hold relaunches until the probe answers, so
    # attempts only count genuine trainer failures. Probes run in a
    # SUBPROCESS with a timeout (an in-process hung init is unrecoverable).
    [ -z "${NPVP_PROBE_CMD:-}" ] && return 0
    local t0=$(date +%s) max=${NPVP_PROBE_MAX_S:-21600}
    while :; do
        if timeout 150 bash -c "$NPVP_PROBE_CMD" >/dev/null 2>&1; then
            return 0
        fi
        local waited=$(( $(date +%s) - t0 ))
        if [ "$waited" -gt "$max" ]; then
            note "backend still down after ${waited}s — relaunching anyway"
            return 1
        fi
        note "backend unavailable — holding relaunch (${waited}s)"
        touch "$LOG"   # a held relaunch is not a stall
        sleep "${NPVP_PROBE_INTERVAL_S:-120}"
    done
}

lock_active() {
    # an exclusive chip user holds the lock iff the file exists AND the pid
    # written inside is alive (a stale lock from a crashed taker is ignored)
    [ -f "$LOCK" ] || return 1
    local lpid
    lpid=$(cat "$LOCK" 2>/dev/null)
    [ -n "$lpid" ] && kill -0 "$lpid" 2>/dev/null
}

run_once() {
    "$@" >> "$LOG" 2>&1 &
    local pid=$!
    TRAINER_PID=$pid
    echo "$pid" > "$PIDFILE"
    echo "$pid" > "$HOLDER"
    local paused=0 pause_t0=0
    while kill -0 "$pid" 2>/dev/null; do
        sleep 5
        if lock_active; then
            if [ "$paused" -eq 0 ]; then
                note "chip lock taken ($(cat "$LOCK" 2>/dev/null)) — pausing trainer $pid"
                kill -STOP "$pid" 2>/dev/null
                paused=1
                pause_t0=$(date +%s)
            elif [ $(( $(date +%s) - pause_t0 )) -gt "$MAX_PAUSE_S" ]; then
                note "chip lock held > ${MAX_PAUSE_S}s — resuming anyway"
                kill -CONT "$pid" 2>/dev/null
                paused=0
                touch "$LOG"
            fi
            continue   # stall clock suspended while paused
        elif [ "$paused" -eq 1 ]; then
            note "chip lock released — resuming trainer $pid"
            kill -CONT "$pid" 2>/dev/null
            paused=0
            touch "$LOG"   # reset the stall clock from the resume instant
        fi
        if [ -f "$LOG" ]; then
            local age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
            if [ "$age" -gt "$STALL_S" ]; then
                note "STALL: log silent ${age}s > ${STALL_S}s — killing $pid"
                kill "$pid" 2>/dev/null
                sleep 5
                kill -9 "$pid" 2>/dev/null
                wait "$pid" 2>/dev/null
                rm -f "$HOLDER"
                TRAINER_PID=""
                return 99
            fi
        fi
    done
    rm -f "$HOLDER"
    wait "$pid"
    local rc=$?
    TRAINER_PID=""
    return $rc
}

attempt=0
while :; do
    extra=()
    if has_ckpt; then
        extra=(--override "$KEY=$CKPT")
        note "launching with resume: $KEY=$CKPT"
    else
        note "launching fresh (no checkpoint in $CKPT yet)"
    fi
    run_once "$@" "${extra[@]}"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        note "trainer completed (rc=0) after $attempt relaunch(es)"
        rm -f "$SUP_PIDFILE"
        exit 0
    fi
    attempt=$((attempt + 1))
    if [ "$attempt" -ge "$MAX_RELAUNCHES" ]; then
        note "giving up after $attempt relaunches (last rc=$rc)"
        rm -f "$SUP_PIDFILE"
        exit 1
    fi
    note "trainer died (rc=$rc) — relaunch $attempt/$MAX_RELAUNCHES in ${RETRY_DELAY}s"
    sleep "$RETRY_DELAY"
    wait_backend
done
