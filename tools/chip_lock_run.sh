#!/usr/bin/env bash
# Run CMD with the exclusive-chip lock held (chip-yield protocol,
# npvp_tpu/core/chip_lock.py): any trainer running under tools/supervise.sh
# is SIGSTOPped for the duration and SIGCONTed afterwards. Use this for
# quality runs / probes that need the shared TPU while a training run is in
# flight:
#
#   tools/chip_lock_run.sh python tools/quality_report.py --config_path ...
#
# The lock is released on ANY exit (signal included); a crash of this
# wrapper leaves a stale lock whose pid is dead, which the supervisor
# ignores — training cannot be wedged.
set -u
LOCK=${NPVP_CHIP_LOCK:-/tmp/npvp_chip.lock}
GRACE=${NPVP_CHIP_GRACE_S:-45}

echo $$ > "$LOCK"
trap 'rm -f "$LOCK"' EXIT INT TERM

# wait for the holder (if any) to be paused, matching chip_lock()'s grace
HOLDER=${NPVP_CHIP_HOLDER:-/tmp/npvp_chip_holder.pid}
if [ -f "$HOLDER" ]; then
    hpid=$(cat "$HOLDER" 2>/dev/null)
    if [ -n "$hpid" ] && kill -0 "$hpid" 2>/dev/null; then
        for _ in $(seq 1 $((GRACE * 2))); do
            # state = first field after the ')' closing comm in /proc/pid/stat
            state=$(sed 's/.*) //' "/proc/$hpid/stat" 2>/dev/null | cut -d' ' -f1)
            if [ "$state" = "T" ] || [ "$state" = "t" ]; then break; fi
            kill -0 "$hpid" 2>/dev/null || break
            sleep 0.5
        done
        sleep 5   # drain already-dispatched device work
    fi
fi

"$@"
