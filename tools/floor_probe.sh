#!/bin/bash
# Periodically measure the scanned full pipeline to map shared-chip
# contention over time; appends to /tmp/floor_log.txt
for i in $(seq 1 14); do
  date +"%H:%M:%S" >> /tmp/floor_log.txt
  timeout 900 python /root/repo/tools/pipeline_probe.py xla 2>/dev/null \
    | grep -E "dispatched|scanned" >> /tmp/floor_log.txt
  sleep 1500
done
