#!/bin/bash
# Unattended retry driver for tools/tpu_backlog.sh: probe every 3 minutes,
# run the backlog whenever the relay is healthy, stop when every marker
# exists (or after --hours H, default 10).  Log: /tmp/tpu_backlog/loop.log
set -u
HOURS=${1:-10}
MARK=/tmp/tpu_backlog
mkdir -p $MARK
DEADLINE=$(( $(date +%s) + HOURS * 3600 ))
ALL="e2e_ok aot_r4 kernel_rows ppe8 genotyper_jax fused_golden cold_walls bench_ok sweep dispatch_ab wgs4"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  done_all=1
  for m in $ALL; do [ -f $MARK/$m ] || done_all=0; done
  if [ $done_all = 1 ]; then echo "$(date -u +%FT%TZ) backlog complete"; break; fi
  echo "$(date -u +%FT%TZ) attempt (have: $(ls $MARK | grep -v loop.log | tr '\n' ' '))"
  bash /root/repo/tools/tpu_backlog.sh
  sleep 180
done
echo "$(date -u +%FT%TZ) loop exit"
