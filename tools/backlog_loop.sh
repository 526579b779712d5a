#!/bin/bash
# Unattended retry driver for tools/tpu_backlog.sh: probe every 3 minutes,
# run the backlog whenever the relay is responsive, stop when every marker
# exists (or after --hours H, default 10).  Log: /tmp/tpu_backlog/loop.log
set -u
HOURS=${1:-10}
MARK=/tmp/tpu_backlog
mkdir -p $MARK
DEADLINE=$(( $(date +%s) + HOURS * 3600 ))
ALL="aot_r5 e2e_r5 packedfused_golden kernel_rows_r5 bench_r5 sweep_r5 geometry_r5 cold_pallas_r5 wgs4_r5 genotyper_ab_r5 wgs4_jaxgt2_r5 nib_ab_r5 nibfused_golden sweep_healthy_r5"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  done_all=1
  for m in $ALL; do [ -f $MARK/$m ] || done_all=0; done
  if [ $done_all = 1 ]; then echo "$(date -u +%FT%TZ) backlog complete"; break; fi
  echo "$(date -u +%FT%TZ) attempt (have: $(ls $MARK | grep -v loop.log | tr '\n' ' '))"
  bash /root/repo/tools/tpu_backlog.sh
  sleep 180
done
echo "$(date -u +%FT%TZ) loop exit"
