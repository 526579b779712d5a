#!/bin/bash
# Cold-process chrM walls on the device path (VERDICT r4 #8), N runs with
# golden verification; each line carries the CLI's own cold-start
# attribution (process_age_s / pre_main_s / init_profile) plus the relay
# probe BEFORE the series so the phase class is recorded with the data.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export PYTHONUNBUFFERED=1
cd /root/repo
N=${1:-3}
OUT=${2:-perf_artifacts/cold_pallas_r5.jsonl}
probe=$(timeout 300 python tools/relay_probe.py 2>/dev/null | tail -1)
case "$probe" in
  *'"steady_op_ms"'*) : ;;
  *) echo "relay wedged; skipping cold-pallas series"; exit 1 ;;
esac
# one series per file: a retried series must not inherit earlier lines
# (the backlog's all-golden marker counts golden lines in this file)
: > "$OUT"
echo "# probe-before: $probe" >> "$OUT"
for i in $(seq 1 "$N"); do
  t0=$(date +%s.%N)
  timeout 900 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam \
    -R fixtures/chrM.fa -O /tmp/out_coldp$i.vcf --pairhmm pallas --stats \
    > /tmp/coldp_stats$i.json 2>&1
  t1=$(date +%s.%N)
  wall=$(python -c "print(f'{$t1 - $t0:.3f}')")
  if diff -q /tmp/out_coldp$i.vcf fixtures/chrM.golden.vcf >/dev/null; then
    golden=true
  else
    golden=false
  fi
  # the stats JSON precedes the final "HaplotypeCaller done" line
  grep -E '^\{' /tmp/coldp_stats$i.json | tail -1 | python -c "
import json,sys
line=sys.stdin.read().strip()
try: d=json.loads(line)
except Exception: d={'raw': line[-400:]}
d['process_wall_s']=float('$wall'); d['golden']=json.loads('$golden')
print(json.dumps(d))
" >> "$OUT"
  echo "run $i: ${wall}s golden=$golden"
done
