#!/bin/bash
# Round-4 TPU validation backlog: run whenever the relay looks responsive.
# Two tiers (the relay throttles in phases lasting minutes to hours):
#   ALIVE  (probe returns at all)  -> golden e2e checks, warm_cache, and
#          kernel-ONLY benchmarks (device-resident loops amortize per-op
#          relay overhead, so kernel numbers are valid in degraded phases)
#   HEALTHY (steady_op_ms < 12)    -> sustained bench, dispatch/sweep A/Bs,
#          cold-wall table, wgs4 capstone (all dominated by per-op cost)
# Each step is skipped once its marker exists; drive with backlog_loop.sh.
set -u
set -o pipefail
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
MARK=/tmp/tpu_backlog
ART=/root/repo/perf_artifacts
mkdir -p $MARK $ART

probe=$(timeout 90 python tools/relay_probe.py 2>/dev/null | tail -1)
echo "probe: $probe"
case "$probe" in
  *'"steady_op_ms"'*) alive=1 ;;
  *) alive=0 ;;
esac
case "$probe" in
  *'"healthy": true'*) healthy=1 ;;
  *) healthy=0 ;;
esac
if [ $alive = 0 ]; then
  echo "relay wedged (probe produced nothing); aborting this attempt"
  exit 1
fi
[ $healthy = 1 ] || echo "relay alive but degraded: running tier-1 steps only"

# ---------- tier 1: valid whenever the relay is ALIVE ----------

if [ ! -f $MARK/e2e_ok ]; then
  echo "== chrM pallas e2e (golden) =="
  timeout 1800 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_tpu.vcf --pairhmm pallas --stats 2>&1 | tail -2
  if diff -q /tmp/out_tpu.vcf fixtures/chrM.golden.vcf; then
    echo TPU_GOLDEN_OK; touch $MARK/e2e_ok
  else
    echo TPU_GOLDEN_MISMATCH_OR_TIMEOUT; exit 1
  fi
fi

if [ ! -f $MARK/aot_r4 ]; then
  echo "== warm_cache (full: device pre-load + AOT regen) =="
  timeout 3600 python tools/warm_cache.py > /tmp/warm_cache_r4.log 2>&1
  wc_status=$?
  tail -4 /tmp/warm_cache_r4.log
  [ $wc_status = 0 ] && touch $MARK/aot_r4 || echo "warm_cache FAILED ($wc_status); full log: /tmp/warm_cache_r4.log"
fi

if [ ! -f $MARK/kernel_rows ]; then
  echo "== kernel rows A/B (ppe 1/2/4/8; kernel-only, phase-insensitive) =="
  echo "# capture $(date -u +%FT%TZ)" >> $ART/kernel_rows_r4.txt
  timeout 2400 python tools/kernel_bench.py --ppe-rows 1,2,4,8 --algos ppe 2>/dev/null \
    | tee -a $ART/kernel_rows_r4.txt
  grep -q Gcells $ART/kernel_rows_r4.txt && touch $MARK/kernel_rows
fi

if [ ! -f $MARK/ppe8 ]; then
  echo "== ppe8: hardware bitwise golden =="
  timeout 1800 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_ppe8.vcf --pairhmm pallas --ppe-rows 8 --stats 2>&1 | tail -1
  diff -q /tmp/out_ppe8.vcf fixtures/chrM.golden.vcf && touch $MARK/ppe8 \
    || echo PPE8_GOLDEN_MISMATCH_OR_TIMEOUT
fi

if [ ! -f $MARK/genotyper_jax ]; then
  echo "== --genotyper jax on TPU: bitwise golden (f32 + stability guard) =="
  timeout 1800 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_gtjax.vcf --pairhmm pallas --genotyper jax --stats 2>&1 | tail -1
  diff -q /tmp/out_gtjax.vcf fixtures/chrM.golden.vcf && touch $MARK/genotyper_jax \
    || echo GENOTYPER_JAX_GOLDEN_MISMATCH_OR_TIMEOUT
fi

if [ ! -f $MARK/fused_golden ]; then
  echo "== fused dispatch (fuse_groups=4): hardware bitwise golden =="
  timeout 1800 python - <<'PY'
import dataclasses, sys
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.models.caller import call_batched
from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache
enable_compile_cache()
cfg = dataclasses.replace(DEFAULT_CONFIG, pairhmm_engine="pallas", fuse_groups=4)
call_batched("fixtures/chrM.sam", "fixtures/chrM.fa", "/tmp/out_fused.vcf", cfg)
PY
  diff -q /tmp/out_fused.vcf fixtures/chrM.golden.vcf && touch $MARK/fused_golden \
    || echo FUSED_GOLDEN_MISMATCH_OR_TIMEOUT
fi

# bench.py is phase-aware internally (probes each round, waits cheaply for
# a healthy window inside its 1500s budget, wedge-watchdogged subprocess):
# run it whenever the relay is ALIVE; the marker only sets once a healthy
# sustained sample landed.
if [ ! -f $MARK/bench_ok ]; then
  echo "== bench.py (phase-aware) =="
  timeout 3600 python bench.py 2>/dev/null | tail -1 > $ART/.bench_tmp.json
  if [ -s $ART/.bench_tmp.json ]; then
    cat $ART/.bench_tmp.json
    cp $ART/.bench_tmp.json "$ART/bench_r4_attempt$(date -u +%H%M).json"
    mv $ART/.bench_tmp.json $ART/bench_r4_latest.json
  fi
  if grep -q '"sustained_healthy_cells_per_s": [0-9]' $ART/bench_r4_latest.json 2>/dev/null; then
    touch $MARK/bench_ok
  else
    echo "bench captured no healthy sample; will retry next loop"
    date -u +%FT%TZ >> $MARK/bench_attempts
  fi
fi

# fused-dispatch A/B, degraded-phase fallback: the sweep interleaves arms
# round-robin in ONE process, so the RELATIVE fused-vs-unfused answer is
# valid in any alive phase (both arms eat the same per-op cost; fusing cuts
# op count 4-8x).  Runs once after the first bench attempt; the healthy
# tier-2 sweep supersedes it for absolute numbers.
if [ ! -f $MARK/fuse_ab ] && [ ! -f $MARK/sweep ] \
   && [ "$(wc -l < $MARK/bench_attempts 2>/dev/null || echo 0)" -ge 1 ]; then
  echo "== fused dispatch A/B (phase-relative, alive is enough) =="
  timeout 3600 python tools/sustained_sweep.py --rounds 2 \
    --arms b16-planes,b16-planes-fuse4,b16-planes-fuse8 2>/dev/null \
    | tail -12 | tee $ART/fuse_ab_r4.json
  grep -q best_gcells $ART/fuse_ab_r4.json && touch $MARK/fuse_ab
fi

# wgs4 capstone fallback: if two full bench attempts found no healthy
# window, run the device-in-the-loop config-5 capstone anyway (a degraded-
# phase wall is labeled by its stats; accuracy + RSS are phase-independent)
if [ ! -f $MARK/wgs4 ] && [ ! -f $MARK/bench_ok ] && [ -f /tmp/wgs4/wgs.sam ] \
   && [ "$(wc -l < $MARK/bench_attempts 2>/dev/null || echo 0)" -ge 2 ]; then
  echo "== wgs4 streaming pallas e2e (degraded-phase fallback) =="
  timeout 10800 python -m gatk_hc_tpu.cli -I /tmp/wgs4/wgs.sam -R /tmp/wgs4/wgs.fa \
    -O /tmp/wgs4/out_tpu.vcf --pairhmm pallas --stream-contigs --stats \
    > $ART/wgs4_tpu_stats_r4.json 2>&1
  tail -1 $ART/wgs4_tpu_stats_r4.json
  if [ -s /tmp/wgs4/out_tpu.vcf ]; then
    timeout 600 python tools/check_truth.py /tmp/wgs4/out_tpu.vcf \
      /tmp/wgs4/wgs.truth.txt | tee $ART/wgs4_truth_r4.json
    grep -q sensitivity $ART/wgs4_truth_r4.json && touch $MARK/wgs4
  fi
fi

# ---------- tier 2: only meaningful in a HEALTHY phase ----------
[ $healthy = 1 ] || { echo "backlog state: $(ls $MARK)"; exit 0; }

if [ ! -f $MARK/cold_walls ]; then
  echo "== chrM cold-process wall best-of-5 (pallas, warm server caches) =="
  : > $ART/cold_walls_r4.jsonl
  ok=1
  for i in 1 2 3 4 5; do
    t0=$(date +%s.%N)
    timeout 600 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam \
      -R fixtures/chrM.fa -O /tmp/out_cold$i.vcf --pairhmm pallas --stats \
      > /tmp/cold_stats$i.json 2>&1
    t1=$(date +%s.%N)
    wall=$(echo "$t1 - $t0" | bc)
    echo "run $i: process wall ${wall}s"
    tail -1 /tmp/cold_stats$i.json | python -c "
import json,sys
line=sys.stdin.read().strip()
try: d=json.loads(line)
except Exception: d={'raw': line[-400:]}
d['process_wall_s']=float('$wall'); print(json.dumps(d))
" >> $ART/cold_walls_r4.jsonl
    diff -q /tmp/out_cold$i.vcf fixtures/chrM.golden.vcf >/dev/null || ok=0
  done
  [ $ok = 1 ] && [ "$(wc -l < $ART/cold_walls_r4.jsonl)" = 5 ] && touch $MARK/cold_walls
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/sweep ]; then
  echo "== sustained group-geometry sweep (incl. fused arms) =="
  timeout 3600 python tools/sustained_sweep.py --rounds 3 2>/dev/null | tail -10 \
    | tee $ART/sustained_sweep_r4.json
  grep -q best_gcells $ART/sustained_sweep_r4.json && touch $MARK/sweep
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/dispatch_ab ]; then
  echo "== dispatch A/B (2 Mb fixture) =="
  timeout 2400 python tools/dispatch_ab.py --rounds 3 2>/dev/null | tail -4 \
    | tee $ART/dispatch_ab_r4.json
  grep -q best_gcells $ART/dispatch_ab_r4.json && touch $MARK/dispatch_ab
fi

# capstone: whole-genome-shaped config-5 run ON DEVICE — 4-contig 60 Mb,
# streaming, pallas engine, accuracy vs planted truth + stats with peak RSS
if [ -f $MARK/bench_ok ] && [ ! -f $MARK/wgs4 ] && [ -f /tmp/wgs4/wgs.sam ]; then
  echo "== wgs4 streaming pallas e2e =="
  timeout 7200 python -m gatk_hc_tpu.cli -I /tmp/wgs4/wgs.sam -R /tmp/wgs4/wgs.fa \
    -O /tmp/wgs4/out_tpu.vcf --pairhmm pallas --stream-contigs --stats \
    > $ART/wgs4_tpu_stats_r4.json 2>&1
  tail -1 $ART/wgs4_tpu_stats_r4.json
  if [ -s /tmp/wgs4/out_tpu.vcf ]; then
    timeout 600 python tools/check_truth.py /tmp/wgs4/out_tpu.vcf \
      /tmp/wgs4/wgs.truth.txt | tee $ART/wgs4_truth_r4.json
    grep -q sensitivity $ART/wgs4_truth_r4.json && touch $MARK/wgs4
  fi
fi
echo "backlog state: $(ls $MARK)"
