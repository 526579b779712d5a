#!/bin/bash
# Round-4 TPU validation backlog: run whenever the relay looks responsive.
# Probe -> chrM pallas e2e vs golden -> warm caches -> cold-wall table ->
# kernel A/B -> bench -> dispatch/sweep -> wgs4 capstone.  Each step is
# skipped once its marker file exists, so repeated invocations resume where
# they left off.  Drive with tools/backlog_loop.sh for unattended retry.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
MARK=/tmp/tpu_backlog
ART=/root/repo/perf_artifacts
mkdir -p $MARK $ART

probe=$(timeout 70 python tools/relay_probe.py 2>/dev/null | tail -1)
echo "probe: $probe"
case "$probe" in
  *'"healthy": true'*) ;;
  *) echo "relay unhealthy; aborting this attempt"; exit 1 ;;
esac

if [ ! -f $MARK/e2e_ok ]; then
  echo "== chrM pallas e2e =="
  timeout 1200 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_tpu.vcf --pairhmm pallas --stats 2>&1 | tail -2
  if diff -q /tmp/out_tpu.vcf fixtures/chrM.golden.vcf; then
    echo TPU_GOLDEN_OK; touch $MARK/e2e_ok
  else
    echo TPU_GOLDEN_MISMATCH_OR_TIMEOUT; exit 1
  fi
fi

if [ ! -f $MARK/aot_r4 ]; then
  # Full warm: executes every production program shape once (~60s/program
  # on a cold server cache) and regenerates the jax.export AOT artifacts.
  echo "== warm_cache (full: device pre-load + AOT regen) =="
  timeout 3000 python tools/warm_cache.py 2>&1 | tail -2 \
    && touch $MARK/aot_r4
fi

if [ ! -f $MARK/warm_e2e ]; then
  echo "== chrM pallas e2e (warm caches, cold process) =="
  t0=$(date +%s.%N)
  timeout 600 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam \
    -R fixtures/chrM.fa -O /tmp/out_tpu2.vcf --pairhmm pallas --stats \
    > $ART/warm_e2e_r4.json 2>&1
  t1=$(date +%s.%N)
  echo "cold-process wall: $(echo "$t1 - $t0" | bc) s"
  grep -o '"wall_s": [0-9.]*' $ART/warm_e2e_r4.json || tail -3 $ART/warm_e2e_r4.json
  diff -q /tmp/out_tpu2.vcf fixtures/chrM.golden.vcf && touch $MARK/warm_e2e
fi

if [ ! -f $MARK/cold_walls ]; then
  # VERDICT r3 #4: win chrM cold on the device path or prove the floor.
  # Best-of-5 cold-process walls with per-phase stats for the table in
  # PERFORMANCE.md.
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

if [ ! -f $MARK/kernel_rows ]; then
  echo "== kernel rows A/B (ppe 1/2/4/8) =="
  timeout 1800 python tools/kernel_bench.py --ppe-rows 1,2,4,8 --algos ppe 2>/dev/null \
    | tee $ART/kernel_rows_r4.txt
  grep -q Gcells $ART/kernel_rows_r4.txt && touch $MARK/kernel_rows
fi

if [ ! -f $MARK/ppe8 ]; then
  echo "== ppe8: hardware bitwise golden =="
  timeout 900 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_ppe8.vcf --pairhmm pallas --ppe-rows 8 --stats 2>&1 | tail -1
  diff -q /tmp/out_ppe8.vcf fixtures/chrM.golden.vcf && touch $MARK/ppe8 \
    || echo PPE8_GOLDEN_MISMATCH_OR_TIMEOUT
fi

if [ ! -f $MARK/genotyper_jax ]; then
  echo "== --genotyper jax on TPU: bitwise golden =="
  timeout 900 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_gtjax.vcf --pairhmm pallas --genotyper jax --stats 2>&1 | tail -1
  diff -q /tmp/out_gtjax.vcf fixtures/chrM.golden.vcf && touch $MARK/genotyper_jax \
    || echo GENOTYPER_JAX_GOLDEN_MISMATCH_OR_TIMEOUT
fi

if [ ! -f $MARK/bench_ok ]; then
  echo "== bench.py =="
  timeout 3600 python bench.py 2>/dev/null | tail -1 | tee $ART/bench_r4_latest.json
  grep -q '"sustained_healthy_cells_per_s": [0-9]' $ART/bench_r4_latest.json \
    && touch $MARK/bench_ok \
    || echo "bench captured no healthy sample; will retry next loop"
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/dispatch_ab ]; then
  echo "== dispatch A/B (2 Mb fixture) =="
  timeout 2400 python tools/dispatch_ab.py --rounds 3 2>/dev/null | tail -4 \
    | tee $ART/dispatch_ab_r4.json
  grep -q best_gcells $ART/dispatch_ab_r4.json && touch $MARK/dispatch_ab
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/sweep ]; then
  echo "== sustained group-geometry sweep (bench workload) =="
  timeout 3600 python tools/sustained_sweep.py --rounds 3 2>/dev/null | tail -8 \
    | tee $ART/sustained_sweep_r4.json
  grep -q best_gcells $ART/sustained_sweep_r4.json && touch $MARK/sweep
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
