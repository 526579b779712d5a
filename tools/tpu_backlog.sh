#!/bin/bash
# Round-3 TPU validation backlog: run whenever the relay looks responsive.
# Probe -> chrM pallas e2e vs golden -> bench.py.  Each step is skipped once
# its marker file exists, so repeated invocations resume where they left off.
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
MARK=/tmp/tpu_backlog
mkdir -p $MARK

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

if [ ! -f $MARK/aot_r3 ]; then
  # the ppe_rows default change means the production dispatch programs
  # have never executed on this terminal — run the FULL warm (executes
  # every shape once, ~60s/program first time) before any cold-process
  # timing, and regenerate the jax.export AOT artifacts along the way
  echo "== warm_cache (full: device pre-load + AOT regen) =="
  timeout 3000 python tools/warm_cache.py 2>&1 | tail -2 \
    && touch $MARK/aot_r3
fi

if [ ! -f $MARK/warm_e2e ]; then
  echo "== chrM pallas e2e (warm caches, cold process) =="
  t0=$(date +%s.%N)
  timeout 600 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam \
    -R fixtures/chrM.fa -O /tmp/out_tpu2.vcf --pairhmm pallas --stats \
    > /root/repo/perf_artifacts/warm_e2e_r3.json 2>&1
  t1=$(date +%s.%N)
  echo "cold-process wall: $(echo "$t1 - $t0" | bc) s"
  grep -o '"wall_s": [0-9.]*' /root/repo/perf_artifacts/warm_e2e_r3.json || tail -3 /root/repo/perf_artifacts/warm_e2e_r3.json
  diff -q /tmp/out_tpu2.vcf fixtures/chrM.golden.vcf && touch $MARK/warm_e2e
fi

if [ ! -f $MARK/kernel_rows ]; then
  echo "== kernel rows A/B =="
  timeout 900 python tools/kernel_bench.py --ppe-rows 1,2,4 --algos ppe 2>/dev/null \
    | tee /root/repo/perf_artifacts/kernel_rows_r3.txt
  grep -q Gcells /root/repo/perf_artifacts/kernel_rows_r3.txt && touch $MARK/kernel_rows
fi

if [ ! -f $MARK/ppe8 ]; then
  echo "== ppe8: hardware bitwise golden + kernel timing =="
  timeout 900 python -m gatk_hc_tpu.cli -I fixtures/chrM.sam -R fixtures/chrM.fa \
    -O /tmp/out_ppe8.vcf --pairhmm pallas --ppe-rows 8 --stats 2>&1 | tail -1
  if diff -q /tmp/out_ppe8.vcf fixtures/chrM.golden.vcf; then
    timeout 900 python tools/kernel_bench.py --ppe-rows 4,8 --algos ppe 2>/dev/null \
      | tee /root/repo/perf_artifacts/kernel_ppe8_r3.txt
    grep -q Gcells /root/repo/perf_artifacts/kernel_ppe8_r3.txt && touch $MARK/ppe8
  else
    echo PPE8_GOLDEN_MISMATCH_OR_TIMEOUT
  fi
fi

if [ ! -f $MARK/bench_ok ]; then
  echo "== bench.py =="
  timeout 3600 python bench.py 2>/dev/null | tail -1 | tee /root/repo/perf_artifacts/bench_r3_latest.json
  grep -q '"value"' /root/repo/perf_artifacts/bench_r3_latest.json && touch $MARK/bench_ok
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/dispatch_ab ]; then
  echo "== dispatch A/B (2 Mb fixture) =="
  timeout 2400 python tools/dispatch_ab.py --rounds 3 2>/dev/null | tail -4 \
    | tee /root/repo/perf_artifacts/dispatch_ab_r3.json
  grep -q best_gcells /root/repo/perf_artifacts/dispatch_ab_r3.json && touch $MARK/dispatch_ab
fi

if [ -f $MARK/bench_ok ] && [ ! -f $MARK/sweep ]; then
  echo "== sustained group-geometry sweep (bench workload) =="
  timeout 3600 python tools/sustained_sweep.py --rounds 3 2>/dev/null | tail -8 \
    | tee /root/repo/perf_artifacts/sustained_sweep_r3.json
  grep -q best_gcells /root/repo/perf_artifacts/sustained_sweep_r3.json && touch $MARK/sweep
fi

# optional capstone (only after everything else): whole-genome-shaped
# config-5 run ON DEVICE — 4-contig 60 Mb, streaming, pallas engine,
# accuracy vs planted truth + stats with peak RSS
if [ -f $MARK/sweep ] && [ ! -f $MARK/wgs4 ] && [ -f /tmp/wgs4/wgs.sam ]; then
  echo "== wgs4 streaming pallas e2e =="
  timeout 5400 python -m gatk_hc_tpu.cli -I /tmp/wgs4/wgs.sam -R /tmp/wgs4/wgs.fa \
    -O /tmp/wgs4/out_tpu.vcf --pairhmm pallas --stream-contigs --stats \
    > /root/repo/perf_artifacts/wgs4_tpu_stats.json 2>&1
  tail -1 /root/repo/perf_artifacts/wgs4_tpu_stats.json
  if [ -s /tmp/wgs4/out_tpu.vcf ]; then
    timeout 600 python tools/check_truth.py /tmp/wgs4/out_tpu.vcf \
      /tmp/wgs4/wgs.truth.txt | tee /root/repo/perf_artifacts/wgs4_truth_r3.json
    grep -q sensitivity /root/repo/perf_artifacts/wgs4_truth_r3.json && touch $MARK/wgs4
  fi
fi
echo "backlog state: $(ls $MARK)"
