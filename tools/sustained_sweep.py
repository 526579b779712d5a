"""Sweep dispatch-group geometry for sustained throughput, in ONE process.

The sustained headline (bench.py) sits at ~60-90 Gcells/s healthy vs ~150
kernel-only; the gap is per-dispatch relay overhead (h2d puts, program
launches, readbacks) amortized over only ~1 Gcell per 16384-pair group.
This tool A/Bs bigger group budgets / chunk sizes / shipping encodings on
the bench workload (16 jobs of 1024x16 pairs, pipelined submit/drain
stream — identical to bench.py's sustained measurement), interleaved
round-robin so relay-phase drift hits all arms equally.

Each arm is warmed once before timing (new table-bucket or chunk shapes
are new XLA programs: first execution through the relay can cost 15-80s,
cached across processes afterwards).  Results are asserted bitwise-equal
across arms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/sustained_sweep.py
         [--rounds K] [--arms name1,name2,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_runner(arm):
    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

    # failover off: a timed arm must never silently become the C++ engine
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, dispatch_mode=arm["mode"], device_timeout_s=0.0,
        fuse_groups=arm.get("fuse", 1), fuse_auto=False,
        packed_nib=arm.get("nib", True),
    )
    runner = PallasPairHMMRunner(cfg, pair_budget=arm["budget"])
    if arm.get("read_buckets"):
        runner.READ_BUCKETS = arm["read_buckets"]  # instance override
    if arm.get("chunks"):
        runner._chunks = arm["chunks"]
    return runner


# Arms: group budget (pairs packed into one table group), shipping mode,
# read-table buckets (tight buckets avoid padding-bloat on multi-job
# groups), dispatch chunk sizes (each size = one compiled program; bigger
# chunks = fewer launches per group).
ARMS = [
    # production default — the bench.py baseline
    {"name": "b16-planes", "budget": 16384, "mode": "planes"},
    {"name": "b16-packed", "budget": 16384, "mode": "packed"},
    # 2 jobs per group: one device_put per 2 Gcells; tight 2048 bucket
    {"name": "b32-planes", "budget": 32768, "mode": "planes",
     "read_buckets": (1024, 2048, 4096)},
    # same grouping + one 32768-pair launch per group
    {"name": "b32-planes-c32", "budget": 32768, "mode": "planes",
     "read_buckets": (1024, 2048, 4096),
     "chunks": (32768, 16384, 8192, 4096)},
    {"name": "b32-packed-c32", "budget": 32768, "mode": "packed",
     "read_buckets": (1024, 2048, 4096),
     "chunks": (32768, 16384, 8192, 4096)},
    # 3 jobs per group, packed shipping (2 B/base), 49152-pair launches
    {"name": "b48-packed-c48", "budget": 49152, "mode": "packed",
     "read_buckets": (1024, 3072, 4096),
     "chunks": (49152, 16384, 8192, 4096)},
    # fused dispatch: up to 4 same-signature 16384-pair groups in ONE
    # launch (ONE device_put for the stacked planes + ONE program) —
    # per-launch relay cost amortizes 4x (cfg.fuse_groups)
    {"name": "b16-planes-fuse4", "budget": 16384, "mode": "planes",
     "fuse": 4},
    {"name": "b16-planes-fuse8", "budget": 16384, "mode": "planes",
     "fuse": 8},
    # packed encoding x fused launches (pairhmm_pallas_packed_fused): 4x
    # fewer bytes AND 4-8x fewer launches — wins when the relay throttles
    # op throughput; production engages it adaptively (cfg.fuse_auto)
    {"name": "b16-packed-fuse4", "budget": 16384, "mode": "packed",
     "fuse": 4},
    {"name": "b16-packed-fuse8", "budget": 16384, "mode": "packed",
     "fuse": 8},
    # raw-packed control arm for the nibble-encoding A/B (packed_nib is
    # the production default; this arm ships the r4-style raw u8 planes +
    # pair arrays — ~2.6x the bytes through the bandwidth-bound relay)
    {"name": "b16-packed-raw", "budget": 16384, "mode": "packed",
     "nib": False},
    # pipeline-depth axis (the one dispatch knob never swept): deeper
    # in-flight queues and/or finer submit batches keep more launches
    # enqueued when per-op relay latency spikes; readbacks coalesce per
    # submit batch, so jps=2 also doubles fetch granularity
    {"name": "b16-packed-d6", "budget": 16384, "mode": "packed",
     "depth": 6},
    {"name": "b16-packed-jps2", "budget": 16384, "mode": "packed",
     "jps": 2},
    {"name": "b16-packed-d6-jps2", "budget": 16384, "mode": "packed",
     "depth": 6, "jps": 2},
]


def run_stream(runner, jobs, jobs_per_submit: int = 4, depth: int = 3) -> float:
    """bench.py's pipelined stream: submit chunk k+1 before draining k,
    keeping up to `depth` submit batches in flight."""
    t0 = time.perf_counter()
    pending = []
    for i in range(0, len(jobs), jobs_per_submit):
        pending.append(runner.submit(jobs[i : i + jobs_per_submit]))
        while len(pending) > depth - 1:
            runner.drain([pending.pop(0)])
    runner.drain(pending)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--arms", default=None,
                    help="comma-separated arm names (default: all)")
    ap.add_argument("--n-jobs", type=int, default=16)
    args = ap.parse_args()

    from bench import HAP_LEN, N_HAPS, N_READS, READ_LEN, make_workload, probe_relay_op_ms
    from gatk_hc_tpu.ops.runner import PairHMMJob
    from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache

    enable_compile_cache()
    reads, haps = make_workload()
    arms = ARMS
    if args.arms:
        wanted = set(args.arms.split(","))
        arms = [a for a in ARMS if a["name"] in wanted]
    cells = args.n_jobs * N_READS * N_HAPS * READ_LEN * HAP_LEN

    runners = {}
    for arm in arms:
        runners[arm["name"]] = make_runner(arm)
        t0 = time.perf_counter()
        warm = [PairHMMJob(reads, haps) for _ in range(args.n_jobs)]
        run_stream(runners[arm["name"]], warm,
                   arm.get("jps", 4), arm.get("depth", 3))
        print(
            f"# warm {arm['name']}: {time.perf_counter()-t0:.1f}s "
            f"(relay_op_ms {probe_relay_op_ms():.1f})",
            file=sys.stderr, flush=True,
        )

    baseline = None
    results = {a["name"]: [] for a in arms}
    for rnd in range(args.rounds):
        for arm in arms:
            name = arm["name"]
            jobs = [PairHMMJob(reads, haps) for _ in range(args.n_jobs)]
            dt = run_stream(runners[name], jobs,
                            arm.get("jps", 4), arm.get("depth", 3))
            results[name].append(dt)
            print(json.dumps({
                "round": rnd, "arm": name, "wall_s": round(dt, 3),
                "gcells_per_s": round(cells / dt / 1e9, 1),
                "relay_op_ms": round(probe_relay_op_ms(), 1),
            }), flush=True)
            if baseline is None:
                baseline = [j.result.copy() for j in jobs]
            else:
                for want, got in zip(baseline, jobs):
                    np.testing.assert_array_equal(want, got.result)

    summary = summarize(results, cells)
    summary["results_bitwise_equal_across_arms"] = True
    print(json.dumps(summary))


def summarize(results, cells):
    """Per-arm best/median/spread over the interleaved rounds (the honest
    effect-size basis — round-to-round phase swings are the same order as
    arm effects, so best-of alone over-claims) plus a winner-by-MEDIAN
    verdict: "separated" only when the margin over the runner-up exceeds
    BOTH arms' spreads."""
    summary = {
        name: {
            "best_gcells_per_s": round(cells / min(ts) / 1e9, 1),
            "median_gcells_per_s": round(
                cells / float(np.median(ts)) / 1e9, 1
            ),
            "spread_gcells_per_s": round(
                cells / min(ts) / 1e9 - cells / max(ts) / 1e9, 1
            ),
            "all_s": [round(t, 2) for t in ts],
        }
        for name, ts in results.items()
    }
    by_median = sorted(
        results, key=lambda n: summary[n]["median_gcells_per_s"],
        reverse=True,
    )
    if len(by_median) >= 2:
        w, ru = by_median[0], by_median[1]
        margin = (summary[w]["median_gcells_per_s"]
                  - summary[ru]["median_gcells_per_s"])
        summary["winner"] = {
            "arm": w, "runner_up": ru,
            "median_margin_gcells_per_s": round(margin, 1),
            "separated_beyond_spread": bool(
                margin > max(summary[w]["spread_gcells_per_s"],
                             summary[ru]["spread_gcells_per_s"])
            ),
        }
    return summary


if __name__ == "__main__":
    main()
