"""A/B the dispatch shipping encodings on real hardware, in ONE process.

Runs the 2 Mb fixture's PairHMM work three ways — forced planes, forced
packed, adaptive — interleaved round-robin so relay-phase drift hits all
arms equally (the phase can shift minute-to-minute).  Prints one JSON line
per round and a summary.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dispatch_ab.py
         [--sam ...] [--fa ...] [--regions N] [--rounds K]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def collect_jobs(sam, fa, max_regions):
    """Assemble the fixture's first N regions once (CPU work), returning
    the PairHMMJob payloads to replay against each dispatch mode."""
    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.models.caller import call_batched
    from gatk_hc_tpu.ops.runner import PairHMMJob

    captured = []

    class CaptureRunner:
        def run(self, jobs):
            for j in jobs:
                captured.append((list(j.reads), list(j.haps)))
                j.result = np.zeros((len(j.reads), len(j.haps)))

    cfg = dataclasses.replace(DEFAULT_CONFIG, pairhmm_engine="native")
    call_batched(
        sam, fa, None, cfg, runner=CaptureRunner(),
        region_filter=lambda i: i < max_regions,
    )
    return [PairHMMJob(r, h) for r, h in captured]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sam", default="/tmp/bigfix/chr20sim.sam")
    ap.add_argument("--fa", default="/tmp/bigfix/chr20sim.fa")
    ap.add_argument("--regions", type=int, default=1500)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.runner import PairHMMJob, PallasPairHMMRunner
    from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache

    enable_compile_cache()
    template = collect_jobs(args.sam, args.fa, args.regions)
    cells = sum(
        sum(len(b) for b, _ in j.reads) * sum(len(h) for h in j.haps)
        for j in template
    )
    print(
        f"# {len(template)} jobs, {cells/1e9:.1f} Gcells per arm-run",
        file=sys.stderr,
    )

    arms = {}
    for mode in ("planes", "packed", "adaptive"):
        # failover off: a timed arm must never silently become the C++ engine
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, dispatch_mode=mode, device_timeout_s=0.0
        )
        runner = PallasPairHMMRunner(cfg)
        if mode == "adaptive":
            # force immediate calibration for the A/B (production waits
            # 32 groups so small runs never pay packed compile)
            runner._path_ctl.min_groups = 1
        arms[mode] = runner

    # warm every arm once (compiles + program loads) before timing
    for mode, runner in arms.items():
        t0 = time.perf_counter()
        runner.run([PairHMMJob(j.reads, j.haps) for j in template[:40]])
        print(f"# warm {mode}: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    results = {m: [] for m in arms}
    baseline = None
    for rnd in range(args.rounds):
        for mode, runner in arms.items():
            jobs = [PairHMMJob(j.reads, j.haps) for j in template]
            t0 = time.perf_counter()
            runner.run(jobs)
            dt = time.perf_counter() - t0
            results[mode].append(dt)
            print(json.dumps({
                "round": rnd, "mode": mode, "wall_s": round(dt, 2),
                "gcells_per_s": round(cells / dt / 1e9, 1),
            }), flush=True)
            if baseline is None:
                baseline = [j.result.copy() for j in jobs]
            else:
                for want, got in zip(baseline, jobs):
                    np.testing.assert_array_equal(want, got.result)
    summary = {
        mode: {
            "best_s": round(min(ts), 2),
            "best_gcells_per_s": round(cells / min(ts) / 1e9, 1),
            "all_s": [round(t, 2) for t in ts],
        }
        for mode, ts in results.items()
    }
    summary["results_bitwise_equal_across_modes"] = True
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
