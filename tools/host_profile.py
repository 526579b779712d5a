"""Host-pipeline profiler: run parse + window prep + assembly + genotyping
with a stub PairHMM runner and print the stage timers plus the native
per-phase assembly profile (hc_prof_read).

This is the measurement harness behind PERFORMANCE.md's "host-side wall"
tables: it isolates the host stages from the device/relay entirely (the
stub fills every job with a flat likelihood matrix, so genotyping runs its
real batched code path but emits no variants).  Use it to A/B host-pipeline
changes on big fixtures where a real PairHMM pass would dominate or a
wedged relay would block.

Usage:
  python tools/host_profile.py /tmp/bigfix60/chr20sim.sam /tmp/bigfix60/chr20sim.fa
  python tools/host_profile.py SAM FASTA --threads 4 --stream --repeat 2
"""

from __future__ import annotations

import argparse
import json
import resource
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from gatk_hc_tpu import native
from gatk_hc_tpu.config import HCConfig
from gatk_hc_tpu.models.caller import call_batched
from gatk_hc_tpu.utils.logging import RunCounters, StageTimers


class StubRunner:
    """Fills each job with a flat log10 matrix; no device, no jax."""

    def submit(self, jobs):
        for job in jobs:
            job.result = np.full(
                (len(job.reads), len(job.haps)), -1.0, dtype=np.float64
            )
        return jobs

    def drain(self, tokens):
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sam")
    ap.add_argument("fasta")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--genotyper", default="host", choices=("host", "jax"))
    args = ap.parse_args()

    cfg = HCConfig(
        pairhmm_engine="pallas",  # irrelevant: runner is the stub
        host_threads=args.threads,
        stream_contigs=args.stream,
        genotyper_engine=args.genotyper,
    )
    for rep in range(args.repeat):
        native.profile_read(reset=True)
        timers = StageTimers()
        counters = RunCounters()
        t0 = time.perf_counter()
        call_batched(
            args.sam,
            args.fasta,
            None,
            cfg,
            runner=StubRunner(),
            timers=timers,
            counters=counters,
        )
        wall = time.perf_counter() - t0
        out = {
            "rep": rep,
            "wall_s": round(wall, 2),
            "stages": {k: round(v, 2) for k, v in timers.summary().items()},
            "host_profile": {
                k: round(v, 2) if isinstance(v, float) else v
                for k, v in native.profile_read().items()
            },
            "regions": counters.regions,
            "reads_parsed": counters.reads_parsed,
            "peak_rss_mb": resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            // 1024,
        }
        print(json.dumps(out))


if __name__ == "__main__":
    main()
