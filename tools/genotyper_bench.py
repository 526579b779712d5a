"""Device-genotyper dispatch A/B: serial per-bucket fetch vs pipelined.

The r5 wgs4 capture measured the device genotyper at 441 s vs 20.7 s host
through a latency-throttled relay phase — its per-bucket dispatch-then-
fetch loop paid one round trip per bucket (VERDICT r4 weak #2 follow-up).
genotype_regions_jax now dispatches every bucket before fetching anything
and coalesces all best/gq readbacks into one int32 fetch.

This tool isolates that dispatch-pattern change at the genotype_sites_host
level (no site-spec plumbing): K buckets of wgs-shaped (S, R, H) tiles run
through both patterns, interleaved per round, so the effect size is
phase-relative valid in ANY alive relay phase (both arms pay the same
per-op cost).  Output: one JSON line with per-call ms medians and the
per-bucket round-trip counts.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/genotyper_bench.py
       [--rounds 5] [--buckets 6] [--sites 192] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# wgs-shaped bucket tile cycle: (R, H) pads observed in the wgs4 runs
SHAPES = ((32, 8), (64, 8), (64, 16), (128, 16), (32, 16), (128, 32))


def make_buckets(n_buckets: int, sites: int, dtype):
    rng = np.random.default_rng(20260820)
    buckets = []
    for i in range(n_buckets):
        R, H = SHAPES[i % len(SHAPES)]
        lik = rng.uniform(-30.0, -0.1, (sites, R, H))
        h2a = np.minimum(
            np.arange(H, dtype=np.int32), 3
        )[None].repeat(sites, 0)
        keep = np.ones((sites, R), bool)
        hv = np.ones((sites, H), bool)
        ac = np.full(sites, 2, np.int32)
        buckets.append((lik.astype(dtype), h2a, keep, hv, ac))
    return buckets


def run_serial(buckets, use_f64):
    """The pre-fix pattern: fetch each bucket's outputs before the next
    bucket dispatches (gl only fetched on f32 backends, as production)."""
    from gatk_hc_tpu.ops.genotyper_jax import genotype_sites_host

    outs = []
    for lik, h2a, keep, hv, ac in buckets:
        gl, best, gq = genotype_sites_host(lik, h2a, keep, hv, ac)
        b = np.asarray(best)
        g = np.asarray(gq)
        gl_np = None if use_f64 else np.asarray(gl)
        outs.append((b, g, gl_np))
    return outs


def run_pipelined(buckets, use_f64):
    """The production pattern since r5: dispatch all, one coalesced int
    fetch (+ one gl fetch on f32 backends)."""
    import jax.numpy as jnp

    from gatk_hc_tpu.ops.genotyper_jax import genotype_sites_host

    pend = [genotype_sites_host(*b) for b in buckets]
    sizes = [int(p[1].shape[0]) for p in pend]
    ints = np.asarray(
        jnp.concatenate([p[1] for p in pend] + [p[2] for p in pend])
    )
    off = np.cumsum([0] + sizes)
    total = int(off[-1])
    gls = (
        [None] * len(pend)
        if use_f64
        else list(np.split(
            np.asarray(jnp.concatenate([p[0] for p in pend])), off[1:-1]
        ))
    )
    return [
        (ints[off[i]:off[i + 1]], ints[total + off[i]:total + off[i + 1]],
         gls[i])
        for i in range(len(pend))
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--buckets", type=int, default=6)
    ap.add_argument("--sites", type=int, default=192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    backend = jax.default_backend()
    use_f64 = backend == "cpu"
    dtype = np.float64 if use_f64 else np.float32
    buckets = make_buckets(args.buckets, args.sites, dtype)

    # warm both patterns (compiles every (S, R, H) program)
    ref = run_serial(buckets, use_f64)
    out = run_pipelined(buckets, use_f64)
    for (b1, g1, l1), (b2, g2, l2) in zip(ref, out):
        np.testing.assert_array_equal(b1, b2)
        np.testing.assert_array_equal(g1, g2)
        if l1 is not None:
            np.testing.assert_array_equal(l1, l2)

    times = {"serial": [], "pipelined": []}
    for _ in range(args.rounds):  # interleaved: same phase for both arms
        t0 = time.perf_counter()
        run_serial(buckets, use_f64)
        times["serial"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_pipelined(buckets, use_f64)
        times["pipelined"].append(time.perf_counter() - t0)
    med = {k: statistics.median(v) * 1e3 for k, v in times.items()}
    print(json.dumps({
        "backend": backend,
        "buckets": args.buckets,
        "sites_per_bucket": args.sites,
        "rounds": args.rounds,
        "serial_ms": round(med["serial"], 1),
        "pipelined_ms": round(med["pipelined"], 1),
        "speedup": round(med["serial"] / med["pipelined"], 2),
        # round trips per call: serial pays fetches-per-bucket x buckets;
        # pipelined pays 1 int fetch (+1 gl fetch on f32)
        "serial_fetches": args.buckets * (2 if use_f64 else 3),
        "pipelined_fetches": 1 if use_f64 else 2,
        "bitwise_equal": True,
    }))


if __name__ == "__main__":
    main()
