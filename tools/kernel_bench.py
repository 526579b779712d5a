"""Kernel-only PairHMM microbenchmark: device-resident inputs, no host link.

Usage: python tools/kernel_bench.py [--pairs 16384] [--rpad 160] [--cpad 448]
Prints cells/s for each requested algo/stripe variant.  bench.py imports
measure_kernel() so the JSON line's kernel-only number and this tool share
one implementation.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_kernel(
    pairs: int = 16384,
    r_pad: int = 160,
    rlen: int = 151,
    c_pad: int = 448,
    clen: int = 415,
    stripe: int = 32,
    iters: int = 10,
    algo: str = "auto",
    ppe_rows: int = 2,
):
    """Returns (seconds/call, true cells/s, padded cells/s) for the Pallas
    forward kernel on synthetic device-resident inputs."""
    import jax
    import jax.numpy as jnp

    from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
    from gatk_hc_tpu.ops.pairhmm_pallas import _pallas_forward

    B, R, C = pairs, r_pad, c_pad
    rng = np.random.default_rng(0)
    rc = jnp.asarray(rng.integers(0, 4, (B, R)).astype(np.int32))
    q = np.float32(1e-4)
    omq = jnp.asarray(np.full((B, R), 1.0 - q, np.float32))
    q3 = jnp.asarray(np.full((B, R), q / 3.0, np.float32))
    rl = jnp.asarray(np.full(B, rlen, np.int32))
    hc = jnp.asarray(rng.integers(0, 4, (B, C)).astype(np.int32))
    hl = jnp.asarray(np.full(B, clen, np.int32))
    iy = jnp.asarray(np.full(B, np.float32(2.0**120) / clen, np.float32))
    trans = transition_constants(ord("I"), ord("+"))
    fn = jax.jit(
        lambda *a: _pallas_forward(
            *a, trans, R, C, stripe, False, algo=algo, ppe_rows=ppe_rows
        )
    )
    _ = np.asarray(fn(rc, omq, q3, rl, hc, hl, iy))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(rc, omq, q3, rl, hc, hl, iy)
    _ = np.asarray(out)  # readback forces real completion through the relay
    dt = (time.perf_counter() - t0) / iters
    return dt, B * rlen * clen / dt, B * R * C / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16384)
    ap.add_argument("--rpad", type=int, default=160)
    ap.add_argument("--rlen", type=int, default=151)
    ap.add_argument("--cpad", type=int, default=448)
    ap.add_argument("--clen", type=int, default=415)
    ap.add_argument("--algos", type=str, default="ppe,striped")
    ap.add_argument("--stripe", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ppe-rows", type=str, default="2",
                    help="comma list of row counts to A/B for the ppe algo")
    args = ap.parse_args()

    from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache

    enable_compile_cache()
    for algo in args.algos.split(","):
        rows_list = (
            [int(x) for x in args.ppe_rows.split(",")]
            if algo == "ppe" else [2]
        )
        for rows in rows_list:
            dt, true_cps, padded_cps = measure_kernel(
                args.pairs, args.rpad, args.rlen, args.cpad, args.clen,
                args.stripe, args.iters, algo, rows,
            )
            tag = f"{algo}{rows}" if algo == "ppe" else algo
            print(
                f"{tag:8s}: {dt*1e3:8.2f} ms/call  "
                f"{true_cps/1e9:7.2f} Gcells/s (true)  "
                f"{padded_cps/1e9:7.2f} Gcells/s (padded)"
            )


if __name__ == "__main__":
    main()
