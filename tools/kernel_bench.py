"""Kernel-only PairHMM microbenchmark: device-resident inputs, no host link.

Usage: python tools/kernel_bench.py [--pairs 16384] [--rpad 160] [--cpad 512]
Prints cells/s for each stripe height.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=16384)
    ap.add_argument("--rpad", type=int, default=160)
    ap.add_argument("--rlen", type=int, default=151)
    ap.add_argument("--cpad", type=int, default=512)
    ap.add_argument("--clen", type=int, default=415)
    ap.add_argument("--stripes", type=str, default="8,16,32,64")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
    from gatk_hc_tpu.ops.pairhmm_pallas import _pallas_forward

    B, R, C = args.pairs, args.rpad, args.cpad
    rng = np.random.default_rng(0)
    rc = jnp.asarray(rng.integers(0, 4, (B, R)).astype(np.int32))
    q = np.float32(1e-4)
    omq = jnp.asarray(np.full((B, R), 1.0 - q, np.float32))
    q3 = jnp.asarray(np.full((B, R), q / 3.0, np.float32))
    rl = jnp.asarray(np.full(B, args.rlen, np.int32))
    hc = jnp.asarray(rng.integers(0, 4, (B, C)).astype(np.int32))
    hl = jnp.asarray(np.full(B, args.clen, np.int32))
    iy = jnp.asarray(np.full(B, np.float32(2.0**120) / args.clen, np.float32))
    trans = transition_constants(ord("I"), ord("+"))

    cells = B * args.rlen * args.clen  # true cells per call
    padded_cells = B * R * C

    for h in [int(s) for s in args.stripes.split(",") if s]:
        if R % h:
            print(f"stripe={h}: skipped (rpad {R} not divisible)")
            continue
        fn = jax.jit(
            lambda rc, omq, q3, rl, hc, hl, iy, h=h: _pallas_forward(
                rc, omq, q3, rl, hc, hl, iy, trans, R, C, h, False
            )
        )
        out = fn(rc, omq, q3, rl, hc, hl, iy)
        _ = np.asarray(out)  # full sync through the tunnel
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(rc, omq, q3, rl, hc, hl, iy)
        _ = np.asarray(out)  # readback forces real completion
        dt = (time.perf_counter() - t0) / args.iters
        print(
            f"stripe={h:3d}: {dt*1e3:8.2f} ms/call  "
            f"{cells/dt/1e9:7.2f} Gcells/s (true)  "
            f"{padded_cells/dt/1e9:7.2f} Gcells/s (padded)"
        )


if __name__ == "__main__":
    main()
