"""TPU kernel probe: correctness vs oracle + throughput scaling.

Usage: python tools/tpu_probe.py [--stripe 32] [--rpad 128] [--cpad 384]
       [--blocks 1 8] [--skip-oracle]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--stripe", type=int, default=32)
    parser.add_argument("--rpad", type=int, default=128)
    parser.add_argument("--cpad", type=int, default=384)
    parser.add_argument("--blocks", type=int, nargs="+", default=[1, 8])
    parser.add_argument("--skip-oracle", action="store_true")
    parser.add_argument("--reps", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from gatk_hc_tpu.ops.pairhmm_pallas import LANES, pairhmm_pallas_batch
    from gatk_hc_tpu.ops.pairhmm_jax import batch_to_device_args, transition_constants
    from gatk_hc_tpu.ops.batching import all_pairs, pack_pairs
    from gatk_hc_tpu.ops import pairhmm_oracle as oracle

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    rng = random.Random(42)
    BASES = "ACGT"
    tb = lambda s: np.frombuffer(s.encode(), dtype=np.uint8)

    def dna(n):
        return "".join(rng.choice(BASES) for _ in range(n))

    n_pairs_max = max(args.blocks) * LANES
    reads, haps = [], []
    for _ in range(16):
        hap = dna(rng.randint(args.cpad // 2, args.cpad - 4))
        start = rng.randint(0, len(hap) - args.rpad // 2 - 1)
        read = list(hap[start : start + args.rpad - 8])
        for _ in range(rng.randint(0, 3)):
            i = rng.randrange(len(read))
            read[i] = rng.choice(BASES)
        read = "".join(read)
        quals = "".join(chr(rng.randint(53, 73)) for _ in range(len(read)))
        reads.append((tb(read), tb(quals)))
        haps.append(tb(hap))
    pair_read = np.array([i % 16 for i in range(n_pairs_max)], dtype=np.int32)
    pair_hap = np.array([(i * 7) % 16 for i in range(n_pairs_max)], dtype=np.int32)

    trans = transition_constants(ord("I"), ord("+"))

    for n_blocks in args.blocks:
        n = n_blocks * LANES
        batch = pack_pairs(
            reads, haps, pair_read[:n], pair_hap[:n],
            (args.rpad,), (args.cpad,), LANES,
        )
        dev_args = [jnp.asarray(a) for a in batch_to_device_args(batch)]

        t0 = time.time()
        probs = np.asarray(
            pairhmm_pallas_batch(
                *dev_args, trans, r_pad=args.rpad, c_pad=args.cpad,
                stripe=args.stripe,
            )
        )
        t_compile = time.time() - t0
        print(f"blocks={n_blocks}: first call {t_compile:.1f}s", flush=True)

        if not args.skip_oracle and n_blocks == args.blocks[0]:
            bad = 0
            for k in range(0, 16):
                b, q = reads[pair_read[k]]
                h = haps[pair_hap[k]]
                want = np.float32(oracle.pairhmm_prob(b, q, h, ftz=True))
                if want != probs[k]:
                    bad += 1
                    print(f"  MISMATCH pair {k}: want {want} got {probs[k]}")
            print(f"  oracle check: {16 - bad}/16 exact", flush=True)

        f = lambda: pairhmm_pallas_batch(
            *dev_args, trans, r_pad=args.rpad, c_pad=args.cpad,
            stripe=args.stripe,
        ).block_until_ready()
        f()
        t0 = time.time()
        for _ in range(args.reps):
            f()
        dt = (time.time() - t0) / args.reps
        cells = n * args.rpad * args.cpad
        print(
            f"  {dt * 1e3:.2f} ms/call -> {cells / dt / 1e9:.2f} Gcells/s "
            f"(padded cells, {n} pairs)",
            flush=True,
        )


if __name__ == "__main__":
    main()
