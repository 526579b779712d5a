"""Command-line interface, mirroring the reference binary's flags
(src/main.cpp:6-16): -I/--input SAM, -O/--output VCF, -R/--reference FASTA.

Extensions over the reference: engine selection, region windows, downsample
mode, and scale-out controls.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

from .config import DEFAULT_CONFIG


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="gatk-hc-tpu",
        description="TPU-native HaplotypeCaller: SAM + FASTA -> VCF",
    )
    parser.add_argument("-I", "--input", required=True, help="SAM file containing reads")
    parser.add_argument("-O", "--output", required=True, help="output VCF path")
    parser.add_argument("-R", "--reference", required=True, help="reference FASTA")
    parser.add_argument(
        "--pairhmm",
        default=DEFAULT_CONFIG.pairhmm_engine,
        choices=("pallas", "jax", "native", "python"),
        help="PairHMM engine (default: %(default)s)",
    )
    parser.add_argument(
        "--assembler",
        default=DEFAULT_CONFIG.assembler_engine,
        choices=("native", "python"),
    )
    parser.add_argument(
        "--downsample",
        default=DEFAULT_CONFIG.downsample_mode,
        choices=("first", "seeded"),
        help="one read per start position: deterministic rule",
    )
    parser.add_argument("--seed", type=int, default=DEFAULT_CONFIG.downsample_seed)
    parser.add_argument("--region-size", type=int, default=DEFAULT_CONFIG.region_size)
    parser.add_argument("--padding-size", type=int, default=DEFAULT_CONFIG.padding_size)
    parser.add_argument("--stats", action="store_true", help="print run stats as JSON")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine=args.pairhmm,
        assembler_engine=args.assembler,
        downsample_mode=args.downsample,
        downsample_seed=args.seed,
        region_size=args.region_size,
        padding_size=args.padding_size,
    )
    from .models.caller import call, call_batched

    start = time.perf_counter()
    try:
        if cfg.pairhmm_engine in ("pallas", "jax"):
            from .parallel.compile_cache import enable_compile_cache

            enable_compile_cache()
            results = call_batched(args.input, args.reference, args.output, cfg)
        else:
            results = call(args.input, args.reference, args.output, cfg)
    except FileNotFoundError as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2
    elapsed = time.perf_counter() - start
    n_variants = sum(len(r.variants) for r in results)
    cells = sum(r.cell_updates for r in results)
    if args.stats:
        print(
            json.dumps(
                {
                    "regions": len(results),
                    "variants": n_variants,
                    "cell_updates": cells,
                    "wall_s": round(elapsed, 3),
                    "cells_per_s": round(cells / elapsed) if elapsed else 0,
                    "engine": cfg.pairhmm_engine,
                }
            )
        )
    print(f"HaplotypeCaller done. {n_variants} variants in {elapsed:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
