"""Open-ended e2e differential fuzzer over fresh simulated genomes.

Each iteration generates a seeded random fixture (make_fixture's simulator:
planted SNP/ins/del mix, base errors, soft clips) and requires THREE stacks
to produce the byte-identical VCF:

  python  — per-record data pipeline, Python assembler + SW, per-site
            genotyper (``call``): the semantic reference
  native  — columnar C++ parse, fused window prep/assembly/SW, batched
            genotyper (``call_batched``): production
  native+threads — same, with host_threads=4: the worker pool, the
            multi-threaded parse, and the genotype worker (order effects)

PairHMM is the C++ engine in the base arms (oracle-tested separately) so
the axes under fuzz are data/assembler/SW/genotyper/threading; two extra
arms run device engines on the CPU backend: ``genotyper_jax`` (batched
device genotype reductions) and ``shardmap`` (the pod-scale shard_map
PairHMM over an 8-virtual-device mesh, exact f64 host finalize).  A
divergence writes every arm's VCF plus the fixture to --keep-dir and stops.

Usage: python tools/fuzz_differential.py --start 1000 --count 50
       python tools/fuzz_differential.py --minutes 30
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_fixture import make_reference, plant_variants, simulate_reads

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.fasta import FastaRecord, write_fasta
from gatk_hc_tpu.models.caller import call, call_batched


_JAX_CPU = None
_JAX_CPU_DEVICES = 0


def _jax_cpu_available() -> bool:
    """Force the CPU backend (this is a host-only differential tool; the
    sandbox pins JAX_PLATFORMS to the TPU relay) and report availability.

    Sets up 8 VIRTUAL CPU devices (same as tests/conftest.py) so the
    shardmap arm runs over a real (data, hap) mesh, and scrubs the
    terminal's --xla_allow_excess_precision=true (XLA:CPU FMA contraction
    breaks f32 bit-exactness vs the oracle chain).  Both must land before
    first backend use."""
    global _JAX_CPU, _JAX_CPU_DEVICES
    if _JAX_CPU is None:
        try:
            flags = os.environ.get("XLA_FLAGS", "")
            flags = flags.replace("--xla_allow_excess_precision=true", "")
            if "xla_force_host_platform_device_count" not in flags:
                flags += " --xla_force_host_platform_device_count=8"
            os.environ["XLA_FLAGS"] = flags.strip()

            import jax

            jax.config.update("jax_platforms", "cpu")
            try:
                jax.config.update("jax_num_cpu_devices", 8)
            except Exception:
                pass  # older jax: the XLA_FLAGS fallback covers it
            _JAX_CPU_DEVICES = len(jax.devices())
            _JAX_CPU = True
        except Exception:
            _JAX_CPU = False
    return _JAX_CPU


def write_fixture(dirpath, seed, length, depth, n_contigs=1, profile="uniform"):
    rng = random.Random(seed)
    records, all_lines = [], []
    for c in range(n_contigs):
        name = f"fuzz{c}"
        ref = make_reference(rng, length, profile=profile)
        alt, _truth, anchors = plant_variants(rng, ref, profile=profile)
        records.append(FastaRecord(name, "fuzz fixture", ref))
        all_lines.append(
            simulate_reads(rng, name, ref, alt, depth=depth, anchors=anchors)
        )
    fa = os.path.join(dirpath, f"fuzz{seed}.fa")
    write_fasta(fa, records)
    sam = os.path.join(dirpath, f"fuzz{seed}.sam")
    with open(sam, "w") as handle:
        handle.write("@HD\tVN:1.6\tSO:coordinate\n")
        for rec in records:
            handle.write(f"@SQ\tSN:{rec.name}\tLN:{len(rec.seq)}\n")
        for lines in all_lines:
            for line in lines:
                handle.write(line + "\n")
    return sam, fa


def run_seed(seed: int, keep_dir: str) -> dict:
    rng = random.Random(seed ^ 0x5EED)
    length = rng.choice((6_000, 12_000, 20_000))
    depth = rng.choice((8, 18, 30))
    mode = rng.choice(("first", "seeded"))
    n_contigs = rng.choice((1, 1, 2, 3))
    # homopolymer-rich / indel-heavy genomes are the classic PairHMM +
    # assembly stress profile (VERDICT r3 next-step 8)
    profile = rng.choice(("uniform", "uniform", "homopolymer"))
    tmp = tempfile.mkdtemp(prefix=f"fuzzdiff{seed}_")
    try:
        sam, fa = write_fixture(tmp, seed, length, depth, n_contigs, profile)
        arms = {}

        def arm(name, fn, cfg):
            out = os.path.join(tmp, f"{name}.vcf")
            fn(sam, fa, out, cfg)
            arms[name] = open(out, "rb").read()

        # reference semantics: per-record data pipeline + python
        # assembler/SW + per-site genotyper.  ``call`` is single-contig
        # only; on multi-contig fixtures the per-window python pipeline
        # runs through call_batched with every engine set to python.
        python_cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native",
            assembler_engine="python", sw_engine="python",
            data_engine="python", downsample_mode=mode,
        )
        if n_contigs == 1:
            arm("python", call, python_cfg)
        else:
            arm("python", call_batched, python_cfg)

        native_cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native",
            assembler_engine="native", sw_engine="native",
            data_engine="native", downsample_mode=mode,
        )
        arm("native", call_batched, native_cfg)
        arm(
            "native_mt", call_batched,
            dataclasses.replace(native_cfg, host_threads=4),
        )
        # streaming + parse-ahead arms exercise the contig switch, the
        # per-contig slice parse, and the prefetch thread
        arm(
            "stream", call_batched,
            dataclasses.replace(native_cfg, stream_contigs=True),
        )
        arm(
            "stream_mt", call_batched,
            dataclasses.replace(
                native_cfg, stream_contigs=True, host_threads=4
            ),
        )
        # device-genotyper arm: batched genotype_regions_jax reductions on
        # the CPU backend (exact f64 there) must stay byte-identical too —
        # extends the golden/unit coverage of --genotyper jax to fresh
        # random genomes
        if _jax_cpu_available():
            arm(
                "genotyper_jax", call_batched,
                dataclasses.replace(native_cfg, genotyper_engine="jax"),
            )
            # shardmap arm: the pod-scale shard_map PairHMM engine over an
            # 8-virtual-device (data=4, hap=2) CPU mesh — raw f32 grids via
            # collectives, exact f64 host finalize.  Extends the single chrM
            # golden (tests/test_parallel.py) to fresh random genomes.
            if _JAX_CPU_DEVICES >= 2:
                arm(
                    "shardmap", call_batched,
                    dataclasses.replace(native_cfg, pairhmm_engine="shardmap"),
                )

        n_variants = sum(
            1 for l in arms["python"].splitlines() if not l.startswith(b"#")
        )
        baseline = arms["python"]
        ok = all(v == baseline for v in arms.values())
        if not ok:
            os.makedirs(keep_dir, exist_ok=True)
            dest = os.path.join(keep_dir, f"seed{seed}")
            shutil.copytree(tmp, dest, dirs_exist_ok=True)
        return {
            "seed": seed, "length": length, "depth": depth, "mode": mode,
            "contigs": n_contigs, "profile": profile,
            "variants": n_variants, "ok": ok,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=1000)
    ap.add_argument("--count", type=int, default=0, help="0 = unbounded")
    ap.add_argument("--minutes", type=float, default=0.0, help="0 = unbounded")
    ap.add_argument("--keep-dir", default="/tmp/fuzz_differential_failures")
    args = ap.parse_args()

    deadline = time.time() + args.minutes * 60 if args.minutes else None
    seed = args.start
    done = 0
    total_variants = 0
    while True:
        if args.count and done >= args.count:
            break
        if deadline and time.time() > deadline:
            break
        r = run_seed(seed, args.keep_dir)
        total_variants += r["variants"]
        print(json.dumps(r), flush=True)
        if not r["ok"]:
            print(json.dumps({"FAILED_SEED": seed, "kept": args.keep_dir}))
            sys.exit(1)
        seed += 1
        done += 1
    print(json.dumps({
        "fuzz_ok": True, "seeds": done, "first": args.start,
        "total_variants": total_variants,
    }))


if __name__ == "__main__":
    main()
