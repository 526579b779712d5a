"""Seeded random-fixture e2e differential: the full PYTHON reference stack
(per-record data pipeline, Python assembler + SW, per-site genotyper via
``call``) must produce the byte-identical VCF to the production NATIVE
stack (columnar C++ parse, fused window prep + assembly + SW, batched
genotyper via ``call_batched``) on fixtures it has never seen.

The fixed chrM golden pins one workload; this sweeps fresh simulated
genomes (different seed => different variant mix, error pattern, and read
layout) so a semantics drift anywhere in the C++/columnar fast paths shows
up as a VCF diff, not just a unit-test miss.  PairHMM is the C++ engine on
both sides (it is differential-tested against the NumPy oracle
separately); the axes under test here are data/assembler/SW/genotyper.
"""

import dataclasses
import os
import random
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from gatk_hc_tpu import native
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.fasta import FastaRecord, write_fasta

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _write_fixture(tmp_path, seed, length=12_000, depth=18):
    from make_fixture import make_reference, plant_variants, simulate_reads

    rng = random.Random(seed)
    ref = make_reference(rng, length)
    alt, _truth, anchors = plant_variants(rng, ref)
    sam_lines = simulate_reads(rng, "fuzz", ref, alt, depth=depth, anchors=anchors)
    fa = tmp_path / f"fuzz{seed}.fa"
    write_fasta(str(fa), [FastaRecord("fuzz", "differential fixture", ref)])
    sam = tmp_path / f"fuzz{seed}.sam"
    with open(sam, "w") as handle:
        handle.write("@HD\tVN:1.6\tSO:coordinate\n")
        handle.write(f"@SQ\tSN:fuzz\tLN:{len(ref)}\n")
        for line in sam_lines:
            handle.write(line + "\n")
    return str(sam), str(fa)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [101, 202, 303])
def test_python_stack_matches_native_stack(tmp_path, seed):
    from gatk_hc_tpu.models.caller import call, call_batched

    sam, fa = _write_fixture(tmp_path, seed)

    native_cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine="native", assembler_engine="native",
        sw_engine="native", data_engine="native",
    )
    out_native = tmp_path / "native.vcf"
    call_batched(sam, fa, str(out_native), native_cfg)

    python_cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine="native",  # C++ PairHMM both sides (oracle-tested)
        assembler_engine="python", sw_engine="python", data_engine="python",
    )
    out_python = tmp_path / "python.vcf"
    call(sam, fa, str(out_python), python_cfg)

    with open(out_native, "rb") as a, open(out_python, "rb") as b:
        native_bytes, python_bytes = a.read(), b.read()
    assert native_bytes == python_bytes
    # the fixture must actually exercise calling (not a trivial empty VCF)
    assert sum(1 for l in native_bytes.splitlines() if not l.startswith(b"#")) > 5
