"""Calling accuracy against planted truth on a generated diploid fixture.

Generates a 100kb contig with known het SNPs/insertions/deletions (the same
simulator as the chrM fixture, tools/make_fixture.py), calls it end-to-end
on the CPU engines, and asserts sensitivity and near-truth precision — a
regression guard on the caller's overall quality, not just per-component
exactness.  (Measured on a 2Mb fixture: 94.8% sensitivity, 99.9% of calls
within 5bp of a planted variant.)
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


@pytest.mark.slow
def test_sensitivity_and_precision_on_planted_truth(tmp_path):
    from make_fixture import make_reference, plant_variants, simulate_reads

    from gatk_hc_tpu.io.vcf import read_vcf
    from gatk_hc_tpu.models.caller import call_batched

    rng = random.Random(777)
    ref = make_reference(rng, 100_000)
    alt, truth, anchors = plant_variants(rng, ref)
    sam_lines = simulate_reads(rng, "sim", ref, alt, depth=30, anchors=anchors)

    fa = tmp_path / "sim.fa"
    write_fasta(str(fa), [FastaRecord("sim", "accuracy fixture", ref)])
    sam = tmp_path / "sim.sam"
    with open(sam, "w") as handle:
        handle.write("@HD\tVN:1.6\tSO:coordinate\n")
        handle.write(f"@SQ\tSN:sim\tLN:{len(ref)}\n")
        for line in sam_lines:
            handle.write(line + "\n")

    out = tmp_path / "sim.vcf"
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
    )
    call_batched(str(sam), str(fa), str(out), cfg)
    _, rows = read_vcf(str(out))
    called = {r.pos for r in rows}

    hits = 0
    near_truth = set()
    for pos, kind, _payload in truth:
        window = (
            {pos, pos + 1, pos + 2}
            if kind == "snp"
            else set(range(pos - 1, pos + 3))
        )
        if called & window:
            hits += 1
        near_truth.update(range(pos - 2, pos + 6))
    assert len(truth) > 150
    sensitivity = hits / len(truth)
    false_like = sum(1 for r in rows if r.pos not in near_truth)
    precision_proxy = 1.0 - false_like / max(len(rows), 1)
    assert sensitivity >= 0.90, f"sensitivity {sensitivity:.3f}"
    assert precision_proxy >= 0.99, f"near-truth precision {precision_proxy:.3f}"
