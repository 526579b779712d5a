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
    by_kind = {}
    for pos, kind, _payload in truth:
        window = (
            {pos, pos + 1, pos + 2}
            if kind == "snp"
            else set(range(pos - 1, pos + 3))
        )
        hit = bool(called & window)
        hits += hit
        total_k, hits_k = by_kind.get(kind, (0, 0))
        by_kind[kind] = (total_k + 1, hits_k + hit)
        near_truth.update(range(pos - 2, pos + 6))
    assert len(truth) > 150
    sensitivity = hits / len(truth)
    false_like = sum(1 for r in rows if r.pos not in near_truth)
    precision_proxy = 1.0 - false_like / max(len(rows), 1)
    # the fixture is seeded, so these are regression bounds just under the
    # measured values (snp 1.000, ins 0.974, del 0.951, total 0.985)
    assert sensitivity >= 0.97, f"sensitivity {sensitivity:.3f}"
    per_kind_floor = {"snp": 0.99, "ins": 0.94, "del": 0.92}
    for kind, (total_k, hits_k) in sorted(by_kind.items()):
        sens_k = hits_k / total_k
        assert sens_k >= per_kind_floor[kind], (
            f"{kind} sensitivity {sens_k:.3f} < {per_kind_floor[kind]}"
        )
    assert precision_proxy >= 0.99, f"near-truth precision {precision_proxy:.3f}"
