"""Assembly property tests (SURVEY.md §4's implied plan): every returned
haplotype must be a source→sink walk of the read-threading graph, the
reference haplotype must always be present, and the Python and C++
assemblers must agree exactly.
"""

import dataclasses
import random

import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.sam import SAMRecord
from gatk_hc_tpu.models.assembler import assemble
from tests.conftest import random_dna


def _mk_read(name, seq, start):
    return SAMRecord(
        name, 99, "ctg", start + 1, 60, ((len(seq), "M"),), "=", start + 1,
        2 * len(seq), seq, "I" * len(seq),
    )


def _workload(rng, ref_len=400, n_reads=60, read_len=100, n_snps=2):
    ref = random_dna(rng, ref_len)
    alt = list(ref)
    for _ in range(n_snps):
        pos = rng.randrange(50, ref_len - 50)
        alt[pos] = rng.choice([b for b in "ACGT" if b != alt[pos]])
    alt = "".join(alt)
    reads = []
    for i in range(n_reads):
        hap = ref if rng.random() < 0.5 else alt
        start = rng.randint(0, ref_len - read_len)
        reads.append(_mk_read(f"r{i}", hap[start : start + read_len], start))
    return ref, alt, reads


# fixed k (no retry ladder) so the source/sink kmers are known
CFG = dataclasses.replace(DEFAULT_CONFIG, max_kmer_iterations=1)
K = CFG.initial_kmer_size


class TestAssemblyProperties:
    @pytest.mark.parametrize("seed", [1, 7, 23, 99])
    def test_source_sink_walk_and_ref_presence(self, seed):
        rng = random.Random(seed)
        ref, alt, reads = _workload(rng)
        haplotypes = assemble(reads, ref, CFG)
        if not haplotypes:
            pytest.skip("graph rejected (cycle/kmer cap) for this seed")
        bases = [h.bases for h in haplotypes]
        # the reference path is always threaded first and never pruned
        assert ref in bases
        for b in bases:
            # source = the ref's first kmer, sink = the ref's last kmer:
            # every enumerated path walks source -> sink
            assert b[:K] == ref[:K]
            assert b[-K:] == ref[-K:]
        # scores are log10 edge-frequency sums: finite, <= 0, sorted desc
        scores = [h.score for h in haplotypes]
        assert all(s <= 0 for s in scores)
        assert scores == sorted(scores, reverse=True)
        # with enough alt support the alt haplotype is reconstructed
        assert alt in bases

    @pytest.mark.parametrize("seed", [3, 11])
    def test_python_native_assemblers_agree(self, seed):
        from gatk_hc_tpu.native import available, native_assemble_fn

        if not available():
            pytest.skip("native library unavailable")
        rng = random.Random(seed)
        ref, _alt, reads = _workload(rng, n_snps=3)
        py = assemble(reads, ref, CFG)
        nat_cfg = dataclasses.replace(CFG, sw_engine="native")
        nat = native_assemble_fn(nat_cfg)(reads, ref, nat_cfg)
        assert [h.bases for h in py] == [h.bases for h in nat]
        for a, b in zip(py, nat):
            assert a.score == pytest.approx(b.score, rel=0, abs=1e-12)
            assert a.cigar == b.cigar
            assert a.alignment_begin_wrt_ref == b.alignment_begin_wrt_ref

    def test_haplotype_cap(self):
        """A bubble-rich region caps at max_num_haplotypes, keeping the
        best-scoring paths."""
        rng = random.Random(5)
        ref, _alt, reads = _workload(rng, n_snps=8, n_reads=200)
        cfg = dataclasses.replace(CFG, max_num_haplotypes=4)
        haps = assemble(reads, ref, cfg)
        assert len(haps) <= 4
        full = assemble(reads, ref, CFG)
        if len(full) > 4:
            assert [h.bases for h in haps] == [h.bases for h in full[:4]]
