"""Read filters, clipper, downsampler, assembler unit/property tests."""

import dataclasses

import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.sam import SAMRecord, parse_sam_line
from gatk_hc_tpu.models import assembler
from gatk_hc_tpu.models.downsampler import downsample_window, select_one_read
from gatk_hc_tpu.models.read_clipper import (
    hard_clip_to_interval,
    revert_soft_clipped_bases,
)
from gatk_hc_tpu.models.read_filters import filter_reads
from gatk_hc_tpu.utils.cigar import cigar_to_string, parse_cigar
from gatk_hc_tpu.utils.interval import Interval
from tests.conftest import mutate, random_dna


def rec(pos=100, flag=99, mapq=60, cigar="50M", seq=None, qual=None, rnext="="):
    seq = seq or "A" * 50
    return SAMRecord(
        qname="q", flag=flag, rname="chrM", pos=pos, mapq=mapq,
        cigar=parse_cigar(cigar), rnext=rnext, pnext=pos, tlen=100,
        seq=seq, qual=qual or "I" * len(seq),
    )


class TestFilters:
    def test_all_four_filters(self):
        reads = [
            rec(mapq=19),            # low MAPQ
            rec(flag=99 | 0x400),    # duplicate
            rec(flag=99 | 0x100),    # secondary
            rec(rnext="chr2"),       # mate on other contig
            rec(),                   # keeper
        ]
        kept = filter_reads(reads, DEFAULT_CONFIG)
        assert len(kept) == 1
        assert kept[0] is reads[4]

    def test_mapq_boundary(self):
        assert len(filter_reads([rec(mapq=20)], DEFAULT_CONFIG)) == 1
        assert len(filter_reads([rec(mapq=19)], DEFAULT_CONFIG)) == 0


class TestClipper:
    def test_revert_forward_strand(self):
        # forward: leading S becomes M and POS moves back; trailing S trimmed
        r = rec(pos=100, flag=0, cigar="5S40M5S", seq="G" * 50)
        revert_soft_clipped_bases(r)
        assert cigar_to_string(r.cigar) == "5M40M5S"
        assert r.pos == 95
        assert len(r.seq) == 45  # trailing 5 trimmed

    def test_revert_forward_strand_near_contig_start(self):
        # alignment_begin < front_length -> leading S untouched
        r = rec(pos=3, flag=0, cigar="5S40M", seq="G" * 45)
        revert_soft_clipped_bases(r)
        assert cigar_to_string(r.cigar) == "5S40M"
        assert r.pos == 3

    def test_revert_reverse_strand(self):
        # reverse: leading S bases trimmed; trailing S becomes M
        r = rec(pos=100, flag=0x10, cigar="5S40M5S", seq="G" * 50)
        revert_soft_clipped_bases(r)
        assert cigar_to_string(r.cigar) == "5S40M5M"
        assert len(r.seq) == 45  # leading 5 trimmed
        assert r.pos == 100

    def test_hard_clip_to_interval_leaves_cigar_stale(self):
        r = rec(pos=91, cigar="50M", seq="C" * 50)
        hard_clip_to_interval(r, Interval("chrM", 100, 120))
        # 10 leading + 20 trailing clipped from SEQ/QUAL
        assert len(r.seq) == 20
        # deliberate reference quirk: CIGAR/POS untouched
        assert cigar_to_string(r.cigar) == "50M"
        assert r.pos == 91
        assert r.alignment_end == 140  # computed from the stale CIGAR


class TestDownsampler:
    def test_first_mode_deterministic(self):
        cfg = DEFAULT_CONFIG
        a, b = rec(pos=5, seq="A" * 50), rec(pos=5, seq="C" * 50)
        chosen = select_one_read([a, b], 4, cfg)
        assert chosen.seq == a.seq
        assert chosen is not a  # deep copy

    def test_seeded_mode_stable(self):
        cfg = dataclasses.replace(DEFAULT_CONFIG, downsample_mode="seeded", downsample_seed=7)
        bucket = [rec(pos=5, seq=base * 50) for base in "ACGT"]
        first = select_one_read(bucket, 4, cfg).seq
        again = select_one_read(bucket, 4, cfg).seq
        assert first == again

    def test_window_clamps(self):
        buckets = [[] for _ in range(10)]
        buckets[2].append(rec(pos=3))
        out = downsample_window(buckets, -5, 50, DEFAULT_CONFIG)
        assert len(out) == 1


class TestAssemblerProperties:
    def make_reads(self, rng, hap, n=30, length=60):
        reads = []
        for _ in range(n):
            start = rng.randint(0, len(hap) - length)
            seq = hap[start : start + length]
            reads.append(rec(pos=start + 1, cigar=f"{length}M", seq=seq))
        return reads

    def test_ref_only_assembly(self, rng):
        ref = random_dna(rng, 200)
        reads = self.make_reads(rng, ref)
        haps = assembler.assemble(reads, ref, DEFAULT_CONFIG)
        assert len(haps) == 1
        assert haps[0].bases == ref

    def test_het_snp_produces_two_haplotypes(self, rng):
        ref = random_dna(rng, 200)
        alt = ref[:100] + ("A" if ref[100] != "A" else "T") + ref[101:]
        reads = self.make_reads(rng, ref, n=25) + self.make_reads(rng, alt, n=25)
        haps = assembler.assemble(reads, ref, DEFAULT_CONFIG)
        bases = {h.bases for h in haps}
        assert ref in bases
        assert alt in bases
        # every haplotype aligns fully: read length conservation
        from gatk_hc_tpu.utils.cigar import read_length

        for h in haps:
            assert read_length(h.cigar) == len(h.bases)

    def test_low_quality_bases_excluded(self, rng):
        ref = random_dna(rng, 150)
        # reads with a low-quality SNP: qual below Q10 -> not used in graph
        alt = ref[:75] + ("A" if ref[75] != "A" else "T") + ref[76:]
        reads = []
        for _ in range(20):
            start = rng.randint(0, 90)
            seq = alt[start : start + 60]
            qual = list("I" * 60)
            snp_off = 75 - start
            if 0 <= snp_off < 60:
                qual[snp_off] = "$"  # Q3 < Q10
            reads.append(rec(pos=start + 1, cigar="60M", seq=seq, qual="".join(qual)))
        haps = assembler.assemble(reads, ref, DEFAULT_CONFIG)
        assert {h.bases for h in haps} == {ref}

    def test_kmer_retry_on_cycle(self, rng):
        # a reference with a long repeat creates duplicate kmers at k=25 but
        # assembles at a larger k
        unit = random_dna(rng, 30)
        ref = random_dna(rng, 40) + unit + unit + random_dna(rng, 40)
        reads = self.make_reads(rng, ref, n=25, length=70)
        haps = assembler.assemble(reads, ref, DEFAULT_CONFIG)
        assert any(h.bases == ref for h in haps)

    def test_randomized_invariants(self, rng):
        """SURVEY §4 property plan: the reference haplotype is always among
        the outputs, the count is capped, and every haplotype's SW cigar
        conserves its base length."""
        from gatk_hc_tpu.utils.cigar import read_length

        for _ in range(8):
            ref = random_dna(rng, 250)
            alt = mutate(
                rng, ref,
                n_snp=rng.randint(0, 3),
                n_ins=rng.randint(0, 1),
                n_del=rng.randint(0, 1),
            )
            reads = self.make_reads(rng, ref, n=15) + self.make_reads(
                rng, alt, n=15, length=min(60, len(alt) - 1)
            )
            haps = assembler.assemble(reads, ref, DEFAULT_CONFIG)
            assert len(haps) <= DEFAULT_CONFIG.max_num_haplotypes
            if haps:
                bases = {h.bases for h in haps}
                assert ref in bases
                for h in haps:
                    assert read_length(h.cigar) == len(h.bases)

    def test_native_matches_python(self, rng):
        native = pytest.importorskip("gatk_hc_tpu.native")
        if not native.available():
            pytest.skip("native library unavailable")
        from gatk_hc_tpu.ops.engines import make_assemble_fn

        cfg = dataclasses.replace(DEFAULT_CONFIG, assembler_engine="native")
        native_fn = make_assemble_fn(cfg)
        for _ in range(5):
            ref = random_dna(rng, 250)
            alt = mutate(rng, ref, n_snp=2, n_ins=1, n_del=1)
            reads = self.make_reads(rng, ref, n=20, length=70) + self.make_reads(
                rng, alt, n=20, length=70
            )
            want = assembler.assemble(reads, ref, DEFAULT_CONFIG)
            got = native_fn(reads, ref, cfg)
            assert [h.bases for h in got] == [h.bases for h in want]
            assert [h.cigar for h in got] == [h.cigar for h in want]
            assert [round(h.score, 12) for h in got] == [
                round(h.score, 12) for h in want
            ]
