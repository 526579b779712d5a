"""Unit tests: intervals, CIGARs, SAM parsing, quality/numeric tables."""

import numpy as np
import pytest

from gatk_hc_tpu.io.sam import SAMRecord, load_reads_by_start, parse_sam_line
from gatk_hc_tpu.utils.cigar import (
    cigar_to_string,
    parse_cigar,
    read_length,
    reference_length,
    reverse_cigar,
)
from gatk_hc_tpu.utils.interval import Interval
from gatk_hc_tpu.utils import quality as Q


class TestInterval:
    def test_parse_forms(self):
        assert Interval.parse("chrM") == Interval("chrM", 0, 2**63 - 1)
        assert Interval.parse("chr1:1,000-2,000") == Interval("chr1", 1000, 2000)
        assert Interval.parse("chr1:500") == Interval("chr1", 500, 501)
        assert Interval.parse("chr1:500+").end > 10**15

    def test_overlap_contains_span(self):
        a = Interval("c", 10, 20)
        assert a.overlaps(Interval("c", 19, 25))
        assert not a.overlaps(Interval("c", 20, 25))  # half-open
        assert not a.overlaps(Interval("d", 15, 16))
        assert a.contains(Interval("c", 12, 20))
        assert a.span_with(Interval("c", 5, 12)) == Interval("c", 5, 20)
        assert a.expand_within_contig(3) == Interval("c", 7, 23)

    def test_invalid(self):
        with pytest.raises(ValueError):
            Interval("c", 5, 4)


class TestCigar:
    def test_roundtrip(self):
        c = parse_cigar("10M2I5D3S")
        assert c == ((10, "M"), (2, "I"), (5, "D"), (3, "S"))
        assert cigar_to_string(c) == "10M2I5D3S"

    def test_lengths(self):
        c = parse_cigar("10M2I5D3S4N1=2X")
        # ref consumes M,D,N,=,X; read consumes M,I,S,=,X
        assert reference_length(c) == 10 + 5 + 4 + 1 + 2
        assert read_length(c) == 10 + 2 + 3 + 1 + 2

    def test_reverse(self):
        assert reverse_cigar(parse_cigar("1M2I")) == ((2, "I"), (1, "M"))


class TestSAM:
    LINE = "read1\t99\tchrM\t100\t60\t10M2I88M\t=\t350\t400\t" + "A" * 100 + "\t" + "I" * 100

    def test_parse(self):
        r = parse_sam_line(self.LINE)
        assert r.qname == "read1"
        assert r.alignment_begin == 99
        assert r.alignment_end == 99 + 98
        assert r.is_paired and not r.is_duplicate and not r.is_secondary
        assert r.interval == Interval("chrM", 99, 197)
        assert len(r) == 100

    def test_buckets(self):
        r = parse_sam_line(self.LINE)
        buckets = load_reads_by_start([r], 1000)
        assert len(buckets[99]) == 1
        # out-of-range reads are dropped, not UB
        assert load_reads_by_start([r], 50) == [[] for _ in range(50)]


class TestQualityTables:
    def test_ph2pr(self):
        assert Q.PH2PR_F64[0] == 1.0
        assert np.isclose(Q.PH2PR_F64[10], 0.1)
        # the raw-ASCII quirk: 'I'==73 acts as Phred-73
        assert np.isclose(Q.PH2PR_F64[ord("I")], 10 ** -7.3)

    def test_qual_to_error_prob(self):
        assert Q.QUAL_TO_ERROR_PROB[33] == 1.0
        assert np.isclose(Q.QUAL_TO_ERROR_PROB[33 + 40], 1e-4)

    def test_approx_log10_sum(self):
        a, b = -4.0, -4.0
        got = Q.approximate_log10_sum_log10(a, b)
        assert np.isclose(got, np.log10(2e-4), atol=1e-6)
        # far apart -> returns the bigger
        assert Q.approximate_log10_sum_log10(-100.0, -1.0) == -1.0

    def test_match_to_match(self):
        got = Q.set_mm_prob(40, 40, Q.MATCH_TO_MATCH_F64)
        assert np.isclose(got, 1.0 - 2e-4, atol=1e-7)
        got73 = Q.set_mm_prob(73, 73, Q.MATCH_TO_MATCH_F64)
        assert np.isclose(got73, 1.0 - 2 * 10**-7.3, atol=1e-9)

    def test_match_to_match_vectorized_bitexact(self):
        # the production vectorized builder must reproduce the scalar
        # Context.h:50-61 oracle bit-for-bit in both precisions
        ref64 = Q._match_to_match_scalar(np.float64)
        np.testing.assert_array_equal(
            Q.MATCH_TO_MATCH_F64.view(np.uint64), ref64.view(np.uint64)
        )
        ref32 = Q._match_to_match_scalar(np.float32)
        np.testing.assert_array_equal(
            Q.MATCH_TO_MATCH_F32.view(np.uint32), ref32.view(np.uint32)
        )

    def test_constants(self):
        assert Q.INITIAL_CONSTANT_F32 == np.float32(2.0**120)
        assert Q.INITIAL_CONSTANT_F64 == 2.0**1020
        assert np.float32(1e-28) == Q.MIN_ACCEPTED
