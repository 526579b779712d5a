"""Shard-restricted SAM parsing + contig streaming (bounded memory).

The multi-host design parses per-process shards (each host materializes
only the reads its padded windows can select) instead of N full parses;
cfg.stream_contigs parses one contig slice at a time.  Both must be
invisible in the output: these tests pin window-level parity, the
shard-boundary read contract, and end-to-end VCF equality.
"""

import dataclasses
import os
import pathlib
import random

import numpy as np
import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.columnar import ColumnarReadStore, SamLayout, columnar_available
from gatk_hc_tpu.io.fasta import read_all_fasta
from gatk_hc_tpu.models.caller import call_batched, iter_windows
from gatk_hc_tpu.parallel.multihost import partition_regions, shard_start_ranges
from tests.test_multicontig import write_two_contig_fixture

FIXTURES = pathlib.Path(__file__).parent.parent / "fixtures"
SAM = str(FIXTURES / "chrM.sam")
FASTA = str(FIXTURES / "chrM.fa")

pytestmark = pytest.mark.skipif(
    not columnar_available(), reason="native library unavailable"
)

CFG = dataclasses.replace(
    DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
)


def contig_sizes():
    return {c.name: len(c.seq) for c in read_all_fasta(FASTA)}


class TestRangedStore:
    def test_window_parity_inside_range(self):
        """Any window whose padded interval lies inside the kept range must
        prepare byte-identical reads from a ranged store."""
        sizes = contig_sizes()
        full = ColumnarReadStore(SAM, sizes)
        sub = ColumnarReadStore(SAM, sizes, start_ranges={"chrM": (4000, 9000)})
        for begin, end in [(4000, 4415), (5120, 5535), (8585, 9000)]:
            r_full, nd_full = full.prepare_window("chrM", begin, end, CFG)
            r_sub, nd_sub = sub.prepare_window("chrM", begin, end, CFG)
            assert nd_full == nd_sub
            assert len(r_full) == len(r_sub)
            for a, b in zip(r_full, r_sub):
                assert a.seq_u8.tobytes() == b.seq_u8.tobytes()
                assert a.qual_u8.tobytes() == b.qual_u8.tobytes()
                assert a.alignment_begin == b.alignment_begin
                assert a.alignment_end == b.alignment_end

    def test_layout_store_equals_full(self):
        """A SamLayout scan + per-contig slice parse reproduces the full
        store's contig contents."""
        sizes = contig_sizes()
        full = ColumnarReadStore(SAM, sizes)
        sliced = SamLayout(SAM, sizes).store_for("chrM")
        assert sliced.n_bucketed == full.n_bucketed
        np.testing.assert_array_equal(sliced.pos, full.pos)
        np.testing.assert_array_equal(sliced.seq, full.seq)
        np.testing.assert_array_equal(sliced.cig_op, full.cig_op)

    def test_unknown_contig_dropped_in_ranged_mode(self, tmp_path):
        """Ranged parses drop records whose RNAME matches no contig; the
        full store keeps them with rname_id=-1 (loader parity)."""
        sam = tmp_path / "odd.sam"
        sam.write_text(
            "r1\t0\tctgX\t5\t60\t4M\t=\t5\t0\tACGT\tIIII\n"
            "r2\t0\tctgY\t5\t60\t4M\t=\t5\t0\tACGT\tIIII\n"
        )
        sizes = {"ctgX": 100}
        full = ColumnarReadStore(str(sam), sizes)
        assert len(full.pos) == 2  # ctgY kept, unmatched
        ranged = ColumnarReadStore(str(sam), sizes, start_ranges={"ctgX": (0, 100)})
        assert len(ranged.pos) == 1
        assert ranged.rname_id[0] == 0

    def test_malformed_line_number_offset(self, tmp_path):
        """Slice parses report line numbers relative to the file, not the
        slice."""
        sam = tmp_path / "bad.sam"
        # line 1 is excluded by the range, so the parsed slice starts at
        # line 2; the malformed line sits between two kept records (a
        # malformed line outside the kept slice is not validated — only the
        # full-file store checks the whole file)
        sam.write_text(
            "r0\t0\tctgX\t1\t60\t4M\t=\t1\t0\tACGT\tIIII\n"
            "r1\t0\tctgX\t50\t60\t4M\t=\t50\t0\tACGT\tIIII\n"
            "broken line with few fields\n"
            "r2\t0\tctgX\t60\t60\t4M\t=\t60\t0\tACGT\tIIII\n"
        )
        sizes = {"ctgX": 100}
        with pytest.raises(ValueError, match="line 3"):
            ColumnarReadStore(str(sam), sizes, start_ranges={"ctgX": (40, 100)})


class TestShardRanges:
    def test_boundary_read_appears_in_both_shards(self):
        """A read whose start position falls in the overlap of two shards'
        padded spans must be parsed by both processes — its window may be
        assigned to either."""
        contigs = read_all_fasta(FASTA)
        n_regions = sum(
            (len(c.seq) + CFG.region_size - 1) // CFG.region_size
            for c in contigs
        )
        r0 = shard_start_ranges(contigs, CFG, partition_regions(n_regions, 0, 2))
        r1 = shard_start_ranges(contigs, CFG, partition_regions(n_regions, 1, 2))
        lo0, hi0 = r0["chrM"]
        lo1, hi1 = r1["chrM"]
        assert lo0 == 0 and hi1 == len(contigs[0].seq)
        # padding creates a 2*padding overlap around the boundary
        assert lo1 < hi0
        assert hi0 - lo1 == 2 * CFG.padding_size
        sizes = contig_sizes()
        s0 = ColumnarReadStore(SAM, sizes, start_ranges=r0)
        s1 = ColumnarReadStore(SAM, sizes, start_ranges=r1)
        overlap = (s0.pos - 1 >= lo1) & (s0.pos - 1 < hi0)
        assert overlap.any(), "fixture has no reads starting in the overlap"
        starts0 = sorted(s0.pos[overlap])
        starts1 = sorted(p for p in s1.pos if lo1 <= p - 1 < hi0)
        assert starts0 == starts1

    def test_shard_spans_cover_every_padded_window(self):
        """Every window a shard owns selects reads only from start
        positions inside that shard's parsed span."""
        contigs = read_all_fasta(FASTA)
        n_regions = sum(
            (len(c.seq) + CFG.region_size - 1) // CFG.region_size
            for c in contigs
        )
        for pid in range(3):
            mine = partition_regions(n_regions, pid, 3)
            ranges = shard_start_ranges(contigs, CFG, mine)
            for index, (origin, padded) in enumerate(
                iter_windows(contigs[0].name, len(contigs[0].seq), CFG)
            ):
                if index not in mine:
                    continue
                lo, hi = ranges["chrM"]
                assert lo <= padded.begin and padded.end <= hi

    def test_two_way_sharded_run_matches_golden(self):
        golden = [
            l
            for l in open(FIXTURES / "chrM.golden.vcf")
            if not l.startswith("#")
        ]
        contigs = read_all_fasta(FASTA)
        n_regions = sum(
            (len(c.seq) + CFG.region_size - 1) // CFG.region_size
            for c in contigs
        )
        merged = []
        for pid in (0, 1):
            mine = set(partition_regions(n_regions, pid, 2))
            sr = shard_start_ranges(
                contigs, CFG, partition_regions(n_regions, pid, 2)
            )
            res = call_batched(
                SAM, FASTA, None, CFG,
                region_filter=lambda i: i in mine, start_ranges=sr,
            )
            merged.extend(
                v.to_vcf_row() for r in res for v in r.variants
            )
        assert merged == golden


class TestContigStreaming:
    def test_chrm_stream_matches_golden(self, tmp_path):
        cfg = dataclasses.replace(CFG, stream_contigs=True)
        out = tmp_path / "stream.vcf"
        call_batched(SAM, FASTA, str(out), cfg)
        assert out.read_text() == (FIXTURES / "chrM.golden.vcf").read_text()

    def test_multicontig_stream_matches_plain(self, tmp_path):
        rng = random.Random(7)
        sam, fasta, _ = write_two_contig_fixture(tmp_path, rng)
        plain = tmp_path / "plain.vcf"
        stream = tmp_path / "stream.vcf"
        call_batched(sam, fasta, str(plain), CFG)
        call_batched(
            sam, fasta, str(stream),
            dataclasses.replace(CFG, stream_contigs=True),
        )
        assert plain.read_text() == stream.read_text()
        assert "ctgB" in plain.read_text()

    def test_stream_composes_with_shard_ranges(self, tmp_path):
        """Multi-host + streaming: a shard's streamed run equals its
        non-streamed run."""
        rng = random.Random(11)
        sam, fasta, _ = write_two_contig_fixture(tmp_path, rng)
        contigs = read_all_fasta(fasta)
        n_regions = sum(
            (len(c.seq) + CFG.region_size - 1) // CFG.region_size
            for c in contigs
        )
        mine = partition_regions(n_regions, 1, 2)
        mine_set = set(mine)
        sr = shard_start_ranges(contigs, CFG, mine)
        rows = {}
        for tag, cfg in (
            ("plain", CFG),
            ("stream", dataclasses.replace(CFG, stream_contigs=True)),
        ):
            res = call_batched(
                sam, fasta, None, cfg,
                region_filter=lambda i: i in mine_set, start_ranges=sr,
            )
            rows[tag] = [v.to_vcf_row() for r in res for v in r.variants]
        assert rows["plain"] == rows["stream"]
        assert rows["plain"], "shard 1 called no variants"

    def test_stream_with_thread_pool_matches_golden(self, tmp_path):
        """Contig streaming + the host worker pool: the store swap drains
        all in-flight workers first, so output stays byte-identical."""
        cfg = dataclasses.replace(CFG, stream_contigs=True, host_threads=4)
        out = tmp_path / "stream_pool.vcf"
        call_batched(SAM, FASTA, str(out), cfg)
        assert out.read_text() == (FIXTURES / "chrM.golden.vcf").read_text()

    def test_parse_ahead_matches_and_prefetches(self, tmp_path, monkeypatch):
        """Streaming parse-ahead (default on) must not change output, and
        on a multi-contig input every contig after the first must come from
        the background prefetch, not a blocking parse."""
        from gatk_hc_tpu.io.columnar import SamLayout

        rng = random.Random(13)
        sam, fasta, _ = write_two_contig_fixture(tmp_path, rng)
        parsed_names = []
        orig = SamLayout.store_for

        def spy(self, *names, **kwargs):
            parsed_names.append(names)
            return orig(self, *names, **kwargs)

        monkeypatch.setattr(SamLayout, "store_for", spy)
        rows = {}
        for tag, ahead in (("ahead", True), ("sync", False)):
            parsed_names.clear()
            res = call_batched(
                sam, fasta, None,
                dataclasses.replace(
                    CFG, stream_contigs=True, parse_ahead=ahead
                ),
            )
            rows[tag] = [v.to_vcf_row() for r in res for v in r.variants]
            # both modes parse each contig exactly once
            assert sorted(parsed_names) == [("ctgA",), ("ctgB",)]
        assert rows["ahead"] == rows["sync"]
        assert rows["ahead"], "no variants called"
