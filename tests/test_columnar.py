"""Columnar C++ data path vs the per-record Python pipeline (its oracle).

The native path (io/columnar.py + hc_native.cpp::hc_sam_parse/
hc_prepare_window) must reproduce the Python parse -> downsample -> filter ->
revert-softclip -> hard-clip chain read-for-read: same sequences, same
qualities, same post-revert alignment intervals, both downsample modes.
"""

import dataclasses
import os

import pytest

from gatk_hc_tpu import native
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.fasta import read_all_fasta
from gatk_hc_tpu.io.sam import load_reads_by_contig, read_sam
from gatk_hc_tpu.models.caller import iter_windows
from gatk_hc_tpu.models.downsampler import downsample_window
from gatk_hc_tpu.models.read_clipper import hard_clip_reads
from gatk_hc_tpu.models.read_filters import filter_reads

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _fixture_paths():
    sam = os.path.join(FIXTURES, "chrM.sam")
    fa = os.path.join(FIXTURES, "chrM.fa")
    if not (os.path.exists(sam) and os.path.exists(fa)):
        pytest.skip("chrM fixture missing")
    return sam, fa


@pytest.mark.parametrize("mode", ["first", "seeded"])
def test_columnar_matches_python_pipeline(mode):
    from gatk_hc_tpu.io.columnar import ColumnarReadStore

    sam, fa = _fixture_paths()
    cfg = dataclasses.replace(DEFAULT_CONFIG, downsample_mode=mode)
    contigs = read_all_fasta(fa)
    for c in contigs:
        c.seq = c.seq.upper()
    sizes = {c.name: len(c.seq) for c in contigs}
    store = ColumnarReadStore(sam, sizes)
    buckets = load_reads_by_contig(read_sam(sam), sizes)
    # every chrM fixture read maps in-range, so the bucketed count equals
    # the store's in-range (bucketed) count AND its raw record count
    n_bucketed = sum(len(b) for bs in buckets.values() for b in bs)
    assert store.n_bucketed == n_bucketed
    assert store.n_reads == n_bucketed

    checked = 0
    for contig in contigs:
        for origin, padded in iter_windows(contig.name, len(contig.seq), cfg):
            py = downsample_window(
                buckets[contig.name], padded.begin, padded.end, cfg
            )
            py = hard_clip_reads(filter_reads(py, cfg), padded, cfg)
            nat, n_sel = store.prepare_window(
                contig.name, padded.begin, padded.end, cfg
            )
            assert len(py) == len(nat), (origin, len(py), len(nat))
            for a, b in zip(py, nat):
                assert a.seq == b.seq
                assert a.qual == b.qual
                assert a.interval.begin == b.interval.begin
                assert a.interval.end == b.interval.end
                checked += 1
    assert checked > 1000  # the fixture exercises real coverage


def test_columnar_e2e_vcf_identical(tmp_path):
    """call_batched with data_engine=native produces the golden chrM VCF."""
    from gatk_hc_tpu.models.caller import call_batched

    sam, fa = _fixture_paths()
    golden = os.path.join(FIXTURES, "chrM.golden.vcf")
    if not os.path.exists(golden):
        pytest.skip("golden VCF missing")
    out = str(tmp_path / "out.vcf")
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine="native",
        assembler_engine="native",
        data_engine="native",
    )
    call_batched(sam, fa, out, cfg)
    with open(out) as f1, open(golden) as f2:
        assert f1.read() == f2.read()


def test_columnar_soft_clip_and_strand_semantics(tmp_path):
    """Handwritten SAM exercising the clipper quirks: forward leading-S
    reversion (POS moves), reverse trailing-S conversion, single-element S
    cigar, out-of-window clipping, length filter."""
    from gatk_hc_tpu.io.columnar import ColumnarReadStore

    ref_len = 400
    lines = [
        "@HD\tVN:1.6",
        # forward read with leading+trailing softclips
        "r1\t0\tc\t31\t60\t5S20M3S\t=\t0\t0\t" + "A" * 28 + "\t" + "I" * 28,
        # reverse read with leading+trailing softclips
        "r2\t16\tc\t61\t60\t4S18M2S\t=\t0\t0\t" + "C" * 24 + "\t" + "I" * 24,
        # single-element all-S forward read near origin (POS too small to revert)
        "r3\t0\tc\t2\t60\t10S\t=\t0\t0\t" + "G" * 10 + "\t" + "I" * 10,
        # duplicate flag: filtered
        "r4\t1024\tc\t91\t60\t10M\t=\t0\t0\t" + "T" * 10 + "\t" + "I" * 10,
        # low mapq: filtered
        "r5\t0\tc\t101\t5\t10M\t=\t0\t0\t" + "T" * 10 + "\t" + "I" * 10,
        # mate on another contig: filtered
        "r6\t0\tc\t111\t60\t10M\tother\t0\t0\t" + "T" * 10 + "\t" + "I" * 10,
        # survives but clipped below min length by the window edge
        "r7\t0\tc\t380\t60\t30M\t=\t0\t0\t" + "T" * 30 + "\t" + "I" * 30,
    ]
    sam = tmp_path / "t.sam"
    sam.write_text("\n".join(lines) + "\n")

    cfg = DEFAULT_CONFIG
    sizes = {"c": ref_len}
    store = ColumnarReadStore(str(sam), sizes)
    buckets = load_reads_by_contig(read_sam(str(sam)), sizes)

    for begin, end in [(0, 200), (25, 120), (300, 400), (0, 60)]:
        from gatk_hc_tpu.utils.interval import Interval

        padded = Interval("c", begin, end)
        py = downsample_window(buckets["c"], begin, end, cfg)
        py = hard_clip_reads(filter_reads(py, cfg), padded, cfg)
        nat, _ = store.prepare_window("c", begin, end, cfg)
        assert [(r.seq, r.qual, r.interval.begin, r.interval.end) for r in py] == [
            (r.seq, r.qual, r.interval.begin, r.interval.end) for r in nat
        ], (begin, end)


def test_malformed_sam_line_raises(tmp_path):
    from gatk_hc_tpu.io.columnar import ColumnarReadStore

    sam = tmp_path / "bad.sam"
    sam.write_text(
        "@HD\tVN:1.6\n"
        "ok\t0\tc\t5\t60\t4M\t=\t0\t0\tACGT\tIIII\n"
        "short\t0\tc\t5\n"
    )
    with pytest.raises(ValueError, match="line 3"):
        ColumnarReadStore(str(sam), {"c": 100})


def test_non_numeric_field_raises(tmp_path):
    """FLAG/POS/MAPQ digit validation matches the Python oracle's int()
    error contract (a non-numeric field is a malformed line)."""
    from gatk_hc_tpu.io.columnar import ColumnarReadStore

    sam = tmp_path / "bad2.sam"
    sam.write_text(
        "@HD\tVN:1.6\n"
        "ok\t0\tc\t5\t60\t4M\t=\t0\t0\tACGT\tIIII\n"
        "bad\t0\tc\tabc\t60\t4M\t=\t0\t0\tACGT\tIIII\n"
    )
    with pytest.raises(ValueError, match="line 3"):
        ColumnarReadStore(str(sam), {"c": 100})


def test_empty_sam_yields_header_only_vcf(tmp_path):
    from gatk_hc_tpu.models.caller import call_batched

    sam = tmp_path / "empty.sam"
    sam.write_text("@HD\tVN:1.6\n")
    fa = tmp_path / "r.fa"
    fa.write_text(">c\n" + "ACGT" * 200 + "\n")
    out = tmp_path / "o.vcf"
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine="native",
        assembler_engine="native",
        data_engine="native",
    )
    call_batched(str(sam), str(fa), str(out), cfg)
    lines = out.read_text().splitlines()
    assert lines and all(l.startswith("#") for l in lines)


def test_unknown_contig_reads_dropped(tmp_path):
    from gatk_hc_tpu.io.columnar import ColumnarReadStore

    sam = tmp_path / "mix.sam"
    sam.write_text(
        "a\t0\tc\t5\t60\t4M\t=\t0\t0\tACGT\tIIII\n"
        "b\t0\tother\t5\t60\t4M\t=\t0\t0\tACGT\tIIII\n"
    )
    store = ColumnarReadStore(str(sam), {"c": 100})
    assert store.n_reads == 2
    assert store.n_bucketed == 1


def test_fused_window_path_matches_separate_stages(tmp_path):
    """call_batched's one-ctypes-call fused path (prepare+assemble+SW) must
    byte-match the separate prepare_window + assemble path."""
    import dataclasses
    import os

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.models.caller import call_batched
    from gatk_hc_tpu.ops.engines import make_assemble_fn

    fixtures = os.path.join(os.path.dirname(__file__), "..", "fixtures")
    sam = os.path.join(fixtures, "chrM.sam")
    fa = os.path.join(fixtures, "chrM.fa")
    if not os.path.exists(sam):
        import pytest

        pytest.skip("fixture missing")
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
    )
    out_fused = tmp_path / "fused.vcf"
    call_batched(sam, fa, str(out_fused), cfg)
    out_sep = tmp_path / "separate.vcf"
    # passing assemble_fn explicitly disables the fused fast path
    call_batched(sam, fa, str(out_sep), cfg, assemble_fn=make_assemble_fn(cfg))
    assert out_fused.read_text() == out_sep.read_text()
    golden = os.path.join(fixtures, "chrM.golden.vcf")
    assert out_fused.read_text() == open(golden).read()


class TestWindowReads:
    """Columnar WindowReads must quack exactly like the PreparedRead list
    the oracle path builds (same windows, same bytes, same spans)."""

    def test_matches_prepared_reads(self):
        import numpy as np

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.io.columnar import ColumnarReadStore
        from gatk_hc_tpu.io.fasta import read_all_fasta
        from gatk_hc_tpu.native import fused_window_fn

        fa = os.path.join(FIXTURES, "chrM.fa")
        sam = os.path.join(FIXTURES, "chrM.sam")
        contigs = read_all_fasta(fa)
        sizes = {c.name: len(c.seq) for c in contigs}
        store = ColumnarReadStore(sam, sizes)
        fused = fused_window_fn(
            DEFAULT_CONFIG, store, {c.name: c.seq.upper() for c in contigs}
        )
        seq = contigs[0].seq.upper()
        begin, end = 4000, 4415
        wr, n_ds, _haps = fused("chrM", begin, end, seq[begin:end])
        oracle, n_ds2 = store.prepare_window("chrM", begin, end, DEFAULT_CONFIG)
        assert n_ds == n_ds2
        assert len(wr) == len(oracle)
        # element access parity
        for k, r in enumerate(oracle):
            got = wr[k]
            assert got.seq_u8.tobytes() == r.seq_u8.tobytes()
            assert got.qual_u8.tobytes() == r.qual_u8.tobytes()
            assert got.alignment_begin == r.alignment_begin
            assert got.alignment_end == r.alignment_end
        # array views
        np.testing.assert_array_equal(
            wr.lengths, [len(r) for r in oracle]
        )
        arrays = wr.read_arrays()
        assert arrays[0][0].tobytes() == oracle[0].seq_u8.tobytes()
        # subset selection preserves order and content
        sub = wr.select(np.array([0, 2, len(wr) - 1]))
        assert len(sub) == 3
        assert sub[1].seq_u8.tobytes() == oracle[2].seq_u8.tobytes()
        assert sub[2].alignment_end == oracle[-1].alignment_end
        assert wr.select(np.arange(len(wr))) is wr
        empty = wr.select(np.array([], dtype=np.int64))
        assert len(empty) == 0


class TestFusedCtrlPath:
    """hc_fused_run (single-pointer control block + native downsample
    select) must match the legacy multi-argument fused call and the Python
    prepare_window oracle bit-for-bit, in both downsample modes, across
    every window, including after a scratch reallocation invalidates the
    embedded pointers."""

    @pytest.mark.parametrize("mode", ["first", "seeded"])
    def test_ctrl_matches_fallback_and_oracle(self, mode):
        import numpy as np

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.io.columnar import ColumnarReadStore
        from gatk_hc_tpu.io.fasta import read_all_fasta
        from gatk_hc_tpu.models.caller import iter_windows
        from gatk_hc_tpu.native import fused_window_fn

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, downsample_mode=mode, downsample_seed=1234567,
        )
        contigs = read_all_fasta(os.path.join(FIXTURES, "chrM.fa"))
        seq = contigs[0].seq.upper()
        sizes = {c.name: len(c.seq) for c in contigs}
        store = ColumnarReadStore(os.path.join(FIXTURES, "chrM.sam"), sizes)
        # ctrl path (contig bytes available) vs fallback (no contig map ->
        # legacy 30-argument call with Python-side numpy select)
        ctrl_fn = fused_window_fn(cfg, store, {"chrM": seq})
        fb_fn = fused_window_fn(cfg, store, None)
        for k, (origin, padded) in enumerate(
            iter_windows("chrM", len(seq), cfg)
        ):
            win = seq[padded.begin : padded.end]
            a = ctrl_fn("chrM", padded.begin, padded.end, win)
            b = fb_fn("chrM", padded.begin, padded.end, win)
            assert a[1] == b[1]
            assert len(a[0]) == len(b[0])
            for ra, rb in zip(a[0], b[0]):
                assert ra.seq_u8.tobytes() == rb.seq_u8.tobytes()
                assert ra.qual_u8.tobytes() == rb.qual_u8.tobytes()
            assert len(a[2]) == len(b[2])
            for ha, hb in zip(a[2], b[2]):
                assert ha.bases == hb.bases
                assert ha.cigar == hb.cigar
                assert ha.alignment_begin_wrt_ref == hb.alignment_begin_wrt_ref
                assert ha.score == hb.score
            # Python oracle parity for the selected reads
            oracle, n_ds = store.prepare_window(
                "chrM", padded.begin, padded.end, cfg
            )
            assert a[1] == n_ds
            assert len(a[0]) == len(oracle)
            for ra, ro in zip(a[0], oracle):
                assert ra.seq_u8.tobytes() == ro.seq_u8.tobytes()
            if k == 2:
                # invalidate the ctrl block's embedded scratch addresses
                # mid-run: the generation check must re-bind
                from gatk_hc_tpu.native import (
                    _ASSEMBLE_SCRATCH,
                    _WINDOW_SCRATCH,
                )

                _WINDOW_SCRATCH.ensure(4 * _WINDOW_SCRATCH.cap, 1)
                _ASSEMBLE_SCRATCH.ensure(
                    _ASSEMBLE_SCRATCH.max_h + 8, 1024
                )


class TestFusedCtrlGrowRetry:
    def test_output_capacity_grow_and_retry(self, tmp_path):
        """hc_fused_run returns -10 when the window's prepared-read bytes
        exceed the out-blob scratch; the wrapper must grow, re-bind the
        control block, retry, and match the oracle.  chrM windows sit just
        under the 64 KB initial cap, so this path needs a denser fixture:
        one read per position x 250 bp >> 64 KB per window."""
        import dataclasses

        import numpy as np

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.io.columnar import ColumnarReadStore
        from gatk_hc_tpu.native import fused_window_fn

        rng = np.random.default_rng(3)
        contig = "dense"
        size = 2000
        seq = "".join(rng.choice(list("ACGT"), size))
        read_len = 250
        lines = ["@HD\tVN:1.6\tSO:coordinate", f"@SQ\tSN:{contig}\tLN:{size}"]
        for pos in range(1, size - read_len, 1):
            bases = seq[pos - 1 : pos - 1 + read_len]
            quals = "I" * read_len
            lines.append(
                f"r{pos}\t0\t{contig}\t{pos}\t60\t{read_len}M\t=\t0\t0\t"
                f"{bases}\t{quals}"
            )
        sam = tmp_path / "dense.sam"
        sam.write_text("\n".join(lines) + "\n")
        cfg = DEFAULT_CONFIG
        store = ColumnarReadStore(str(sam), {contig: size})
        # reset this thread's window scratch so the initial 64 KB cap is
        # deterministic (earlier tests may have grown it past the need,
        # which would silently skip the -10 path under test)
        from gatk_hc_tpu import native as _native_mod

        ws = _native_mod._WINDOW_SCRATCH
        for attr in ("cap", "n"):
            if hasattr(ws, attr):
                delattr(ws, attr)
        fused = fused_window_fn(cfg, store, {contig: seq})
        begin, end = 100, 515  # 415 positions x 250 bp ~ 104 KB > 64 KB
        reads, n_ds, haps = fused(contig, begin, end, seq[begin:end])
        oracle, n_ds2 = store.prepare_window(contig, begin, end, cfg)
        assert n_ds == n_ds2 and len(reads) == len(oracle)
        total = sum(len(r) for r in oracle)
        assert total > (1 << 16)  # the grow/retry path actually fired
        for ra, ro in zip(reads, oracle):
            assert ra.seq_u8.tobytes() == ro.seq_u8.tobytes()


class TestMultiThreadedParse:
    """hc_sam_parse_mt must be byte-identical to the serial parse for any
    thread count, including the malformed-line error contract (the earliest
    absolute line number, like the serial scan)."""

    COLUMNS = (
        "pos", "flag", "mapq", "rnext_eq", "rname_id",
        "cig_off", "cig_op", "cig_len", "seq_off", "seq", "qual",
    )

    def _sizes(self):
        fa = os.path.join(FIXTURES, "chrM.fa")
        return {c.name: len(c.seq) for c in read_all_fasta(fa)}

    def _big_sam(self, tmp_path, repeats=8):
        """chrM.sam with its record lines replicated: >8 MB, so the MT
        entry point actually splits into blocks (it falls back to the
        serial parse below ~1 MB per thread)."""
        raw = open(os.path.join(FIXTURES, "chrM.sam"), "rb").read()
        lines = raw.split(b"\n")
        header = [l for l in lines if l.startswith(b"@")]
        body = [l for l in lines if l and not l.startswith(b"@")]
        big = tmp_path / "big.sam"
        big.write_bytes(b"\n".join(header + body * repeats) + b"\n")
        return str(big)

    @pytest.mark.parametrize("threads", [2, 3, 8])
    def test_identical_columns(self, threads, tmp_path):
        import numpy as np

        from gatk_hc_tpu.io.columnar import ColumnarReadStore

        sam = self._big_sam(tmp_path)
        sizes = self._sizes()
        serial = ColumnarReadStore(sam, sizes, threads=1)
        mt = ColumnarReadStore(sam, sizes, threads=threads)
        assert mt.n_reads == serial.n_reads
        for col in self.COLUMNS:
            np.testing.assert_array_equal(
                getattr(mt, col), getattr(serial, col), err_msg=col
            )

    def test_malformed_line_number_parity(self, tmp_path):
        from gatk_hc_tpu.io.columnar import ColumnarReadStore

        sam = self._big_sam(tmp_path)
        lines = open(sam, "rb").read().split(b"\n")
        bad_index = (3 * len(lines)) // 4  # inside a later MT block
        lines[bad_index] = b"broken\tline"
        bad = tmp_path / "bad.sam"
        bad.write_bytes(b"\n".join(lines))
        sizes = self._sizes()
        messages = []
        for threads in (1, 4):
            with pytest.raises(ValueError) as err:
                ColumnarReadStore(str(bad), sizes, threads=threads)
            messages.append(str(err.value))
        assert messages[0] == messages[1]
        assert f"line {bad_index + 1}" in messages[0]

    def test_empty_and_header_only(self, tmp_path):
        from gatk_hc_tpu.io.columnar import ColumnarReadStore

        p = tmp_path / "hdr.sam"
        p.write_text("@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16571\n")
        store = ColumnarReadStore(str(p), self._sizes(), threads=4)
        assert store.n_reads == 0

    @pytest.mark.parametrize("threads", [2, 5])
    def test_parse_ranges_mt_identical(self, threads, tmp_path):
        """Shard-restricted MT parse == serial ranged parse, including the
        keep-range filter in the counting pass."""
        import numpy as np

        from gatk_hc_tpu.io.columnar import SamLayout

        sam = self._big_sam(tmp_path)
        sizes = self._sizes()
        name = next(iter(sizes))
        ranges = {name: (1500, 12000)}
        lay = SamLayout(sam, sizes, start_ranges=ranges)
        serial = lay.store_for(name)
        mt = lay.store_for(name, threads=threads)
        assert mt.n_reads == serial.n_reads > 0
        for col in self.COLUMNS:
            np.testing.assert_array_equal(
                getattr(mt, col), getattr(serial, col), err_msg=col
            )

    @pytest.mark.parametrize("threads", [2, 5])
    def test_scan_ranges_mt_identical(self, threads, tmp_path):
        import numpy as np

        from gatk_hc_tpu.io.columnar import SamLayout

        sam = self._big_sam(tmp_path)
        sizes = self._sizes()
        serial = SamLayout(sam, sizes)
        mt = SamLayout(sam, sizes, threads=threads)
        np.testing.assert_array_equal(serial.rows, mt.rows)
        # shard-restricted ranges merge identically too
        name = next(iter(sizes))
        ranges = {name: (2000, 9000)}
        s2 = SamLayout(sam, sizes, start_ranges=ranges)
        m2 = SamLayout(sam, sizes, start_ranges=ranges, threads=threads)
        np.testing.assert_array_equal(s2.rows, m2.rows)
