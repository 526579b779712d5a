"""End-to-end: chrM fixture -> VCF golden-file equality + engine agreement."""

import dataclasses
import os

import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.models.caller import call, iter_windows

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "fixtures")
SAM = os.path.join(FIXTURES, "chrM.sam")
FASTA = os.path.join(FIXTURES, "chrM.fa")
GOLDEN = os.path.join(FIXTURES, "chrM.golden.vcf")

needs_fixture = pytest.mark.skipif(
    not os.path.exists(SAM), reason="fixture not generated"
)


class TestWindows:
    def test_window_geometry(self):
        # haplotypecaller.hpp:125-151: first window only end-padded
        windows = list(iter_windows("chrM", 16569, DEFAULT_CONFIG))
        assert len(windows) == (16569 + 244) // 245
        origin0, padded0 = windows[0]
        assert (origin0.begin, origin0.end) == (0, 245)
        assert (padded0.begin, padded0.end) == (0, 330)
        origin1, padded1 = windows[1]
        assert (origin1.begin, origin1.end) == (245, 490)
        assert (padded1.begin, padded1.end) == (160, 575)
        # last padded window clamped to the contig
        assert windows[-1][1].end == 16569


@needs_fixture
class TestEndToEnd:
    def test_native_matches_golden(self, tmp_path):
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        out = tmp_path / "chrM.vcf"
        results = call(SAM, FASTA, str(out), cfg)
        assert out.read_text() == open(GOLDEN).read()
        assert sum(len(r.variants) for r in results) == 35

    def test_pooled_host_pipeline_matches_golden(self, tmp_path):
        # host_threads > 1 runs prepare/assemble/packing on a thread pool;
        # output must stay byte-identical and region-ordered
        from gatk_hc_tpu.models.caller import call_batched

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native",
            host_threads=4,
        )
        out = tmp_path / "pooled.vcf"
        results = call_batched(SAM, FASTA, str(out), cfg)
        assert out.read_text() == open(GOLDEN).read()
        assert sum(len(r.variants) for r in results) == 35

    def test_python_engines_match_native(self):
        # The pure-Python oracle pipeline and the C++ pipeline must agree
        # byte-for-byte (sampled regions: full python run is slow).
        cfg_native = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        cfg_python = dataclasses.replace(
            DEFAULT_CONFIG,
            pairhmm_engine="python",
            assembler_engine="python",
            sw_engine="python",
        )
        keep = lambda i: i in (0, 2, 3, 11, 30)
        r_native = call(SAM, FASTA, None, cfg_native, region_filter=keep)
        r_python = call(SAM, FASTA, None, cfg_python, region_filter=keep)
        rows_native = [v.to_vcf_row() for r in r_native for v in r.variants]
        rows_python = [v.to_vcf_row() for r in r_python for v in r.variants]
        assert rows_native == rows_python
        assert rows_native  # non-trivial


@needs_fixture
class TestRegionFailureIsolation:
    def test_exploding_region_skipped_not_fatal(self, tmp_path):
        """A pathological window (assembly failure) must skip that region
        with a warning, not abort the run (WGS robustness)."""
        import io as _io

        from gatk_hc_tpu.models.caller import call_batched
        from gatk_hc_tpu.utils.logging import HCLogger, RunCounters

        calls = {"n": 0}

        def flaky_assemble(reads, ref, config):
            from gatk_hc_tpu.models.assembler import PathExplosionError

            calls["n"] += 1
            if calls["n"] == 3:
                raise PathExplosionError("assembly path explosion")
            from gatk_hc_tpu.ops.engines import make_assemble_fn

            return make_assemble_fn(config)(reads, ref, config)

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        stream = _io.StringIO()
        counters = RunCounters()
        out = tmp_path / "flaky.vcf"
        results = call_batched(
            SAM, FASTA, str(out), cfg, assemble_fn=flaky_assemble,
            logger=HCLogger(verbosity=0, stream=stream), counters=counters,
        )
        assert counters.regions_failed == 1
        assert "path explosion" in stream.getvalue()
        # the rest of the contig still called most of its variants
        assert sum(len(r.variants) for r in results) >= 30

    def test_internal_assembly_error_propagates(self, tmp_path):
        """Only path explosion is a routine skip; any other native/internal
        error (e.g. SW failure rc=-4, arena overflow rc=-5) must abort the
        run so bugs surface instead of silently dropping calls."""
        from gatk_hc_tpu.models.caller import call_batched

        def broken_assemble(reads, ref, config):
            raise RuntimeError("hc_assemble_sw failed rc=-4")

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        with pytest.raises(RuntimeError, match="rc=-4"):
            call_batched(
                SAM, FASTA, str(tmp_path / "x.vcf"), cfg,
                assemble_fn=broken_assemble,
            )


class TestDegenerateInputs:
    """WGS-robustness edge cases: empty/header-only/unknown-contig inputs
    must produce an empty (but well-formed) VCF, not crash."""

    def _run(self, tmp_path, sam_text):
        from gatk_hc_tpu.models.caller import call_batched

        sam = tmp_path / "in.sam"
        sam.write_text(sam_text)
        out = tmp_path / "out.vcf"
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        call_batched(str(sam), FASTA, str(out), cfg)
        text = out.read_text()
        assert text.startswith("##fileformat=VCFv4.2\n")
        assert not [l for l in text.splitlines() if not l.startswith("#")]

    def test_empty_sam(self, tmp_path):
        self._run(tmp_path, "")

    def test_header_only_sam(self, tmp_path):
        self._run(tmp_path, "@HD\tVN:1.6\n@SQ\tSN:chrM\tLN:16569\n")

    def test_unknown_contig_reads_only(self, tmp_path):
        self._run(
            tmp_path,
            "r1\t0\tctgZ\t100\t60\t4M\t=\t100\t0\tACGT\tIIII\n",
        )

    def test_streaming_empty_sam(self, tmp_path):
        from gatk_hc_tpu.models.caller import call_batched

        sam = tmp_path / "in.sam"
        sam.write_text("")
        out = tmp_path / "out.vcf"
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", stream_contigs=True
        )
        call_batched(str(sam), FASTA, str(out), cfg)
        assert out.read_text().startswith("##fileformat=VCFv4.2\n")


class TestWedgeFailoverE2E:
    def test_wedged_device_still_produces_golden_vcf(self, tmp_path):
        """A device that never answers must not hang or corrupt a run: the
        walk's submits fail over to the C++ engine and the VCF stays
        byte-identical to the golden."""
        import time as _time

        from gatk_hc_tpu.models.caller import call_batched
        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            pairhmm_engine="pallas", assembler_engine="native",
            device_timeout_s=0.2,
        )
        runner = PallasPairHMMRunner(cfg, interpret=True)
        runner._submit_batch = lambda jobs: _time.sleep(3600)  # wedge
        runner._probe_device_alive = lambda timeout_s=30.0: False
        out = tmp_path / "wedged.vcf"
        results = call_batched(SAM, FASTA, str(out), cfg, runner=runner)
        assert runner._wedged and runner.device_fallbacks >= 1
        assert out.read_text() == open(GOLDEN).read()
        assert sum(len(r.variants) for r in results) == 35


def test_jnp_runner_in_call_batched_matches_native(tmp_path):
    """--pairhmm jax in the batched pipeline runs the pure-jnp kernel (via
    JnpPairHMMRunner), not a silent alias of the Pallas runner; output must
    match the native engine byte-for-byte (region subset: the jnp kernel is
    slow on CPU)."""
    from gatk_hc_tpu.models.caller import call_batched

    flt = lambda i: i < 6
    outs = {}
    for engine in ("native", "jax"):
        cfg = dataclasses.replace(DEFAULT_CONFIG, pairhmm_engine=engine)
        out = tmp_path / f"{engine}.vcf"
        call_batched(SAM, FASTA, str(out), cfg, region_filter=flt)
        outs[engine] = out.read_text()
    assert outs["native"] == outs["jax"]
