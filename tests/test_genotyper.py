"""Genotyper unit tests: event extraction, allele resolution, GT/GQ."""

import math

import numpy as np
import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.sam import SAMRecord
from gatk_hc_tpu.models.genotyper import (
    _calculate_genotype_likelihoods,
    _genotype_alleles,
    _get_compatible_alleles,
    _gq_and_max_index,
    _replace_span_dels,
    assign_genotype_likelihoods,
    process_cigar_for_initial_events,
)
from gatk_hc_tpu.models.haplotype import Haplotype, Variant
from gatk_hc_tpu.utils.cigar import parse_cigar
from gatk_hc_tpu.utils.interval import Interval


def make_read(pos, seq, qual=None, rname="chrM"):
    return SAMRecord(
        qname="r", flag=99, rname=rname, pos=pos, mapq=60,
        cigar=parse_cigar(f"{len(seq)}M"), rnext="=", pnext=pos, tlen=len(seq),
        seq=seq, qual=qual or ("I" * len(seq)),
    )


class TestEventExtraction:
    REF = "AAACCCGGGTTTAAACCCGGG"
    REGION = Interval("chrM", 100, 100 + len(REF))

    def test_snp(self):
        hap = Haplotype(self.REF[:9] + "A" + self.REF[10:])
        hap.cigar = parse_cigar(f"{len(self.REF)}M")
        process_cigar_for_initial_events(hap, self.REF, self.REGION)
        assert list(hap.event_map) == [109]
        event = hap.event_map[109]
        assert (event.ref, event.alt) == ("T", "A")
        assert event.location == Interval("chrM", 109, 110)

    def test_insertion_left_anchored(self):
        hap = self.REF[:10] + "GGG" + self.REF[10:]
        h = Haplotype(hap)
        h.cigar = parse_cigar("10M3I11M")
        process_cigar_for_initial_events(h, self.REF, self.REGION)
        event = h.event_map[109]
        assert (event.ref, event.alt) == ("T", "TGGG")
        assert event.location == Interval("chrM", 109, 110)

    def test_deletion_left_anchored(self):
        h = Haplotype(self.REF[:10] + self.REF[13:])
        h.cigar = parse_cigar("10M3D8M")
        process_cigar_for_initial_events(h, self.REF, self.REGION)
        event = h.event_map[109]
        assert (event.ref, event.alt) == ("TTTA", "T")
        assert event.location == Interval("chrM", 109, 113)

    def test_softclip_consumes_hap_only(self):
        h = Haplotype("NNN" + self.REF)
        h.cigar = parse_cigar(f"3S{len(self.REF)}M")
        process_cigar_for_initial_events(h, self.REF, self.REGION)
        assert h.event_map == {}

    def test_insertion_at_ref_pos_zero_skipped(self):
        # ref_pos == 0 -> no left anchor -> event dropped (genotyper.hpp:75)
        h = Haplotype("GG" + self.REF)
        h.cigar = parse_cigar(f"2I{len(self.REF)}M")
        process_cigar_for_initial_events(h, self.REF, self.REGION)
        assert h.event_map == {}


class TestAlleleResolution:
    def test_span_del_replacement(self):
        events = [
            Variant(Interval("chrM", 100, 104), ref="ACGT", alt="A"),
            Variant(Interval("chrM", 102, 103), ref="G", alt="C"),
        ]
        replaced = _replace_span_dels(events, "G", 102, "chrM")
        assert replaced[0].alt == "*"
        assert replaced[0].ref == "G"
        assert replaced[1].alt == "C"

    def test_compatible_alleles_mixed_snp_del(self):
        # at the same begin: a deletion (REF=TTTA) and a SNP (REF=T)
        events = sorted(
            [
                Variant(Interval("chrM", 109, 113), ref="TTTA", alt="T"),
                Variant(Interval("chrM", 109, 110), ref="T", alt="A"),
            ],
            key=lambda v: v.sort_key(),
        )
        alleles, loc = _get_compatible_alleles(events)
        # longest REF wins; SNP's ALT extends with the ref tail
        assert alleles[0] == "TTTA"
        assert set(alleles[1:]) == {"T", "ATTA"}
        assert loc == Interval("chrM", 109, 113)


class TestGenotypeLikelihoods:
    def test_diploid_indexing(self):
        assert _genotype_alleles(2, 0) == (0, 0)
        assert _genotype_alleles(2, 1) == (0, 1)
        assert _genotype_alleles(2, 2) == (1, 1)
        assert _genotype_alleles(3, 4) == (1, 2)

    def test_hom_het_composition(self):
        # two reads, allele 0 lik -1, allele 1 lik -2
        lik = np.array([[-1.0, -2.0], [-1.0, -2.0]])
        gls = _calculate_genotype_likelihoods(lik, 2)
        # hom0: sum(-1 + log2) - 2log2 = -2 - log2... compute directly
        log2 = math.log10(2)
        assert gls[0] == pytest.approx(2 * (-1 + log2) - 2 * log2)
        assert gls[2] == pytest.approx(2 * (-2 + log2) - 2 * log2)
        # het: approximate_log10_sum_log10(-1, -2) each
        from gatk_hc_tpu.utils.quality import approximate_log10_sum_log10

        want = 2 * approximate_log10_sum_log10(-1.0, -2.0) - 2 * log2
        assert gls[1] == pytest.approx(want)

    def test_gq_rounding_half_away_from_zero(self):
        # gap of 0.05 -> -10*(second-best) = 0.5 -> GQ 1 (std::round), not 0
        index, gq = _gq_and_max_index([-1.05, -1.0], 99)
        assert index == 1
        assert gq == 1

    def test_gq_cap(self):
        index, gq = _gq_and_max_index([-50.0, -1.0], 99)
        assert gq == 99

    def test_later_tie_wins_max(self):
        # genotyper.hpp:348: >= lets later equal values take the max slot
        index, gq = _gq_and_max_index([-1.0, -1.0, -1.0], 99)
        assert index == 2
        assert gq == 0


class TestEndToEndGenotyping:
    def test_het_snp_call(self):
        ref = ("ACGTACGGTACCGATTACAG" * 6)[:100]
        pos = 50
        alt = ref[:pos] + ("A" if ref[pos] != "A" else "C") + ref[pos + 1 :]
        padded = Interval("chrM", 0, 100)
        origin = Interval("chrM", 0, 100)
        h_ref = Haplotype(ref)
        h_ref.cigar = parse_cigar("100M")
        h_alt = Haplotype(alt)
        h_alt.cigar = parse_cigar("100M")
        haps = [h_ref, h_alt]
        reads = [make_read(1, ref[:80]), make_read(11, alt[10:90]),
                 make_read(21, ref[20:100]), make_read(1, alt[:80])]
        # likelihood matrix: reads match their origin hap strongly
        lik = np.array(
            [[-1.0, -9.0], [-9.0, -1.0], [-1.0, -9.0], [-9.0, -1.0]]
        )
        variants = assign_genotype_likelihoods(
            reads, haps, lik, ref, padded, origin, DEFAULT_CONFIG
        )
        assert len(variants) == 1
        v = variants[0]
        assert v.location.begin == pos
        assert v.gt == (0, 1)
        assert v.alleles[0] == ref[pos]
        assert v.alleles[1] == alt[pos]


class TestDeviceGenotyper:
    """ops/genotyper_jax.py vs the host (NumPy, f64) genotyper reductions:
    on CPU jax (f64) the device tile must match bit-for-bit."""

    def test_matches_host_reductions(self):
        import numpy as np

        from gatk_hc_tpu.models.genotyper import (
            _calculate_genotype_likelihoods,
            _gq_and_max_index,
            _marginalize,
        )
        from gatk_hc_tpu.ops.genotyper_jax import (
            MAX_ALLELES,
            genotype_pair_tables,
            genotype_sites_host,
        )

        rng = np.random.default_rng(42)
        S, R, H = 6, 24, 10
        lik = (rng.random((S, R, H)) * -40.0).astype(np.float64)
        # make ties plausible: clone some columns
        lik[:, :, 3] = lik[:, :, 1]
        allele_count = rng.integers(2, MAX_ALLELES + 1, S).astype(np.int32)
        hap_to_allele = np.stack(
            [rng.integers(0, a, H) for a in allele_count]
        ).astype(np.int32)
        read_keep = rng.random((S, R)) < 0.8
        read_keep[:, 0] = True  # at least one read per site
        hap_valid = np.ones((S, H), dtype=bool)
        hap_valid[:, -2:] = rng.random((S, 2)) < 0.5
        # invalid haps must not map anywhere meaningful on the host side:
        # the host path simply doesn't include them in the mapper list
        gl_dev, best_dev, gq_dev = genotype_sites_host(
            lik, hap_to_allele, read_keep, hap_valid, allele_count
        )
        gl_dev = np.asarray(gl_dev)
        a1, a2 = genotype_pair_tables()
        for s in range(S):
            a_count = int(allele_count[s])
            valid = np.nonzero(hap_valid[s])[0]
            mapper = [int(hap_to_allele[s, h]) for h in valid]
            allele_lik = _marginalize(
                mapper, a_count, read_keep[s], lik[s][:, valid]
            )
            gl_host = np.asarray(
                _calculate_genotype_likelihoods(allele_lik, a_count)
            )
            best_host, gq_host = _gq_and_max_index(list(gl_host), 99)
            # map host genotype order (a1<=a2 within a_count) to tile slots
            slot_of = {
                (int(x), int(y)): g
                for g, (x, y) in enumerate(zip(a1, a2))
            }
            host_slots = [
                slot_of[(x, y)]
                for x in range(a_count)
                for y in range(x, a_count)
            ]
            np.testing.assert_array_equal(gl_dev[s, host_slots], gl_host)
            assert int(best_dev[s]) == host_slots[best_host]
            assert int(gq_dev[s]) == gq_host


class TestJaxGenotyperEngine:
    """cfg.genotyper_engine='jax': the production wiring of
    ops/genotyper_jax.py (exact f64 on CPU backends)."""

    def test_e2e_golden_chrm(self, tmp_path):
        import dataclasses
        import pathlib

        from gatk_hc_tpu.models.caller import call_batched

        fixtures = pathlib.Path(__file__).parent.parent / "fixtures"
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", genotyper_engine="jax"
        )
        out = tmp_path / "gjax.vcf"
        call_batched(
            str(fixtures / "chrM.sam"), str(fixtures / "chrM.fa"),
            str(out), cfg,
        )
        assert out.read_text() == (fixtures / "chrM.golden.vcf").read_text()

    def test_region_parity_with_host_engine(self):
        """Every region's variant list matches the host engine exactly
        (locations, alleles, GT, GQ)."""
        import dataclasses
        import pathlib

        from gatk_hc_tpu.models.caller import call_batched

        fixtures = pathlib.Path(__file__).parent.parent / "fixtures"
        sam = str(fixtures / "chrM.sam")
        fa = str(fixtures / "chrM.fa")
        base = dataclasses.replace(DEFAULT_CONFIG, pairhmm_engine="native")
        host = call_batched(sam, fa, None, base)
        dev = call_batched(
            sam, fa, None,
            dataclasses.replace(base, genotyper_engine="jax"),
        )
        assert len(host) == len(dev)
        for rh, rd in zip(host, dev):
            assert [v.to_vcf_row() for v in rh.variants] == [
                v.to_vcf_row() for v in rd.variants
            ]


class TestBatchedNumpyGenotyper:
    """models/genotyper.py::_genotype_sites_numpy — the production host
    engine's cross-region batched reduction — vs the per-site oracle."""

    def test_matches_per_site_reductions(self):
        import numpy as np

        from gatk_hc_tpu.models.genotyper import (
            _calculate_genotype_likelihoods,
            _genotype_sites_numpy,
            _gq_and_max_index,
            _marginalize,
            _triu_pairs,
        )

        rng = np.random.default_rng(7)
        for ac in (2, 3, 5, 8):
            S, R, H = 5, 20, 12
            lik = (rng.random((S, R, H)) * -40.0).astype(np.float64)
            lik[:, :, 4] = lik[:, :, 2]  # plausible ties
            h2a = rng.integers(0, ac, (S, H)).astype(np.int32)
            keep = rng.random((S, R)) < 0.8
            hv = np.ones((S, H), dtype=bool)
            hv[:, -3:] = rng.random((S, 3)) < 0.5
            best_b, gq_b = _genotype_sites_numpy(lik, h2a, keep, hv, ac, 99)
            a1, a2 = _triu_pairs(ac)
            for s in range(S):
                valid = np.nonzero(hv[s])[0]
                mapper = [int(h2a[s, h]) for h in valid]
                allele_lik = _marginalize(
                    mapper, ac, keep[s], lik[s][:, valid]
                )
                gl = np.asarray(
                    _calculate_genotype_likelihoods(allele_lik, ac)
                )
                best_host, gq_host = _gq_and_max_index(list(gl), 99)
                assert int(best_b[s]) == best_host, (ac, s)
                assert int(gq_b[s]) == gq_host, (ac, s)

    def test_no_kept_reads_site(self):
        """keep all-False must reproduce the per-site zero-GL behavior
        (last genotype slot wins, GQ 0)."""
        import numpy as np

        from gatk_hc_tpu.models.genotyper import _genotype_sites_numpy

        lik = np.zeros((1, 4, 3))
        h2a = np.zeros((1, 3), np.int32)
        h2a[0, 1] = 1
        keep = np.zeros((1, 4), bool)
        hv = np.ones((1, 3), bool)
        best, gq = _genotype_sites_numpy(lik, h2a, keep, hv, 2, 99)
        assert int(best[0]) == 2 and int(gq[0]) == 0


class TestF32StabilityGuard:
    """--genotyper jax on f32 backends (TPU numerics): the stability guard
    must make the output host-identical by routing every unprovable GT/GQ
    decision to the exact host f64 path (VERDICT r3 weak #4)."""

    def _region(self, lik):
        ref = ("ACGT" * 25)
        pos = 50
        alt = ref[:pos] + ("G" if ref[pos] != "G" else "C") + ref[pos + 1:]
        origin = Interval("chrM", 0, 100)
        h_ref = Haplotype(ref)
        h_ref.cigar = parse_cigar("100M")
        h_alt = Haplotype(alt)
        h_alt.cigar = parse_cigar("100M")
        reads = [make_read(1, ref[:80]) for _ in range(lik.shape[0])]
        return (reads, [h_ref, h_alt], lik, ref, origin, origin)

    def test_exact_tie_is_flagged_and_host_identical(self):
        from gatk_hc_tpu.models.genotyper import genotype_regions_jax
        from gatk_hc_tpu.utils.logging import RunCounters

        # degenerate matrix: with every read scoring both alleles -1.0,
        # all three genotype totals are (near-)EXACTLY equal in f64 —
        # hom = -1 + log10(2) per read, het = -1 + jacobian[0] per read,
        # and jacobian[0] IS log10(2) — so the f32 argmax cannot be proven
        # stable.  The guard must flag the site and the host recompute
        # must make the emitted variant identical to the host engine's
        # (later-ties-win selects 1/1).
        lik = np.full((12, 2), -1.0, dtype=np.float64)
        region = self._region(lik)
        host = assign_genotype_likelihoods(*region, DEFAULT_CONFIG)
        counters = RunCounters()
        import dataclasses

        cfg = dataclasses.replace(DEFAULT_CONFIG, genotyper_engine="jax")
        dev = genotype_regions_jax(
            [region], cfg, use_f64=False, counters=counters
        )[0]
        assert counters.gq_host_verified >= 1
        assert [v.to_vcf_row() for v in dev] == [
            v.to_vcf_row() for v in host
        ]

    def test_random_regions_host_identical(self):
        """Random likelihood matrices, f32 device path vs exact host: every
        emitted variant row identical (the guard absorbs all f32 drift)."""
        from gatk_hc_tpu.models.genotyper import genotype_regions_jax
        from gatk_hc_tpu.utils.logging import RunCounters

        import dataclasses

        cfg = dataclasses.replace(DEFAULT_CONFIG, genotyper_engine="jax")
        rng = np.random.default_rng(20260819)
        counters = RunCounters()
        for _ in range(8):
            n = int(rng.integers(4, 40))
            lik = (rng.random((n, 2)) * -12.0).round(3)
            region = self._region(lik)
            host = assign_genotype_likelihoods(*region, DEFAULT_CONFIG)
            dev = genotype_regions_jax(
                [region], cfg, use_f64=False, counters=counters
            )[0]
            assert [v.to_vcf_row() for v in dev] == [
                v.to_vcf_row() for v in host
            ]

    def test_chrm_golden_with_f32_device_genotyper(self, tmp_path, monkeypatch):
        """Full chrM pipeline with the genotyper forced onto the f32 (TPU
        numerics) device path: byte-identical golden VCF."""
        import dataclasses
        import pathlib

        import gatk_hc_tpu.models.genotyper as gt
        from gatk_hc_tpu.models.caller import call_batched

        orig = gt.genotype_regions_jax

        def f32_regions(region_inputs, cfg, use_f64=None, counters=None):
            return orig(region_inputs, cfg, use_f64=False, counters=counters)

        monkeypatch.setattr(gt, "genotype_regions_jax", f32_regions)
        fixtures = pathlib.Path(__file__).parent.parent / "fixtures"
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", genotyper_engine="jax"
        )
        out = tmp_path / "gjax32.vcf"
        call_batched(
            str(fixtures / "chrM.sam"), str(fixtures / "chrM.fa"),
            str(out), cfg,
        )
        assert out.read_text() == (fixtures / "chrM.golden.vcf").read_text()
