"""PairHMM: oracle invariants + Python-vs-C++ differential (bit-exact)."""

import numpy as np
import pytest

from gatk_hc_tpu.ops import pairhmm_oracle as oracle
from gatk_hc_tpu.utils import quality as Q
from tests.conftest import mutate, random_dna


def to_bytes(s):
    return np.frombuffer(s.encode(), dtype=np.uint8)


def make_pair(rng, read_len=30, hap_len=60, n_snp=1):
    hap = random_dna(rng, hap_len)
    start = rng.randint(0, hap_len - read_len)
    read = mutate(rng, hap[start : start + read_len], n_snp=n_snp)[:read_len]
    quals = "".join(chr(rng.randint(33 + 20, 33 + 40)) for _ in range(len(read)))
    return read, quals, hap


class TestOracle:
    def test_perfect_match_likelihood_near_zero(self, rng):
        read, _, hap = make_pair(rng, 25, 50, n_snp=0)
        quals = "I" * len(read)
        lik = oracle.pairhmm_log10_batch(
            [(to_bytes(read), to_bytes(quals))], [to_bytes(hap)]
        )[0, 0]
        # forward prob sums over start positions: ~ 1/haplen for a perfect
        # match, so log10 ~ -log10(50) = -1.70
        assert abs(lik - np.log10(1 / 50)) < 0.05

    def test_mismatches_reduce_likelihood(self, rng):
        read, quals, hap = make_pair(rng, 30, 60, n_snp=0)
        bad_read = mutate(rng, read, n_snp=3)[:30]
        args = lambda r: ([(to_bytes(r), to_bytes(quals))], [to_bytes(hap)])
        good = oracle.pairhmm_log10_batch(*args(read))[0, 0]
        bad = oracle.pairhmm_log10_batch(*args(bad_read))[0, 0]
        assert bad < good

    def test_f32_f64_agree_roughly(self, rng):
        read, quals, hap = make_pair(rng, 20, 40, n_snp=1)
        p32 = oracle.pairhmm_prob(
            to_bytes(read), to_bytes(quals), to_bytes(hap), dtype=np.float32
        )
        p64 = oracle.pairhmm_prob(
            to_bytes(read), to_bytes(quals), to_bytes(hap), dtype=np.float64
        )
        l32 = np.log10(p32) - float(Q.LOG10_INITIAL_CONSTANT_F32)
        l64 = np.log10(p64) - Q.LOG10_INITIAL_CONSTANT_F64
        assert abs(l32 - l64) < 1e-3

    def test_n_matches_everything(self, rng):
        hap = random_dna(rng, 40)
        read = "N" * 20
        quals = "I" * 20
        lik = oracle.pairhmm_log10_batch(
            [(to_bytes(read), to_bytes(quals))], [to_bytes(hap)]
        )[0, 0]
        # every start position "matches": forward mass ~ 21 alignments / 40
        assert np.log10(20 / 40) < lik < 0.0

    def test_normalize_and_filter(self):
        lik = np.array([[-1.0, -10.0], [-50.0, -60.0]])
        filtered, kept = oracle.normalize_and_filter(lik, [100, 100])
        # read 0 kept, alt floored to best-4.5
        assert list(kept) == [0]
        assert filtered[0, 0] == -1.0
        assert filtered[0, 1] == -5.5

    def test_scalar_reference_differs_from_main_path(self, rng):
        # documents the raw-ASCII quirk: the scalar (dead-code) oracle and the
        # Intel main path disagree by construction
        read, quals, hap = make_pair(rng, 20, 40, n_snp=1)
        scalar = oracle.scalar_reference_log10(
            to_bytes(read), to_bytes(quals), 60, to_bytes(hap)
        )
        main = oracle.pairhmm_log10_batch(
            [(to_bytes(read), to_bytes(quals))], [to_bytes(hap)]
        )[0, 0]
        assert np.isfinite(scalar) and np.isfinite(main)
        # same order of magnitude but not equal
        assert abs(scalar - main) > 1e-6


class TestNativePairHMM:
    def _native(self):
        native = pytest.importorskip("gatk_hc_tpu.native")
        if not native.available():
            pytest.skip("native library unavailable")
        return native

    def test_tables_bit_equal(self):
        native = self._native()
        ph32, ph64, mm32, mm64, jac32, jac64 = native.table_probe_native()
        np.testing.assert_array_equal(ph32, Q.PH2PR_F32)
        np.testing.assert_array_equal(ph64, Q.PH2PR_F64)
        np.testing.assert_array_equal(mm32, Q.MATCH_TO_MATCH_F32)
        np.testing.assert_array_equal(mm64, Q.MATCH_TO_MATCH_F64)
        np.testing.assert_array_equal(jac32, Q.JACOBIAN_F32)
        np.testing.assert_array_equal(jac64, Q.JACOBIAN_F64)

    def test_vectorized_batch_matches_oracle_bitexact(self, rng):
        """The pairs-per-lane AVX f32 batch path (exercised for any batch
        of >=8 pairs) must be bitwise identical to the scalar oracle on
        varied-length pairs — every lane-masking edge (short read, short
        hap, N bases) in one batch."""
        native = self._native()
        bases = np.frombuffer(b"ACGTN", dtype=np.uint8)
        nprng = np.random.default_rng(1234)
        nr, nh, stride_r, stride_h = 24, 8, 64, 128
        reads = bases[nprng.integers(0, 5, (nr, stride_r))]
        quals = nprng.integers(33, 74, (nr, stride_r)).astype(np.uint8)
        haps = bases[nprng.integers(0, 4, (nh, stride_h))]
        rlens = nprng.integers(10, stride_r + 1, nr).astype(np.int32)
        hlens = nprng.integers(20, stride_h + 1, nh).astype(np.int32)
        pair_read = np.repeat(np.arange(nr, dtype=np.int32), nh)
        pair_hap = np.tile(np.arange(nh, dtype=np.int32), nr)
        got = native.pairhmm_raw_native(
            reads, quals, rlens, haps, hlens, pair_read, pair_hap,
            ord("I"), ord("+"), np.float32,
        )
        for k in nprng.choice(len(pair_read), 40, replace=False):
            r, h = int(pair_read[k]), int(pair_hap[k])
            want = oracle.pairhmm_prob(
                reads[r, : rlens[r]], quals[r, : rlens[r]],
                haps[h, : hlens[h]], dtype=np.float32,
            )
            assert np.float32(want) == got[k], (k, want, got[k])

    @pytest.mark.parametrize("n_pairs", [1, 7, 8, 9, 16, 17, 23])
    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_sorted_scatter_preserves_pair_order(self, n_pairs, dtype):
        """The batch entries sort pairs by length internally and scatter
        results back — out[k] must always be pair k's value across block
        boundaries (8/16-lane), ties, and duplicate pairs."""
        native = self._native()
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        nprng = np.random.default_rng(n_pairs * 7 + 1)
        nr, nh, sr, sh = 6, 5, 40, 90
        reads = bases[nprng.integers(0, 4, (nr, sr))]
        quals = nprng.integers(33, 74, (nr, sr)).astype(np.uint8)
        haps = bases[nprng.integers(0, 4, (nh, sh))]
        rlens = nprng.integers(8, sr + 1, nr).astype(np.int32)
        hlens = nprng.integers(15, sh + 1, nh).astype(np.int32)
        pair_read = nprng.integers(0, nr, n_pairs).astype(np.int32)
        pair_hap = nprng.integers(0, nh, n_pairs).astype(np.int32)
        got = native.pairhmm_raw_native(
            reads, quals, rlens, haps, hlens, pair_read, pair_hap,
            ord("I"), ord("+"), dtype,
        )
        for k in range(n_pairs):
            one = native.pairhmm_raw_native(
                reads, quals, rlens, haps, hlens,
                pair_read[k : k + 1].copy(), pair_hap[k : k + 1].copy(),
                ord("I"), ord("+"), dtype,
            )[0]
            assert one == got[k], (k, one, got[k])

    @pytest.mark.parametrize("dtype", [np.float32, np.float64])
    def test_matches_oracle_bitexact(self, rng, dtype):
        native = self._native()
        for trial in range(10):
            read, quals, hap = make_pair(
                rng, rng.randint(10, 40), rng.randint(30, 80), rng.randint(0, 3)
            )
            rb, rq, hb = to_bytes(read), to_bytes(quals), to_bytes(hap)
            want = oracle.pairhmm_prob(rb, rq, hb, dtype=dtype)
            read_b = rb[None, :].copy()
            qual_b = rq[None, :].copy()
            hap_b = hb[None, :].copy()
            got = native.pairhmm_raw_native(
                read_b, qual_b, np.array([len(rb)], dtype=np.int32),
                hap_b, np.array([len(hb)], dtype=np.int32),
                np.zeros(1, dtype=np.int32), np.zeros(1, dtype=np.int32),
                ord("I"), ord("+"), dtype,
            )[0]
            assert dtype(want) == got, f"trial {trial}: {want} != {got}"


class TestScalarFallbackPath:
    def test_scalar_env_still_golden(self, tmp_path):
        """HC_PAIRHMM_SCALAR=1 (the debugging/A-B escape hatch) must keep
        the full pipeline byte-identical — the env is read once per
        process, so this runs the CLI in a subprocess."""
        import os
        import subprocess
        import sys

        native = pytest.importorskip("gatk_hc_tpu.native")
        if not native.available():
            pytest.skip("native library unavailable")
        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "fixtures"
        )
        out = tmp_path / "scalar.vcf"
        env = dict(
            os.environ, HC_PAIRHMM_SCALAR="1", JAX_PLATFORMS="cpu",
            PYTHONPATH=os.path.dirname(os.path.dirname(__file__)),
        )
        r = subprocess.run(
            [sys.executable, "-m", "gatk_hc_tpu.cli",
             "-I", os.path.join(fixtures, "chrM.sam"),
             "-R", os.path.join(fixtures, "chrM.fa"),
             "-O", str(out), "--pairhmm", "native"],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr[-500:]
        golden = open(os.path.join(fixtures, "chrM.golden.vcf")).read()
        assert out.read_text() == golden
