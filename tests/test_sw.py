"""Smith-Waterman: per-cell brute-force oracle vs vectorized Python vs C++."""

import numpy as np
import pytest

from gatk_hc_tpu.config import NEW_SW_PARAMETERS, SWParameters
from gatk_hc_tpu.ops.sw import (
    DELETE,
    DELETE_EXT,
    INSERT,
    INSERT_EXT,
    LOW_INIT_VALUE,
    MATCH,
    MATRIX_MIN_CUTOFF,
    _select_start_cell,
    _walk_cigar,
    sw_align,
)
from gatk_hc_tpu.utils.cigar import cigar_to_string, read_length
from tests.conftest import mutate, random_dna


def brute_force_matrices(ref, alt, params):
    """Direct per-cell port of the recurrences — the independent oracle."""
    n, m = len(ref), len(alt)
    H = np.zeros((n + 1, m + 1), dtype=np.int64)
    E = np.full((n + 1, m + 1), LOW_INIT_VALUE, dtype=np.int64)
    F = np.full((n + 1, m + 1), LOW_INIT_VALUE, dtype=np.int64)
    bt = np.zeros((n + 1, m + 1), dtype=np.uint8)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            e_open = H[i, j - 1] + params.w_open
            e_ext = E[i, j - 1] + params.w_extend
            E[i, j] = max(e_open, e_ext)
            f_open = H[i - 1, j] + params.w_open
            f_ext = F[i - 1, j] + params.w_extend
            F[i, j] = max(f_open, f_ext)
            sub = params.w_match if ref[i - 1] == alt[j - 1] else params.w_mismatch
            m11 = H[i - 1, j - 1] + sub
            h11 = max(MATRIX_MIN_CUTOFF, m11)
            code = MATCH
            if E[i, j] > h11:
                code = INSERT
                h11 = E[i, j]
            if F[i, j] > h11:
                code = DELETE
                h11 = F[i, j]
            if not (e_open > e_ext):
                code |= INSERT_EXT
            if not (f_open > f_ext):
                code |= DELETE_EXT
            H[i, j] = h11
            bt[i, j] = code
    return H, bt


def brute_force_align(ref, alt, params):
    H, bt = brute_force_matrices(ref, alt, params)
    max_i, max_j = _select_start_cell(H, len(ref), len(alt))
    return _walk_cigar(bt, max_i, max_j, len(ref), len(alt))


PARAM_SETS = [
    NEW_SW_PARAMETERS,
    SWParameters(3, -1, -4, -3),
    SWParameters(25, -50, -110, -6),
    SWParameters(10, -15, -30, -5),
]


class TestPythonSW:
    def test_all_match_fast_path(self):
        ref = "ACGTACGTAA"
        assert sw_align(ref, ref) == (0, ((10, "M"),))
        alt = "ACGTACGTAT"  # 1 mismatch -> still all-match
        assert sw_align(ref, alt) == (0, ((10, "M"),))

    def test_simple_insertion(self):
        ref = random_dna(__import__("random").Random(7), 60)
        alt = ref[:30] + "GGG" + ref[30:]
        offset, cigar = sw_align(ref, alt)
        assert offset == 0
        assert cigar_to_string(cigar) == "30M3I30M"
        assert read_length(cigar) == len(alt)

    def test_simple_deletion(self):
        import random

        ref = random_dna(random.Random(8), 60)
        alt = ref[:30] + ref[33:]
        offset, cigar = sw_align(ref, alt)
        assert cigar_to_string(cigar) == "30M3D27M"

    def test_offset_subsequence(self):
        import random

        ref = random_dna(random.Random(9), 100)
        alt = ref[20:80] + "TTTTT"  # trailing junk -> soft clip or M overhang
        offset, cigar = sw_align(ref, alt)
        assert offset == 20
        assert read_length(cigar) == len(alt)

    @pytest.mark.parametrize("params", PARAM_SETS)
    def test_matches_brute_force(self, rng, params):
        for trial in range(30):
            ref = random_dna(rng, rng.randint(20, 120))
            alt = mutate(rng, ref, n_snp=rng.randint(0, 4),
                         n_ins=rng.randint(0, 2), n_del=rng.randint(0, 2))
            if len(ref) == len(alt):
                alt = alt[:-1] + ("A" if alt[-1] != "A" else "C")  # avoid fast path ambiguity
            got = sw_align(ref, alt, params)
            want = brute_force_align(ref, alt, params)
            assert got == want, f"trial {trial}: {got} != {want}"
            assert read_length(got[1]) == len(alt)


class TestNativeSW:
    def test_matches_python(self, rng):
        native = pytest.importorskip("gatk_hc_tpu.native")
        if not native.available():
            pytest.skip("native library unavailable")
        for trial in range(40):
            ref = random_dna(rng, rng.randint(20, 150))
            alt = mutate(rng, ref, n_snp=rng.randint(0, 5),
                         n_ins=rng.randint(0, 2), n_del=rng.randint(0, 2))
            got = native.sw_align_native(ref, alt, NEW_SW_PARAMETERS)
            want = sw_align(ref, alt, NEW_SW_PARAMETERS)
            assert got == want, f"trial {trial}"
