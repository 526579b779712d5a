"""Pallas kernel + batched runner tests (CPU: interpret mode, tiny shapes).

The real-TPU validation (full chrM, golden VCF byte-equality, measured
bit-exactness vs the FTZ oracle) runs via tools/tpu_probe.py and bench.py on
hardware; these tests keep the kernel and runner logic honest on CPU.
"""

import dataclasses

import numpy as np
import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.ops import pairhmm_oracle as oracle
from gatk_hc_tpu.ops.runner import PairHMMJob, PallasPairHMMRunner
from tests.test_pairhmm import make_pair, to_bytes

TINY_CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    read_pad_buckets=(32,),
    hap_pad_buckets=(128,),
    stripe_height=8,
    pair_batch=128,
)


def tiny_runner(pair_budget=256):
    runner = PallasPairHMMRunner(TINY_CFG, pair_budget=pair_budget, interpret=True)
    runner.READ_BUCKETS = (8, 16)
    runner.HAP_BUCKETS = (8, 16)
    return runner


def make_job(rng, n_reads, n_haps):
    reads, haps = [], []
    for _ in range(n_reads):
        read, quals, _ = make_pair(rng, rng.randint(10, 30), 60, 1)
        reads.append((to_bytes(read), to_bytes(quals)))
    for _ in range(n_haps):
        _, _, hap = make_pair(rng, 10, rng.randint(40, 100), 0)
        haps.append(to_bytes(hap))
    return PairHMMJob(reads, haps)


class TestRunner:
    def test_single_job_bitexact(self, rng):
        job = make_job(rng, 3, 2)
        tiny_runner().run([job])
        assert job.result.shape == (3, 2)
        for i in range(3):
            for j in range(2):
                b, q = job.reads[i]
                want32 = np.float32(oracle.pairhmm_prob(b, q, job.haps[j], ftz=True))
                if want32 >= np.float32(1e-28):
                    from gatk_hc_tpu.utils.quality import LOG10_INITIAL_CONSTANT_F32

                    want = np.float64(
                        np.log10(want32, dtype=np.float32)
                        - LOG10_INITIAL_CONSTANT_F32
                    )
                    assert job.result[i, j] == want

    def test_multi_job_grouping(self, rng):
        jobs = [make_job(rng, 2, 2), make_job(rng, 3, 1), make_job(rng, 1, 4)]
        runner = tiny_runner()
        runner.run(jobs)
        # compare each against a solo run
        for job in jobs:
            solo = PairHMMJob(job.reads, job.haps)
            tiny_runner().run([solo])
            np.testing.assert_array_equal(job.result, solo.result)

    def test_group_planning_budgets(self, rng):
        runner = tiny_runner()
        runner.pair_budget = 8  # logic-only test, below the lane minimum
        jobs = [make_job(rng, 2, 2) for _ in range(4)]  # 4 pairs each
        groups = runner._plan_groups(jobs)
        assert all(
            sum(len(jobs[g].reads) * len(jobs[g].haps) for g in grp) <= 8
            for grp in groups
        )
        assert sorted(g for grp in groups for g in grp) == [0, 1, 2, 3]

    def test_oversized_job_multiple_dispatches(self, rng):
        runner = tiny_runner(pair_budget=128)
        runner.READ_BUCKETS = (16,)
        runner.HAP_BUCKETS = (16,)
        job = make_job(rng, 12, 11)  # 132 pairs > budget 128 -> 2 dispatches
        runner.run([job])
        assert job.result.shape == (12, 11)
        assert np.isfinite(job.result).all()
        # spot-check the tail pairs (second dispatch) against the oracle
        from gatk_hc_tpu.utils.quality import LOG10_INITIAL_CONSTANT_F32

        b, q = job.reads[11]
        want32 = np.float32(oracle.pairhmm_prob(b, q, job.haps[10], ftz=True))
        if want32 >= np.float32(1e-28):
            want = np.float64(
                np.log10(want32, dtype=np.float32) - LOG10_INITIAL_CONSTANT_F32
            )
            assert job.result[11, 10] == want

    def test_empty_job(self):
        job = PairHMMJob([], [])
        tiny_runner().run([job])
        assert job.result.shape == (0, 0)


class TestPairPerElementKernel:
    """ppe vs striped: bitwise-identical on real TPUs (verified on hardware
    plus the golden chrM run); in interpret mode XLA:CPU contracts FMAs
    differently per program, so this CPU test allows 1-ulp drift."""

    def test_ppe_equals_striped_bitwise(self, nprng):
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
        from gatk_hc_tpu.ops.pairhmm_pallas import _pallas_forward
        from gatk_hc_tpu.utils.quality import PH2PR_F32

        B, R, C = 1024, 16, 64
        rc = nprng.integers(0, 5, (B, R)).astype(np.int32)  # incl N=4
        q = nprng.integers(1, 40, (B, R))
        omq = (1.0 - PH2PR_F32[q + 33]).astype(np.float32)
        q3 = (PH2PR_F32[q + 33] / np.float32(3.0)).astype(np.float32)
        rl = nprng.integers(5, R + 1, B).astype(np.int32)
        hc = nprng.integers(0, 5, (B, C)).astype(np.int32)
        hl = nprng.integers(20, C + 1, B).astype(np.int32)
        iy = (np.float32(2.0**120) / hl.astype(np.float32)).astype(np.float32)
        trans = transition_constants(ord("I"), ord("+"))
        args = tuple(
            jnp.asarray(a) for a in (rc, omq, q3, rl, hc, hl, iy)
        )
        striped = np.asarray(
            _pallas_forward(*args, trans, R, C, 8, True, algo="striped")
        )
        ppe = np.asarray(
            _pallas_forward(*args, trans, R, C, 8, True, algo="ppe")
        )
        np.testing.assert_allclose(ppe, striped, rtol=2.4e-7)  # <= 2 ulp
        # the overwhelming majority must still be bit-identical even on CPU
        assert (ppe == striped).mean() > 0.98


class TestJobValidation:
    def test_rejects_zero_length_rows(self):
        import numpy as np
        import pytest as _pytest

        q = np.full(5, 60, np.uint8)
        b = np.full(5, 65, np.uint8)
        with _pytest.raises(ValueError):
            PairHMMJob([(np.zeros(0, np.uint8), np.zeros(0, np.uint8))], [b])
        with _pytest.raises(ValueError):
            PairHMMJob([(b, q)], [np.zeros(0, np.uint8)])
        PairHMMJob([(b, q)], [b])  # non-empty rows are fine
