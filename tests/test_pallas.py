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


class TestPlanesPath:
    """Host-prepared plane buffers vs the device one-gather prep: identical
    i32 planes, and the planes dispatch agrees with the striped kernel."""

    def test_host_planes_equal_device_prep(self):
        import numpy as np
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_pallas import (
            ppe_element_table,
            plane_tables,
            prepare_tables_ppe,
            _unpack_planes,
        )
        from gatk_hc_tpu.utils.quality import BASE_TABLE, PH2PR_F32

        nr_pad, nh_pad, r_pad, c_pad = 8, 4, 16, 64
        nrr = nr_pad * r_pad
        rng2 = np.random.default_rng(5)
        read_u8 = rng2.integers(0, 255, nrr).astype(np.uint8)
        qual_u8 = rng2.integers(33, 127, nrr).astype(np.uint8)
        hap_u8 = rng2.integers(0, 255, nh_pad * c_pad).astype(np.uint8)
        read_lens = rng2.integers(1, r_pad, nr_pad).astype(np.int32)
        hap_lens = rng2.integers(1, c_pad, nh_pad).astype(np.int32)
        iy = rng2.random(nh_pad).astype(np.float32)

        # device prep from the PRODUCTION packed layout (each byte shipped
        # once — the old duplicated-quals layout here was exactly how the
        # packed-path crash survived round 3 untested)
        u8buf = np.concatenate([read_u8, qual_u8, hap_u8])
        i32buf = np.concatenate([read_lens, hap_lens, iy.view(np.int32)])
        tab = jnp.asarray(ppe_element_table(BASE_TABLE, PH2PR_F32))
        ru_d, hu_d, rl_d, hl_d, iy_d = prepare_tables_ppe(
            jnp.asarray(u8buf), jnp.asarray(i32buf), tab,
            nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
        )

        # host-built plane buffer (what the runner ships)
        mask_t, omq_t, q3_t = plane_tables(BASE_TABLE, PH2PR_F32)
        buf = np.concatenate([
            read_lens, hap_lens, iy.view(np.int32),
            mask_t[read_u8], omq_t[qual_u8], q3_t[qual_u8], mask_t[hap_u8],
        ]).astype(np.int32)
        ru_h, hu_h, rl_h, hl_h, iy_h = _unpack_planes(
            jnp.asarray(buf), nr_pad, nh_pad, r_pad, c_pad
        )
        np.testing.assert_array_equal(np.asarray(ru_d), np.asarray(ru_h))
        np.testing.assert_array_equal(np.asarray(hu_d), np.asarray(hu_h))
        np.testing.assert_array_equal(np.asarray(rl_d), np.asarray(rl_h))
        np.testing.assert_array_equal(np.asarray(hl_d), np.asarray(hl_h))
        np.testing.assert_array_equal(np.asarray(iy_d), np.asarray(iy_h))

    def test_planes_dispatch_matches_striped(self):
        import numpy as np
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
        from gatk_hc_tpu.ops.pairhmm_pallas import (
            _pallas_forward, pairhmm_pallas_planes, plane_tables,
        )
        from gatk_hc_tpu.utils.quality import BASE_TABLE, PH2PR_F32

        trans = transition_constants(ord("I"), ord("+"))
        nr_pad, nh_pad, r_pad, c_pad, B = 16, 8, 32, 128, 1024
        rng2 = np.random.default_rng(6)
        bases = np.frombuffer(b"ACGTN", np.uint8)
        read_u8 = bases[rng2.integers(0, 5, nr_pad * r_pad)]
        qual_u8 = rng2.integers(53, 73, nr_pad * r_pad).astype(np.uint8)
        hap_u8 = bases[rng2.integers(0, 5, nh_pad * c_pad)]
        read_lens = np.full(nr_pad, r_pad - 3, np.int32)
        hap_lens = np.full(nh_pad, c_pad - 5, np.int32)
        iy = (np.float32(2.0**120) / hap_lens.astype(np.float32)).astype(
            np.float32
        )
        mask_t, omq_t, q3_t = plane_tables(BASE_TABLE, PH2PR_F32)
        buf = np.concatenate([
            read_lens, hap_lens, iy.view(np.int32),
            mask_t[read_u8], omq_t[qual_u8], q3_t[qual_u8], mask_t[hap_u8],
        ]).astype(np.int32)
        pairs = np.stack([
            (np.arange(B) % nr_pad).astype(np.int32),
            (np.arange(B) % nh_pad).astype(np.int32),
        ])
        got = np.asarray(
            pairhmm_pallas_planes(
                jnp.asarray(buf), jnp.asarray(pairs), trans,
                nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
                ppe_rows=2, interpret=True,
            )
        )
        # striped reference on the expanded pairs
        from gatk_hc_tpu.utils.quality import BASE_TABLE as BT

        codes = BT[read_u8].astype(np.int32).reshape(nr_pad, r_pad)
        omqv = (np.float32(1.0) - PH2PR_F32)[qual_u8 & 127].reshape(
            nr_pad, r_pad
        )
        q3v = (PH2PR_F32 / np.float32(3.0))[qual_u8 & 127].reshape(
            nr_pad, r_pad
        )
        hcodes = BT[hap_u8].astype(np.int32).reshape(nh_pad, c_pad)
        pr, ph = pairs[0], pairs[1]
        want = np.asarray(
            _pallas_forward(
                jnp.asarray(codes[pr]), jnp.asarray(omqv[pr]),
                jnp.asarray(q3v[pr]), jnp.asarray(read_lens[pr]),
                jnp.asarray(hcodes[ph]), jnp.asarray(hap_lens[ph]),
                jnp.asarray(iy[ph]), trans, r_pad, c_pad, 8, True,
                algo="striped",
            )
        )
        # interpret-mode FMA contraction differs per program: 1-2 ulp
        np.testing.assert_allclose(got, want, rtol=3e-7)


class TestPpe4Kernel:
    def test_ppe4_close_to_ppe2_interpret(self, nprng=None):
        """ppe_rows=4 vs 2 in interpret mode: XLA:CPU FMA contraction makes
        distinct programs drift ~1 ulp (same caveat as ppe-vs-striped); on
        real TPU hardware ppe4 was verified bitwise-identical at production
        shapes.  This guards the 4-row register hand-off logic on CPU."""
        import numpy as np
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
        from gatk_hc_tpu.ops.pairhmm_pallas import _pallas_forward

        trans = transition_constants(ord("I"), ord("+"))
        B, R, C = 1024, 32, 128
        rng2 = np.random.default_rng(11)
        rc = jnp.asarray(rng2.integers(0, 5, (B, R)).astype(np.int32))
        q = np.float32(3e-3)
        omq = jnp.asarray(np.full((B, R), 1.0 - q, np.float32))
        q3 = jnp.asarray(np.full((B, R), q / 3.0, np.float32))
        rl = jnp.asarray(rng2.integers(10, R + 1, B).astype(np.int32))
        hc = jnp.asarray(rng2.integers(0, 5, (B, C)).astype(np.int32))
        hl = jnp.asarray(rng2.integers(40, C + 1, B).astype(np.int32))
        iy = jnp.asarray(
            (np.float32(2.0**120) / np.asarray(hl, np.float32)).astype(
                np.float32
            )
        )
        outs = {
            rows: np.asarray(
                _pallas_forward(
                    rc, omq, q3, rl, hc, hl, iy, trans, R, C, 8, True,
                    algo="ppe", ppe_rows=rows,
                )
            )
            for rows in (2, 4, 8)
        }
        # interpret-mode-only FMA drift grows with program size: a couple
        # ulp for the 4-row program, a few more for the 8-row one (on real
        # TPUs every variant is bitwise-identical — hardware-verified)
        for rows, rtol, bulk in ((4, 3e-7, 0.9), (8, 1e-6, 0.75)):
            np.testing.assert_allclose(outs[rows], outs[2], rtol=rtol)
            # the bulk must still be bit-identical even in interpret mode
            assert np.mean(outs[rows] == outs[2]) > bulk


class TestFusedGroupDispatch:
    """cfg.fuse_groups > 1: same-signature single-chunk plane groups fuse
    into ONE launch (lax.map of the per-group program) — results must be
    bitwise identical to per-group dispatch.  Runs the ppe planes path in
    interpret mode via the runner's test hook."""

    def _runner(self, fuse, rng_seed=5):
        import dataclasses

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            fuse_groups=fuse, fuse_auto=False,  # deterministic fusion
        )
        r = PallasPairHMMRunner(cfg, pair_budget=1024, interpret=True)
        r._allow_ppe_interpret = True
        return r

    def test_fused_matches_unfused_bitwise(self, rng):
        from gatk_hc_tpu.ops.runner import PairHMMJob

        # 12 jobs x (8 reads x 16 haps) = 128 pairs each; budget 1024 ->
        # an 8-job group + a 4-job tail group (padded to the same 1024-pair
        # chunk), fused into one 2-group launch when fuse=4
        jobs_a = [make_job(rng, 8, 16) for _ in range(12)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]

        fused = self._runner(fuse=4)
        fused.run(jobs_a)
        plain = self._runner(fuse=1)
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)

    def test_fused_mixed_group_sizes(self, rng):
        """A tail group smaller than the fuse width and multi-signature
        batches must still finalize every job correctly."""
        from gatk_hc_tpu.ops.runner import PairHMMJob

        jobs_a = [make_job(rng, 8, 16) for _ in range(9)]  # 1152 pairs
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        fused = self._runner(fuse=3)
        fused.run(jobs_a)
        plain = self._runner(fuse=1)
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            assert a.result is not None
            np.testing.assert_array_equal(a.result, b.result)

    def test_fused_multi_device_placement_independent(self, rng):
        """fuse_groups > 1 with round-robin over 8 virtual devices: fused
        batches land on different devices, results identical to a
        single-device unfused run."""
        import jax

        from gatk_hc_tpu.ops.runner import PairHMMJob

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        jobs_a = [make_job(rng, 8, 16) for _ in range(12)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        fused = self._runner(fuse=2)  # 2 groups per launch, 1 launch here
        fused._devices = list(jax.devices())
        fused.run(jobs_a)
        plain = self._runner(fuse=1)
        plain._devices = list(jax.devices())[:1]
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)


class TestPackedFusedDispatch:
    """The packed encoding's fused path (pairhmm_pallas_packed /
    pairhmm_pallas_packed_fused): single-chunk packed groups defer to the
    fuse sink and dispatch k-at-a-time in ONE launch.  Must be bitwise
    identical to both the unfused packed dispatch and the planes path
    (same element tables, same kernel; only shipping encoding + launch
    count differ)."""

    def _runner(self, fuse, forced="packed"):
        import dataclasses

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            fuse_groups=fuse, dispatch_mode=forced, fuse_auto=False,
            # pin the RAW packed encoding: with packed_nib (the default)
            # every eligible group would defer as packednib instead, and
            # the raw fused program would lose its only CPU coverage
            # (TestPackedNib covers the nib variants)
            packed_nib=False,
        )
        r = PallasPairHMMRunner(cfg, pair_budget=1024, interpret=True)
        r._allow_ppe_interpret = True
        return r

    def test_packed_fused_matches_planes_unfused_bitwise(self, rng):
        from gatk_hc_tpu.ops.runner import PairHMMJob

        jobs_a = [make_job(rng, 8, 16) for _ in range(12)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        fused = self._runner(fuse=4, forced="packed")
        fused.run(jobs_a)
        plain = self._runner(fuse=1, forced="planes")
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)

    def test_packed_unfused_matches_packed_fused_bitwise(self, rng):
        from gatk_hc_tpu.ops.runner import PairHMMJob

        jobs_a = [make_job(rng, 8, 16) for _ in range(9)]  # 3-group tail
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        fused = self._runner(fuse=3, forced="packed")
        fused.run(jobs_a)
        plain = self._runner(fuse=1, forced="packed")
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            assert a.result is not None
            np.testing.assert_array_equal(a.result, b.result)

    def test_packed_fused_multi_device_placement_independent(self, rng):
        import jax

        from gatk_hc_tpu.ops.runner import PairHMMJob

        if len(jax.devices()) < 8:
            import pytest

            pytest.skip("needs 8 virtual devices")
        jobs_a = [make_job(rng, 8, 16) for _ in range(12)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        fused = self._runner(fuse=2, forced="packed")
        fused._devices = list(jax.devices())
        fused.run(jobs_a)
        plain = self._runner(fuse=1, forced="planes")
        plain._devices = list(jax.devices())[:1]
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)


class TestPackedNib:
    """The minimal-bytes packed encoding (pairhmm_pallas_packed_nib):
    nibble-dictionary read planes + on-device span-expanded pair indices.
    Must be bitwise identical to the planes and raw packed paths (same
    element-table VALUES selected through per-group dictionaries; same
    pair order by construction), engage only when the group's alphabets
    fit, and fall back to the raw packed program when they don't."""

    def _runner(self, forced="packed", nib=True):
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            dispatch_mode=forced, fuse_groups=1, packed_nib=nib,
        )
        r = PallasPairHMMRunner(cfg, pair_budget=1024, interpret=True)
        r._allow_ppe_interpret = True
        return r

    def test_nib_matches_planes_bitwise(self, rng):
        # multi-job groups with ragged nr/nh -> multi-span expansion and a
        # padded tail chunk (covered > total)
        jobs_a = [make_job(rng, 3 + (i % 4), 2 + (i % 3)) for i in range(10)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        nibr = self._runner(forced="packed", nib=True)
        nibr.run(jobs_a)
        assert nibr.dispatch_counts.get("packednib", 0) > 0
        assert "packed" not in nibr.dispatch_counts
        plain = self._runner(forced="planes")
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)

    def test_nib_matches_raw_packed_bitwise(self, rng):
        jobs_a = [make_job(rng, 8, 16) for _ in range(6)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        self._runner(forced="packed", nib=True).run(jobs_a)
        raw = self._runner(forced="packed", nib=False)
        raw.run(jobs_b)
        assert raw.dispatch_counts.get("packed", 0) > 0
        assert "packednib" not in raw.dispatch_counts
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)

    def test_alphabet_overflow_falls_back_to_raw_packed(self, rng):
        # >32 distinct qual bytes in one group -> the dictionary overflows
        # and the raw packed program must take over (same results)
        import random as _random

        reads = []
        for i in range(8):
            read, _, hap = make_pair(rng, 24, 60, 1)
            quals = "".join(
                chr(33 + ((i * 24 + k) % 60)) for k in range(len(read))
            )
            reads.append((to_bytes(read), to_bytes(quals)))
        _, _, hap = make_pair(rng, 10, 60, 0)
        job_a = PairHMMJob(reads, [to_bytes(hap)])
        job_b = PairHMMJob(reads, [to_bytes(hap)])
        r = self._runner(forced="packed", nib=True)
        r.run([job_a])
        assert r.dispatch_counts.get("packed", 0) > 0
        assert "packednib" not in r.dispatch_counts
        self._runner(forced="planes").run([job_b])
        np.testing.assert_array_equal(job_a.result, job_b.result)

    def test_nib_fused_matches_planes_bitwise(self, rng):
        """k same-signature nib groups fuse into ONE launch
        (pairhmm_pallas_packed_nib_fused) — bitwise identical to unfused
        planes dispatch, and the fused label records the nib encoding."""
        jobs_a = [make_job(rng, 8, 16) for _ in range(12)]
        jobs_b = [PairHMMJob(j.reads, j.haps) for j in jobs_a]
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            fuse_groups=4, dispatch_mode="packed", fuse_auto=False,
        )
        fused = PallasPairHMMRunner(cfg, pair_budget=1024, interpret=True)
        fused._allow_ppe_interpret = True
        fused.run(jobs_a)
        assert any(
            k.startswith("packednibfused") for k in fused.dispatch_counts
        )
        assert "packedfused2" not in fused.dispatch_counts
        plain = self._runner(forced="planes")
        plain.run(jobs_b)
        for a, b in zip(jobs_a, jobs_b):
            np.testing.assert_array_equal(a.result, b.result)

    def test_expand_pairs_from_spans_matches_host(self):
        """Device span expansion == the host pr/ph construction, including
        zero-count padding rows and the padded tail past the pair total."""
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_pallas import _expand_pairs_from_spans

        spans = [(0, 0, 3, 2), (3, 2, 1, 5), (4, 7, 2, 2)]
        pr_parts, ph_parts = [], []
        for rb, hb, nr, nh in spans:
            pr_parts.append(np.repeat(np.arange(rb, rb + nr), nh))
            ph_parts.append(np.tile(np.arange(hb, hb + nh), nr))
        total = sum(nr * nh for _, _, nr, nh in spans)
        B = 32  # > total -> tail must pad with pair (0, 0)
        want_pr = np.zeros(B, np.int32)
        want_ph = np.zeros(B, np.int32)
        want_pr[:total] = np.concatenate(pr_parts)
        want_ph[:total] = np.concatenate(ph_parts)
        spans_arr = np.zeros((8, 4), np.int32)  # padded span rows
        spans_arr[: len(spans)] = spans
        pr, ph = _expand_pairs_from_spans(jnp.asarray(spans_arr), B)
        np.testing.assert_array_equal(np.asarray(pr), want_pr)
        np.testing.assert_array_equal(np.asarray(ph), want_ph)

    def test_unpack_nib_matches_plane_tables(self):
        """_unpack_nib_ppe through a host-built dictionary must reproduce
        the exact planes of the raw encodings, including padding bytes."""
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_pallas import (
            _unpack_nib_ppe,
            plane_tables,
            ppe_element_table,
        )
        from gatk_hc_tpu.utils.quality import (
            BASE_TABLE,
            INITIAL_CONSTANT_F32,
            PH2PR_F32,
        )

        nprng = np.random.default_rng(7)
        nr, nh, r_pad, c_pad = 8, 4, 16, 32
        read_u8 = np.zeros((nr, r_pad), np.uint8)
        qual_u8 = np.zeros((nr, r_pad), np.uint8)
        read_u8[:, :13] = nprng.choice(
            np.frombuffer(b"ACGTN", np.uint8), (nr, 13)
        )
        qual_u8[:, :13] = nprng.integers(53, 74, (nr, 13)).astype(np.uint8)
        hap_u8 = nprng.choice(np.frombuffer(b"ACGT", np.uint8), (nh, c_pad))
        read_lens = np.full(nr, 13, np.int32)
        hap_lens = np.full(nh, c_pad, np.int32)
        init_y = (
            INITIAL_CONSTANT_F32 / hap_lens.astype(np.float32)
        ).astype(np.float32)
        runner = self._runner()
        nib, minitab = runner._nib_encode(read_u8, qual_u8)
        u8buf = np.concatenate([nib.ravel(), hap_u8.ravel()])
        i32buf = np.concatenate([read_lens, hap_lens, init_y.view(np.int32)])
        ru, hu, rl, hl, iy = _unpack_nib_ppe(
            jnp.asarray(u8buf), jnp.asarray(i32buf), jnp.asarray(minitab),
            jnp.asarray(ppe_element_table(BASE_TABLE, PH2PR_F32)),
            nr, nh, r_pad, c_pad,
        )
        mask_tab, omq_tab, q3_tab = plane_tables(BASE_TABLE, PH2PR_F32)
        np.testing.assert_array_equal(np.asarray(ru[0]), mask_tab[read_u8])
        np.testing.assert_array_equal(np.asarray(ru[1]), omq_tab[qual_u8])
        np.testing.assert_array_equal(np.asarray(ru[2]), q3_tab[qual_u8])
        np.testing.assert_array_equal(np.asarray(hu), mask_tab[hap_u8])
        np.testing.assert_array_equal(np.asarray(rl), read_lens)
        np.testing.assert_array_equal(np.asarray(hl), hap_lens)


class TestPackedUnpack:
    def test_prepare_tables_ppe_matches_plane_tables(self):
        """The packed-path device unpack (runner layout [reads|quals|haps],
        each byte shipped ONCE) must produce exactly the planes the host
        path builds with plane_tables — regression for the one-gather
        layout bug that crashed any run calibrating onto the packed path
        (u8buf[:n] assumed quals were shipped twice)."""
        import jax.numpy as jnp

        from gatk_hc_tpu.ops.pairhmm_pallas import (
            plane_tables,
            ppe_element_table,
            prepare_tables_ppe,
        )
        from gatk_hc_tpu.utils.quality import (
            BASE_TABLE,
            INITIAL_CONSTANT_F32,
            PH2PR_F32,
        )

        rng = np.random.default_rng(11)
        nr, nh, r_pad, c_pad = 8, 4, 16, 32
        read_u8 = rng.integers(60, 90, (nr, r_pad)).astype(np.uint8)
        qual_u8 = rng.integers(33, 105, (nr, r_pad)).astype(np.uint8)
        hap_u8 = rng.integers(60, 90, (nh, c_pad)).astype(np.uint8)
        read_lens = np.full(nr, r_pad - 2, np.int32)
        hap_lens = np.full(nh, c_pad - 3, np.int32)
        init_y = (INITIAL_CONSTANT_F32 / hap_lens.astype(np.float32)).astype(
            np.float32
        )
        u8buf = np.concatenate(
            [read_u8.ravel(), qual_u8.ravel(), hap_u8.ravel()]
        )
        i32buf = np.concatenate(
            [read_lens, hap_lens, init_y.view(np.int32)]
        )
        tab = jnp.asarray(ppe_element_table(BASE_TABLE, PH2PR_F32))
        ru, hu, rl, hl, iy = prepare_tables_ppe(
            jnp.asarray(u8buf), jnp.asarray(i32buf), tab,
            nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
        )
        mask_tab, omq_tab, q3_tab = plane_tables(BASE_TABLE, PH2PR_F32)
        np.testing.assert_array_equal(np.asarray(ru[0]), mask_tab[read_u8])
        np.testing.assert_array_equal(np.asarray(ru[1]), omq_tab[qual_u8])
        np.testing.assert_array_equal(np.asarray(ru[2]), q3_tab[qual_u8])
        np.testing.assert_array_equal(np.asarray(hu), mask_tab[hap_u8])
        np.testing.assert_array_equal(np.asarray(rl), read_lens)
        np.testing.assert_array_equal(np.asarray(hl), hap_lens)
        np.testing.assert_array_equal(
            np.asarray(iy).view(np.int32), init_y.view(np.int32)
        )
