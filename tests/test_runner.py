import numpy as np



class TestDispatchPathController:
    """Relay-phase adaptation state machine (runner.DispatchPathController)."""

    def test_small_runs_stay_on_planes(self):
        from gatk_hc_tpu.ops.runner import DispatchPathController

        ctl = DispatchPathController(min_groups=32)
        for _ in range(31):
            path, cal = ctl.choose()
            assert path == "planes" and not cal

    def test_calibrates_both_then_picks_winner(self):
        from gatk_hc_tpu.ops.runner import DispatchPathController

        ctl = DispatchPathController(min_groups=1, recal_every=8)
        path, cal = ctl.choose()
        assert cal and path == "planes"
        ctl.record("planes", 2e-6)
        path, cal = ctl.choose()
        assert cal and path == "packed"
        ctl.record("packed", 1e-6)
        for _ in range(5):
            path, cal = ctl.choose()
            assert path == "packed" and not cal

    def test_recalibration_flips_on_phase_change(self):
        from gatk_hc_tpu.ops.runner import DispatchPathController

        ctl = DispatchPathController(min_groups=1, recal_every=4)
        ctl.choose(); ctl.record("planes", 1e-6)
        ctl.choose(); ctl.record("packed", 3e-6)
        # planes wins until the stale packed measurement is refreshed
        seen_cal = None
        for _ in range(10):
            path, cal = ctl.choose()
            if cal:
                seen_cal = path
                # phase change: packed is now 10x faster
                ctl.record(path, 1e-7 if path == "packed" else 5e-6)
        assert seen_cal is not None
        # the next non-calibration choice must be the new winner
        while True:
            path, cal = ctl.choose()
            if cal:
                ctl.record(path, 1e-7 if path == "packed" else 5e-6)
                continue
            break
        assert path == "packed"

    def test_forced_path_never_calibrates(self):
        from gatk_hc_tpu.ops.runner import DispatchPathController

        ctl = DispatchPathController(forced="planes")
        for _ in range(100):
            assert ctl.choose() == ("planes", False)

    def test_degraded_detection(self):
        from gatk_hc_tpu.ops.runner import DispatchPathController

        ctl = DispatchPathController(min_groups=1)
        assert not ctl.degraded()
        ctl.record("planes", 1e-6)
        assert not ctl.degraded()  # establishes the floor
        ctl.record("planes", 5e-6)
        assert ctl.degraded()
        ctl.record("planes", 1.5e-6)
        assert not ctl.degraded()


class TestWedgeFailover:
    """Device-wedge failover: a dispatch or fetch that blocks past
    cfg.device_timeout_s fails over to the bit-exact C++ engine instead of
    hanging the run."""

    def _jobs_and_expected(self, n=4):
        import random

        from gatk_hc_tpu.ops.runner import NativePairHMMRunner, PairHMMJob
        from tests.test_pallas import TINY_CFG, make_job

        rng = random.Random(11)
        jobs = [make_job(rng, 3, 2) for _ in range(n)]
        expected = [PairHMMJob(j.reads, j.haps) for j in jobs]
        NativePairHMMRunner(TINY_CFG).run(expected)
        return jobs, expected

    def _wedged_runner(self, timeout=0.3):
        import dataclasses
        import time as _time

        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner
        from tests.test_pallas import TINY_CFG

        cfg = dataclasses.replace(TINY_CFG, device_timeout_s=timeout)
        runner = PallasPairHMMRunner(cfg, pair_budget=256, interpret=True)
        runner._submit_batch = lambda jobs: _time.sleep(3600)  # wedge
        # a true wedge: the health probe cannot finish either
        runner._probe_device_alive = lambda timeout_s=30.0: False
        return runner

    def test_dispatch_wedge_falls_back_to_native(self):
        jobs, expected = self._jobs_and_expected()
        runner = self._wedged_runner()
        runner.drain([runner.submit(jobs)])
        assert runner._wedged and runner.device_fallbacks == 1
        for got, want in zip(jobs, expected):
            np.testing.assert_array_equal(got.result, want.result)
        # post-wedge submits never touch the device and finish immediately
        jobs2, expected2 = self._jobs_and_expected()
        runner.drain([runner.submit(jobs2)])
        for got, want in zip(jobs2, expected2):
            np.testing.assert_array_equal(got.result, want.result)

    def test_fetch_wedge_falls_back_to_native(self):
        import time as _time

        jobs, expected = self._jobs_and_expected()
        runner = self._wedged_runner()
        # dispatch succeeds (real interpret path)...
        del runner._submit_batch  # restore the class implementation
        # ...but the fetch blocks
        runner._fetch = lambda flat, timeout: None
        runner.drain([runner.submit(jobs)])
        assert runner._wedged
        for got, want in zip(jobs, expected):
            np.testing.assert_array_equal(got.result, want.result)

    def test_timeout_zero_disables_failover(self):
        import dataclasses

        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner
        from tests.test_pallas import TINY_CFG

        cfg = dataclasses.replace(TINY_CFG, device_timeout_s=0.0)
        runner = PallasPairHMMRunner(cfg, pair_budget=256, interpret=True)
        jobs, expected = self._jobs_and_expected()
        runner.drain([runner.submit(jobs)])  # normal path, no side threads
        assert not runner._wedged and runner._fetch_pool is None
        for got, want in zip(jobs, expected):
            np.testing.assert_array_equal(got.result, want.result)


    def test_alive_but_slow_gets_bounded_extensions(self):
        """A timed-out batch with a LIVE probe is throttled, not wedged:
        drain grants MAX_SLOW_EXTENSIONS more budgets before failing over."""
        jobs, expected = self._jobs_and_expected()
        runner = self._wedged_runner(timeout=0.2)
        probes = []
        runner._probe_device_alive = lambda timeout_s=30.0: (
            probes.append(1) or True
        )
        runner.MAX_SLOW_EXTENSIONS = 2
        runner.drain([runner.submit(jobs)])
        # probe consulted once per expired budget; still fails over at the cap
        assert len(probes) == 3 and runner._wedged
        for got, want in zip(jobs, expected):
            np.testing.assert_array_equal(got.result, want.result)

    def test_background_runner_build_timeout_falls_back(self, monkeypatch):
        import dataclasses
        import time as _time

        import gatk_hc_tpu.ops.runner as runner_mod
        from tests.test_pallas import TINY_CFG

        class HangingRunner:
            def __init__(self, cfg, *a, **k):
                _time.sleep(3600)

        monkeypatch.setattr(runner_mod, "PallasPairHMMRunner", HangingRunner)
        cfg = dataclasses.replace(TINY_CFG, device_timeout_s=0.3)
        bg = runner_mod.BackgroundRunner(cfg)
        jobs, expected = self._jobs_and_expected()
        bg.drain([bg.submit(jobs)])
        assert bg.device_fallbacks >= 1
        for got, want in zip(jobs, expected):
            np.testing.assert_array_equal(got.result, want.result)


class TestNativeRunnerThreading:
    def test_threaded_matches_serial(self):
        import dataclasses
        import random

        from gatk_hc_tpu.ops.runner import NativePairHMMRunner, PairHMMJob
        from tests.test_pallas import TINY_CFG, make_job

        rng = random.Random(5)
        jobs = [make_job(rng, 3, 2) for _ in range(12)]
        serial = [PairHMMJob(j.reads, j.haps) for j in jobs]
        NativePairHMMRunner(
            dataclasses.replace(TINY_CFG, host_threads=1)
        ).run(serial)
        NativePairHMMRunner(
            dataclasses.replace(TINY_CFG, host_threads=4)
        ).run(jobs)
        for got, want in zip(jobs, serial):
            np.testing.assert_array_equal(got.result, want.result)

class TestFuseAuto:
    """cfg.fuse_auto: with fuse_groups > 1 the fused deferral engages ONLY
    while the dispatch controller measures an op-throughput-degraded phase
    (per-pair cost > 2x best-ever); results are bitwise identical either
    way (TestFusedGroupDispatch), so this pins the policy, not values."""

    def _runner(self, fuse_auto):
        import dataclasses

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            fuse_groups=4, fuse_auto=fuse_auto,
        )
        r = PallasPairHMMRunner(cfg, pair_budget=1024, interpret=True)
        r._allow_ppe_interpret = True
        return r

    def _jobs(self, rng, n=12):
        # 12 jobs -> two single-chunk groups per submit batch (8 + 4 jobs
        # at the 1024-pair budget), so fusion has something to fuse
        from tests.test_pallas import make_job

        return [make_job(rng, 8, 16) for _ in range(n)]

    def test_not_degraded_dispatches_unfused(self, rng):
        r = self._runner(fuse_auto=True)
        r.run(self._jobs(rng))
        assert not any(k.startswith("fused") for k in r.dispatch_counts)
        assert r.dispatch_counts.get("planes", 0) > 0

    def test_degraded_phase_engages_fusion(self, rng):
        r = self._runner(fuse_auto=True)
        # simulate a measured op-throughput collapse: best-ever 0.1us/pair,
        # current winner 1.0us/pair (10x > the 6x deep threshold)
        r._path_ctl.record("planes", 1e-6)
        r._path_ctl._best_ever = 1e-7
        assert r._path_ctl.deeply_degraded()
        r.run(self._jobs(rng))
        assert any(k.startswith("fused") for k in r.dispatch_counts)

    def test_moderate_degradation_stays_unfused(self, rng):
        """2-6x degradation coarsens chunks but must NOT fuse: the
        latency-inclusive calibration reads 2x+ in latency-degraded/
        throughput-fine phases, where fusion measured ~12% slower than the
        pipelined unfused packed stream (sustained_sweep_r5.json)."""
        r = self._runner(fuse_auto=True)
        r._path_ctl.record("planes", 3e-7)  # 3x best-ever: degraded,
        r._path_ctl._best_ever = 1e-7       # but not deeply
        assert r._path_ctl.degraded()
        assert not r._path_ctl.deeply_degraded()
        r.run(self._jobs(rng))
        assert not any(k.startswith("fused") for k in r.dispatch_counts)

    def test_fuse_auto_off_always_fuses(self, rng):
        r = self._runner(fuse_auto=False)
        r.run(self._jobs(rng))
        assert any(k.startswith("fused") for k in r.dispatch_counts)
