

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
