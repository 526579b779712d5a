"""bench.py harness logic (CPU, tiny shapes).

The sustained numbers themselves are hardware-only; these tests pin the
harness mechanics the artifacts depend on: the dispatch A/B runs every
configured arm per phase round, phase classification uses BOTH probes
(latency + pipelined burst), per-phase buckets are kept separate, the
unfused config is restored between rounds, and the wait loop re-samples
the current class's bucket.

Arm matrix: the tests shrink bench.ARM_SPECS to two arms (the mechanics
are arm-count-independent) because every arm's program set is compiled at
bench_device warmup — the full five-arm matrix costs ~10 minutes of
XLA:CPU compilation per test.
"""

import dataclasses

import numpy as np
import pytest

import bench
from gatk_hc_tpu.io.columnar import ReadPairs

# two arms exercise both encodings and the ARM_SPECS-driven cfg/warmup
# plumbing; "packed" must exist (the degraded re-sample dispatches it)
SMALL_ARMS = (
    ("unfused", 0, "planes", 4),
    ("packed", 0, "packed", 4),
)


@pytest.fixture
def small_arms(monkeypatch):
    monkeypatch.setattr(bench, "ARM_SPECS", SMALL_ARMS)
    monkeypatch.setattr(
        bench, "ARM_NAMES", tuple(n for n, _, _, _ in SMALL_ARMS)
    )
    # throughput-degraded by default: classification is then purely by the
    # latency probe, which each test controls
    monkeypatch.setattr(bench, "probe_relay_burst_op_ms", lambda: 100.0)


def _tiny_workload(n_reads=8, n_haps=2, read_len=16, hap_len=24):
    rng = np.random.default_rng(7)
    haps = [
        rng.integers(65, 69, hap_len).astype(np.uint8) for _ in range(n_haps)
    ]
    flat_seq = rng.integers(65, 69, n_reads * read_len).astype(np.uint8)
    flat_qual = np.full(n_reads * read_len, 40, np.uint8)
    off = np.arange(n_reads + 1, dtype=np.int64) * read_len
    return ReadPairs(flat_seq, flat_qual, off), haps


def test_classify_phase():
    assert bench.classify_phase(5.0, 100.0) == "healthy"
    assert bench.classify_phase(24.0, 1.3) == "tp_healthy"
    assert bench.classify_phase(24.0, 30.0) == "degraded"
    assert bench.classify_phase(12.0, 30.0) == "healthy"  # boundary


def test_bench_device_runs_every_arm_per_round(small_arms, monkeypatch):
    monkeypatch.setattr(bench, "probe_relay_op_ms", lambda: 5.0)  # healthy
    reads, haps = _tiny_workload()
    # budget_s=0: deadline already passed -> exactly one round (all arms)
    best, rounds, arms = bench.bench_device(reads, haps, n_jobs=2, budget_s=0.0)
    assert rounds == 1
    assert best["degraded"] is None and not arms["degraded"]
    assert best["tp_healthy"] is None and not arms["tp_healthy"]
    assert set(arms["healthy"]) == set(bench.ARM_NAMES)
    assert best["healthy"] == max(arms["healthy"].values()) > 0


def test_bench_device_degraded_bucket(small_arms, monkeypatch):
    monkeypatch.setattr(bench, "probe_relay_op_ms", lambda: 40.0)  # degraded
    reads, haps = _tiny_workload()
    best, rounds, arms = bench.bench_device(reads, haps, n_jobs=2, budget_s=0.0)
    assert best["healthy"] is None and not arms["healthy"]
    assert set(arms["degraded"]) == set(bench.ARM_NAMES)
    assert best["degraded"] == max(arms["degraded"].values()) > 0


def test_bench_device_tp_healthy_bucket(small_arms, monkeypatch):
    """Latency-degraded but burst-fine phases land in the tp_healthy
    bucket — the class that makes sustained capability measurable when the
    strict latency gate never opens (observed lasting hours)."""
    monkeypatch.setattr(bench, "probe_relay_op_ms", lambda: 24.0)
    monkeypatch.setattr(bench, "probe_relay_burst_op_ms", lambda: 1.3)
    reads, haps = _tiny_workload()
    best, rounds, arms = bench.bench_device(reads, haps, n_jobs=2, budget_s=0.0)
    assert best["healthy"] is None and best["degraded"] is None
    assert set(arms["tp_healthy"]) == set(bench.ARM_NAMES)
    assert best["tp_healthy"] == max(arms["tp_healthy"].values()) > 0


def test_bench_device_degraded_resample_tracks_best_moment(
    small_arms, monkeypatch
):
    """While waiting for a better phase, bench re-samples the cheapest arm
    (packed) every 8 wait ticks — re-probing the phase right before the
    sample — so each bucket tracks the best moment of the budget window."""
    calls = []
    real_stream = bench._run_stream
    state = {"resampled": False}

    def counting_stream(*a, **k):
        calls.append(1)
        if len(calls) == len(bench.ARM_SPECS) + 1:
            # this call IS the wait-loop re-sample (one full arm round
            # ran before it): turn the phase healthy afterwards
            state["resampled"] = True
        return real_stream(*a, **k)

    def probe():
        return 5.0 if state["resampled"] else 40.0

    monkeypatch.setattr(bench, "_run_stream", counting_stream)
    monkeypatch.setattr(bench, "probe_relay_op_ms", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    reads, haps = _tiny_workload()
    best, rounds, arms = bench.bench_device(reads, haps, n_jobs=2, budget_s=1e6)
    # 1 degraded full round + 1 re-sample + 5 healthy full rounds
    assert best["degraded"] is not None and best["healthy"] is not None
    assert rounds == 6
    assert len(calls) == len(bench.ARM_SPECS) * 6 + 1


def test_bench_device_resample_defers_to_new_phase_class(
    small_arms, monkeypatch
):
    """If the phase flips to a class that still has full-round capacity
    during the 15 s sleep, the re-probe must skip the cheap sample and let
    the next loop iteration run a FULL round in the new class."""
    calls = []
    real_stream = bench._run_stream
    probes = {"n": 0}

    def counting_stream(*a, **k):
        calls.append(1)
        return real_stream(*a, **k)

    def probe():
        probes["n"] += 1
        # probe #1 = first (degraded) round; probes #2-#9 = the 8 wait
        # ticks' top-of-loop probes; probe #10 = the re-probe right before
        # the would-be re-sample — healed by then
        return 40.0 if probes["n"] <= 9 else 5.0

    monkeypatch.setattr(bench, "_run_stream", counting_stream)
    monkeypatch.setattr(bench, "probe_relay_op_ms", probe)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    reads, haps = _tiny_workload()
    best, rounds, arms = bench.bench_device(reads, haps, n_jobs=2, budget_s=1e6)
    # no cheap sample into any bucket: 1 degraded + 5 healthy FULL rounds
    assert len(calls) == len(bench.ARM_SPECS) * 6
    assert best["degraded"] is not None and best["healthy"] is not None


def test_main_artifact_fields_tp_healthy(monkeypatch, capsys):
    """main()'s artifact JSON for a tp_healthy-only capture: headline from
    the tp bucket, tri-state floors, and the throughput-degraded flag."""
    import json

    fake = {
        "relay_op_ms": 24.0, "relay_burst_op_ms": 1.3,
        "best": {"healthy": None, "tp_healthy": 6.9e10, "degraded": 3.1e10},
        "rounds": 4,
        "arms": {"healthy": {}, "tp_healthy": {"packed": 6.9e10},
                 "degraded": {"packed": 3.1e10}},
        "kernel": 1.56e11, "e2e_s": 1.9,
    }
    monkeypatch.setattr(bench, "_run_device_subprocess", lambda: fake)
    monkeypatch.setattr(bench, "bench_cpu_baseline", lambda *a, **k: 7.7e8)
    monkeypatch.setattr(bench, "_update_history", lambda *a, **k: None)
    monkeypatch.setattr(bench, "make_workload", lambda: ([], []))
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == round(6.9e10)
    assert out["sustained_tp_healthy_cells_per_s"] == round(6.9e10)
    assert out["sustained_healthy_cells_per_s"] is None
    assert out["floor_ok"] is None and out["floor_ok_tp_healthy"] is True
    assert out["relay_degraded"] is True
    assert out["relay_throughput_degraded"] is False
    assert out["vs_baseline"] == round(6.9e10 / 345e6, 2)


def test_bandwidth_probe_returns_positive_rates():
    """The bulk-transfer probe (third relay axis) must return finite
    positive MB/s in both directions on any backend."""
    put_mbps, get_mbps = bench.probe_relay_bandwidth_mbps(
        size_mb=1.0, reps=1
    )
    assert np.isfinite(put_mbps) and put_mbps > 0
    assert np.isfinite(get_mbps) and get_mbps > 0


def test_sweep_summarize_winner_and_spread():
    """tools/sustained_sweep.summarize: medians, spreads, and the
    winner-separation verdict (margin must exceed BOTH spreads)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(bench.__file__), "tools"))
    from sustained_sweep import summarize

    cells = 1e9  # 1 Gcell per round -> gcells/s == 1/seconds
    results = {
        # medians: a=1/0.2=5.0, b=1/0.25=4.0; spreads small
        "a": [0.21, 0.20, 0.19],
        "b": [0.26, 0.25, 0.24],
    }
    s = summarize(results, cells)
    assert s["a"]["median_gcells_per_s"] == 5.0
    assert s["winner"]["arm"] == "a" and s["winner"]["runner_up"] == "b"
    assert s["winner"]["separated_beyond_spread"] is True
    # one outlier in the winner blows its spread past the margin
    results["a"] = [0.21, 0.20, 2.0]
    s = summarize(results, cells)
    assert s["winner"]["arm"] == "a"
    assert s["winner"]["separated_beyond_spread"] is False
