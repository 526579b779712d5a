"""Benchmark harness.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): PairHMM cell-updates/s per chip on the
single-region batched config (1k synthetic 151bp reads x 16 haplotypes),
measured on the production Pallas path including host->device transfer of
the uint8 tables and result readback.  vs_baseline divides by a FROZEN
reference-equivalent scalar CPU number (REFERENCE_SCALAR_CELLS_PER_S, the
repo's C++ scalar PairHMM under HC_PAIRHMM_SCALAR=1 — same semantics as the
reference's pairhmm.hpp) so the ratio is round-comparable and north-star
aligned; vs_current_cpu_engine divides by the repo's best CPU engine,
re-measured each run.  The upstream repo publishes no numbers and cannot be
built here (no Boost), see BASELINE.md.

Extra context fields: e2e chrM wall-clock + the CPU baseline measurement.
"""

from __future__ import annotations

import dataclasses
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_READS = 1024
N_HAPS = 16
READ_LEN = 151
HAP_LEN = 415  # padded-window reference length (245 + 2*85)

# FROZEN north-star divisor (VERDICT r3 weak #2): the reference-equivalent
# scalar C++ engine (HC_PAIRHMM_SCALAR=1, single thread — same semantics as
# /root/reference's scalar pairhmm.hpp:80-142, measured best-of-5 on this
# host 2026-08-19, warm tables).  This number never changes round-to-round,
# so `vs_baseline` is comparable across rounds and aligned with
# BASELINE.json's ">50x vs the CPU reference" north star.  The repo's own
# best CPU engine (AVX pairs-per-lane) keeps improving and is reported
# separately as `vs_current_cpu_engine`.
REFERENCE_SCALAR_CELLS_PER_S = 345e6

# Dispatch A/B arm matrix: (name, fuse_groups [0 = unfused], encoding,
# jobs per submit batch).  tests/test_bench.py asserts every configured arm
# runs in every phase round, keyed off THIS tuple — add arms here and the
# harness tests follow automatically.
ARM_SPECS = (
    ("unfused", 0, "planes", 4),
    ("fused4", 4, "planes", 4),
    ("fused8", 8, "planes", 8),
    ("packed", 0, "packed", 4),
    # packed encoding (4x fewer bytes) x fused-4 launches (4x fewer ops):
    # the composition (pairhmm_pallas_packed_fused).  Production fuses
    # adaptively (cfg.fuse_auto: only in measured op-throughput-degraded
    # phases); this arm pins the always-fused variant for the A/B.
    ("packedfused4", 4, "packed", 4),
)
ARM_NAMES = tuple(name for name, _, _, _ in ARM_SPECS)


def make_workload(seed: int = 20260816):
    """Realistic region shape: the 16 haplotypes are all small variations of
    one window reference (as real assembly candidates are), so every
    (read, hap) pair aligns decently — like production regions, where the
    f64 rescue path fires rarely."""
    rng = random.Random(seed)
    bases = "ACGT"
    base_hap = "".join(rng.choice(bases) for _ in range(HAP_LEN))
    haps = []
    for _ in range(N_HAPS):
        hap = bytearray(base_hap.encode())
        for _ in range(rng.randint(0, 3)):  # a few SNPs per candidate
            hap[rng.randrange(HAP_LEN)] = ord(rng.choice(bases))
        haps.append(np.frombuffer(bytes(hap), dtype=np.uint8))
    reads = []
    for i in range(N_READS):
        hap = haps[i % N_HAPS]
        start = rng.randint(0, HAP_LEN - READ_LEN)
        read = bytearray(hap[start : start + READ_LEN])
        for _ in range(rng.randint(0, 4)):
            read[rng.randrange(READ_LEN)] = ord(rng.choice(bases))
        quals = bytes(rng.randint(53, 73) for _ in range(READ_LEN))
        reads.append((np.frombuffer(bytes(read), dtype=np.uint8),
                      np.frombuffer(quals, dtype=np.uint8)))
    # columnar CSR form — what the production caller ships since the
    # ReadPairs change (the runner's whole-window packing fast path)
    from gatk_hc_tpu.io.columnar import ReadPairs

    off = np.arange(N_READS + 1, dtype=np.int64) * READ_LEN
    flat_seq = np.concatenate([b for b, _ in reads])
    flat_qual = np.concatenate([q for _, q in reads])
    return ReadPairs(flat_seq, flat_qual, off), haps


def bench_cpu_baseline(reads, haps, max_pairs: int = 256) -> float:
    """Reference-equivalent C++ engine, single thread (this host has 1 core,
    matching how the reference would run here)."""
    from gatk_hc_tpu import native

    n = min(max_pairs, len(reads) * len(haps))
    rb = np.zeros((len(reads), READ_LEN), dtype=np.uint8)
    rq = np.zeros_like(rb)
    rl = np.full(len(reads), READ_LEN, dtype=np.int32)
    for i, (b, q) in enumerate(reads):
        rb[i], rq[i] = b, q
    hb = np.stack(haps)
    hl = np.full(len(haps), HAP_LEN, dtype=np.int32)
    pr = (np.arange(n) // len(haps)).astype(np.int32)
    ph = (np.arange(n) % len(haps)).astype(np.int32)
    t0 = time.perf_counter()
    native.pairhmm_raw_native(rb, rq, rl, hb, hl, pr, ph, ord("I"), ord("+"))
    dt = time.perf_counter() - t0
    return n * READ_LEN * HAP_LEN / dt


def _run_stream(runner, jobs, jobs_per_submit: int = 4) -> float:
    """One pipelined dispatch stream: submit chunk k+1 before draining
    chunk k, exactly how a long contig flows through models/caller.py
    (incremental submit + chunked drain).  Readback of earlier chunks
    overlaps device compute of later ones."""
    from gatk_hc_tpu.ops.runner import PairHMMJob  # noqa: F401 (doc aid)

    t0 = time.perf_counter()
    pending = []
    for i in range(0, len(jobs), jobs_per_submit):
        pending.append(runner.submit(jobs[i : i + jobs_per_submit]))
        while len(pending) > 2:
            runner.drain([pending.pop(0)])
    runner.drain(pending)
    return time.perf_counter() - t0


PHASES = ("healthy", "tp_healthy", "degraded")
# full-arm rounds per phase class before dropping to cheap wait+resample
PHASE_ROUND_CAPS = {"healthy": 5, "tp_healthy": 3, "degraded": 1}


def classify_phase(op_ms: float, burst_ms: float) -> str:
    """Three phase classes from the two probes:
    - healthy: single-op latency <= 12 ms (the strict, round-over-round
      comparable bucket every prior round used);
    - tp_healthy: latency degraded BUT pipelined burst per-op <= 2.5 ms —
      the relay throttles op LATENCY only, which the depth-3 production
      stream hides entirely (measured: steady_op 24 ms with burst 1.3 ms
      while the packed stream sustained 61-71 G).  These phases last
      hours; without this class the sustained capability is unmeasurable
      whenever the latency gate never opens;
    - degraded: op throughput itself throttled."""
    if op_ms <= 12.0:
        return "healthy"
    if burst_ms <= 2.5:
        return "tp_healthy"
    return "degraded"


def bench_device(reads, haps, n_jobs: int = 16, budget_s: float = 1500.0):
    """Production Pallas path sustained throughput, phase-aware, with an
    in-round dispatch A/B across every ARM_SPECS arm.

    The tunnelled TPU throttles in phases lasting minutes to HOURS; a
    number taken in an op-throughput-degraded phase says nothing about the
    engine.  Each round is classified by the latency + burst probes
    (classify_phase) and recorded into its phase bucket.  Once a class
    has PHASE_ROUND_CAPS full-arm rounds, further iterations in that class
    are probe-only sleeps with a cheap single-arm re-sample every ~2 min
    (so each bucket tracks the best moment of the budget window), and the
    budget buys a long wait for a better class instead of expensive
    reruns.

    All dispatch arms run back-to-back inside each round, so the
    arm-vs-arm comparison is phase-relative valid in any class (every arm
    pays the same per-op relay cost; fused launches are bitwise identical
    — hardware-golden-verified, see perf_artifacts/).  Returns
    (best, rounds, arms) where best maps phase -> best cells/s over all
    arms (or None) and arms maps phase -> {arm_name -> best cells/s}."""
    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.runner import PairHMMJob, PallasPairHMMRunner
    from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache

    enable_compile_cache()
    # forced planes path: the headline measures the engine's best-case
    # encoding deterministically (adaptive mode exists for degraded-phase
    # e2e robustness and would add calibration syncs mid-stream)
    # device_timeout_s=0: the wedge failover must stay OFF in a benchmark —
    # it would silently time the C++ fallback as device throughput; a wedged
    # relay is handled by the subprocess watchdog instead
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, dispatch_mode="planes", device_timeout_s=0.0,
        fuse_groups=1,
    )
    # (arm, cfg, encoding, jobs per submit batch), derived ENTIRELY from
    # ARM_SPECS so adding an arm there really is enough (fuse_auto=False:
    # a bench arm must fuse deterministically, not by measured phase).
    # Fusing only spans one submit batch, so a fused-k arm's jps should be
    # >= k for full-width fusion (ARM_SPECS carries that choice per arm).
    arms_cfg = tuple(
        (
            name,
            cfg if k == 0 else dataclasses.replace(
                cfg, fuse_groups=k, fuse_auto=False
            ),
            enc,
            jps,
        )
        for name, k, enc, jps in ARM_SPECS
    )
    runner = PallasPairHMMRunner(cfg)
    # compile + warm every arm's program set (packed arms ship 4x fewer
    # bytes per group than int32 planes — uint8 + a device-side table
    # gather; the encoding is fixed per dispatch via _path_ctl.forced,
    # exactly what DispatchPathController's calibration does in adaptive
    # mode)
    for _name, arm_cfg, encoding, _jps in arms_cfg:
        runner.cfg = arm_cfg
        runner._path_ctl.forced = encoding
        k = max(arm_cfg.fuse_groups, 1)
        runner.run([PairHMMJob(reads, haps) for _ in range(k)])
    runner.cfg = cfg
    runner._path_ctl.forced = cfg.dispatch_mode
    cells_per_round = n_jobs * len(reads) * len(haps) * READ_LEN * HAP_LEN
    deadline = time.time() + budget_s
    best = {ph: None for ph in PHASES}
    arms = {ph: {} for ph in PHASES}
    full_rounds = {ph: 0 for ph in PHASES}
    rounds = waits = 0

    def record(phase, arm_name, rate):
        if rate > arms[phase].get(arm_name, 0.0):
            arms[phase][arm_name] = rate
        if best[phase] is None or rate > best[phase]:
            best[phase] = rate

    def packed_sample(phase):
        """One cheap single-arm stream (one-launch packed, the measured
        king arm) recorded into `phase`'s bucket."""
        runner.cfg = cfg
        runner._path_ctl.forced = "packed"
        jobs = [PairHMMJob(reads, haps) for _ in range(n_jobs)]
        rate = cells_per_round / _run_stream(runner, jobs, jobs_per_submit=4)
        runner._path_ctl.forced = cfg.dispatch_mode
        record(phase, "packed", rate)

    while True:
        op_ms = probe_relay_op_ms()
        burst_ms = _burst_for(op_ms)
        phase = classify_phase(op_ms, burst_ms)
        if full_rounds[phase] >= PHASE_ROUND_CAPS[phase]:
            # this class has enough full-arm context; wait cheaply for a
            # better class (or the budget), re-sampling the cheapest arm
            # every ~2 min so each bucket tracks the BEST moment of the
            # budget window rather than its first round
            if time.time() > deadline:
                break
            time.sleep(15)
            waits += 1
            if waits % 8 == 0:
                # re-probe IMMEDIATELY before sampling (the top-of-loop
                # probe is 15 s stale; a flipped phase must not pollute
                # the old bucket); skip deep degradation (> 50 ms) where
                # even one stream costs minutes
                op_now = probe_relay_op_ms()
                ph_now = classify_phase(op_now, _burst_for(op_now))
                if ph_now == "degraded" and op_now > 50.0:
                    continue  # deep degradation: one stream costs minutes
                if full_rounds[ph_now] < PHASE_ROUND_CAPS[ph_now]:
                    continue  # a better class opened: full round next loop
                packed_sample(ph_now)
            continue
        for arm_name, arm_cfg, encoding, jps in arms_cfg:
            runner.cfg = arm_cfg  # safe: fuse_groups is read at dispatch,
            # and the previous arm fully drained before the swap
            runner._path_ctl.forced = encoding
            jobs = [PairHMMJob(reads, haps) for _ in range(n_jobs)]
            dt = _run_stream(runner, jobs, jobs_per_submit=jps)
            record(phase, arm_name, cells_per_round / dt)
        runner.cfg = cfg
        runner._path_ctl.forced = cfg.dispatch_mode
        rounds += 1
        full_rounds[phase] += 1
        # stop on enough strict-healthy samples, or at the budget
        if full_rounds["healthy"] >= PHASE_ROUND_CAPS["healthy"] or (
            time.time() > deadline
        ):
            break
    return best, rounds, arms


def probe_relay_op_ms() -> float:
    """Steady-state cost of one trivial XLA op + sync through the relay.
    Healthy phases measure ~4-8 ms; degraded phases (which can last hours)
    measure 25+ ms and scale every number in this file by the same factor —
    recorded in the output so a bad-phase run is interpretable."""
    import time

    import jax
    import jax.numpy as jnp

    x = jax.device_put(np.ones((1024, 480), np.float32))
    f = jax.jit(lambda a: a * 2 + 1)
    _ = jax.device_get(jnp.sum(f(x)))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = jax.device_get(jnp.sum(f(x)))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _burst_for(op_ms: float) -> float:
    """Burst probe sized to the phase: classification ignores burst in
    latency-healthy phases (classify_phase short-circuits at op <= 12 ms),
    and in deep degradation a 3x32-op chain would cost minutes — 1x8
    bounds the probe at ~8 ops while still separating latency-only
    throttling from a real throughput collapse."""
    if op_ms <= 12.0:
        return 0.0
    if op_ms > 50.0:
        return probe_relay_burst_op_ms(depth=8, reps=1)
    return probe_relay_burst_op_ms()


def probe_relay_burst_op_ms(depth: int = 32, reps: int = 3) -> float:
    """Per-op cost inside a PIPELINED burst (enqueue `depth` dependent ops,
    sync once) — the relay's op THROUGHPUT, which is what the production
    submit/drain stream actually rides (per-op LATENCY is hidden by the
    depth-3 pipeline).  Phases exist where latency reads 20+ ms 'degraded'
    while burst throughput is fine and the packed stream sustains 69-71 G
    (r5 sweep); this field separates the two failure modes in artifacts."""
    import time

    import jax
    import jax.numpy as jnp

    x = jax.device_put(np.ones((1024, 480), np.float32))
    f = jax.jit(lambda a: a * 2 + 1)
    y = f(x)
    _ = jax.device_get(jnp.sum(y))  # warm + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        y = x
        for _ in range(depth):
            y = f(y)
        _ = jax.device_get(jnp.sum(y))
        best = min(best, (time.perf_counter() - t0) / depth)
    return best * 1e3


def probe_relay_bandwidth_mbps(size_mb: float = 8.0, reps: int = 3):
    """(put_MB/s, get_MB/s) for one bulk u8 array — the relay's third axis
    next to op latency and pipelined op throughput.  A packed 16384-pair
    dispatch group ships ~1 MB of u8 planes + pair indices and reads back
    ~64 KB of f32, so bytes/put_rate is the bandwidth term of the
    per-group overhead (the sustained-vs-kernel gap attribution in
    PERFORMANCE.md); a healthy relay should make it negligible next to the
    ~1 ms per-put flat cost."""
    import time

    import jax

    a = np.ones(int(size_mb * 1e6), np.uint8)
    x = jax.device_put(a)
    x.block_until_ready()  # warm the transfer path
    put_best = get_best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jax.device_put(a)
        x.block_until_ready()
        put_best = min(put_best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _ = jax.device_get(x)
        get_best = min(get_best, time.perf_counter() - t0)
    return size_mb / put_best, size_mb / get_best


def bench_kernel_only() -> float:
    """Device-resident kernel throughput (stable across relay phases):
    true cells/s of the production kernel at production shapes.  Shares its
    implementation with tools/kernel_bench.py."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    from kernel_bench import measure_kernel

    _, true_cells_per_s, _ = measure_kernel(
        pairs=16384, r_pad=160, rlen=READ_LEN, c_pad=448, clen=HAP_LEN
    )
    return true_cells_per_s


def bench_e2e_chrm() -> float:
    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.models.caller import call_batched

    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    sam = os.path.join(fixtures, "chrM.sam")
    fasta = os.path.join(fixtures, "chrM.fa")
    if not os.path.exists(sam):
        return float("nan")
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, pairhmm_engine="pallas", assembler_engine="native",
        device_timeout_s=0.0,  # no failover inside a timed benchmark
    )
    t0 = time.perf_counter()
    call_batched(sam, fasta, "/tmp/bench_chrM.vcf", cfg)
    return time.perf_counter() - t0


def device_section() -> dict:
    """Everything that touches the device, as one JSON-able dict.  Run via
    --device-json in a watchdogged subprocess (see main): the relay has
    been observed fully WEDGED for hours (device calls block forever while
    enumeration stays instant), and a hung in-process device call cannot
    be interrupted."""
    reads, haps = make_workload()
    relay_op_ms = probe_relay_op_ms()
    # full burst for the artifact of record unless the phase is so deep a
    # 96-op chain would cost minutes (then the bounded 8-op variant)
    relay_burst_op_ms = (
        probe_relay_burst_op_ms()
        if relay_op_ms <= 50.0
        else probe_relay_burst_op_ms(depth=8, reps=1)
    )
    # bandwidth probe sized to the phase: deep degradation gets one 2 MB
    # round trip instead of three 8 MB ones
    put_mbps, get_mbps = (
        probe_relay_bandwidth_mbps()
        if relay_op_ms <= 50.0
        else probe_relay_bandwidth_mbps(size_mb=2.0, reps=1)
    )
    best, rounds, arms = bench_device(reads, haps)
    kernel_cells_per_s = bench_kernel_only()
    e2e_s = bench_e2e_chrm()
    return {
        "relay_op_ms": relay_op_ms,
        "relay_burst_op_ms": relay_burst_op_ms,
        "relay_put_mbps": put_mbps,
        "relay_get_mbps": get_mbps,
        "best": best,
        "rounds": rounds,
        "arms": arms,
        "kernel": kernel_cells_per_s,
        "e2e_s": e2e_s,
    }


# generous ceiling: a degraded-but-alive phase can legitimately take this
# long (25 min healthy-wait + one degraded stream + program loads); a
# wedged relay produces nothing
DEVICE_TIMEOUT_S = 3300.0

# Best healthy-phase results ever measured, persisted so a run that lands
# in a wedged/degraded relay phase still reports the last known-good engine
# numbers (clearly labelled as historical).  Two layers: a per-machine cache
# and a REPO-COMMITTED record (perf_artifacts/bench_best_healthy.json) that
# survives machine resets between rounds — the carry-forward the r3 verdict
# asked for, so a degraded capture can never silently become the number of
# record.
HISTORY_PATH = os.path.expanduser("~/.cache/gatk_hc_tpu_bench_history.json")
REPO_HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "perf_artifacts", "bench_best_healthy.json",
)


def _git_rev() -> str:
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        return ""


def _load_history() -> dict:
    """Best records, merged field-wise over the machine cache and the repo
    file (the strict-healthy and throughput-healthy bests can come from
    different captures)."""
    best: dict = {}
    for path in (HISTORY_PATH, REPO_HISTORY_PATH):
        try:
            with open(path) as handle:
                hist = json.load(handle)
        except Exception:
            continue
        if hist.get("healthy_cells_per_s", 0) > best.get(
            "healthy_cells_per_s", 0
        ):
            for k in ("healthy_cells_per_s", "kernel_cells_per_s",
                      "git_rev", "measured_at"):
                if k in hist:
                    best[k] = hist[k]
        if hist.get("tp_healthy_cells_per_s", 0) > best.get(
            "tp_healthy_cells_per_s", 0
        ):
            for k in ("tp_healthy_cells_per_s", "tp_healthy_git_rev",
                      "tp_healthy_measured_at"):
                if k in hist:
                    best[k] = hist[k]
    return best


def _update_history(healthy, kernel, tp_healthy=None) -> None:
    """Keep the best strict-healthy AND best throughput-healthy sustained
    numbers ever measured (separate fields: the strict latency-gated one
    stays comparable with every prior round)."""
    hist = _load_history()
    changed = False
    if healthy is not None and healthy > hist.get("healthy_cells_per_s", 0):
        hist.update({
            "healthy_cells_per_s": round(healthy),
            "kernel_cells_per_s": round(kernel) if kernel else None,
            "git_rev": _git_rev(),
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        })
        changed = True
    if tp_healthy is not None and tp_healthy > hist.get(
        "tp_healthy_cells_per_s", 0
    ):
        hist.update({
            "tp_healthy_cells_per_s": round(tp_healthy),
            "tp_healthy_git_rev": _git_rev(),
            "tp_healthy_measured_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            ),
        })
        changed = True
    if not changed:
        return
    for path in (HISTORY_PATH, REPO_HISTORY_PATH):
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as handle:
                json.dump(hist, handle)
        except Exception:
            pass


def _history_fields() -> dict:
    """Labelled best-ever-healthy context, attached to EVERY artifact so a
    degraded capture is readable without PERFORMANCE.md."""
    hist = _load_history()
    if not hist:
        return {}
    fields = {
        "best_healthy_cells_per_s_ever": hist.get("healthy_cells_per_s"),
        "best_healthy_measured_at": hist.get("measured_at"),
        "best_healthy_git_rev": hist.get("git_rev"),
    }
    if hist.get("tp_healthy_cells_per_s"):
        fields["best_tp_healthy_cells_per_s_ever"] = hist[
            "tp_healthy_cells_per_s"
        ]
        fields["best_tp_healthy_measured_at"] = hist.get(
            "tp_healthy_measured_at"
        )
        fields["best_tp_healthy_git_rev"] = hist.get("tp_healthy_git_rev")
    return fields


def _run_device_subprocess():
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-json"],
            capture_output=True, text=True, timeout=DEVICE_TIMEOUT_S,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main() -> None:
    if "--device-json" in sys.argv:
        print(json.dumps(device_section()))
        return
    reads, haps = make_workload()
    cpu_cells_per_s = bench_cpu_baseline(reads, haps)
    dev = _run_device_subprocess()
    if dev is None:
        # wedged relay: no device number is obtainable; report an
        # interpretable artifact instead of hanging the round
        print(json.dumps({
            "metric": "pairhmm_cell_updates_per_s_per_chip",
            "value": 0,
            "unit": "cells/s",
            "vs_baseline": 0.0,
            "reference_equivalent_scalar_cells_per_s": round(
                REFERENCE_SCALAR_CELLS_PER_S
            ),
            "current_cpu_engine_cells_per_s": round(cpu_cells_per_s),
            "relay_wedged": True,
            "relay_degraded": True,
            "floor_ok": None,
            "kernel_floor_ok": None,
            "workload": f"relay unresponsive (device section produced no "
                        f"result in {DEVICE_TIMEOUT_S:.0f}s); not an "
                        "engine regression (see PERFORMANCE.md caveats)",
            **_history_fields(),
        }))
        return
    relay_op_ms = dev["relay_op_ms"]
    best = dev["best"]
    healthy = best.get("healthy")
    tp_healthy = best.get("tp_healthy")
    degraded = best.get("degraded")
    rounds = dev["rounds"]
    arms = dev.get("arms") or {}
    kernel_cells_per_s = dev["kernel"]
    _update_history(healthy, kernel_cells_per_s, tp_healthy=tp_healthy)
    e2e_s = dev["e2e_s"] if dev["e2e_s"] is not None else float("nan")
    # CI-style floor on the HEALTHY-phase sustained number; a run that
    # never saw a healthy phase reports relay_degraded=true and does not
    # fail the floor (a throttled relay is not an engine regression).
    floor = 30e9
    kernel_floor = 120e9
    headline = next(
        (v for v in (healthy, tp_healthy, degraded) if v is not None), 0.0
    )
    result = {
        "metric": "pairhmm_cell_updates_per_s_per_chip",
        "value": round(headline),
        "unit": "cells/s",
        # north-star ratio vs the FROZEN reference-equivalent scalar engine
        # (round-comparable; BASELINE.json asks for >50x vs the reference
        # CPU).  vs_current_cpu_engine divides by the repo's own best CPU
        # engine, re-measured each run — an honest self-comparison that
        # shrinks as the CPU engine improves.
        "vs_baseline": round(headline / REFERENCE_SCALAR_CELLS_PER_S, 2),
        "reference_equivalent_scalar_cells_per_s": round(
            REFERENCE_SCALAR_CELLS_PER_S
        ),
        "vs_current_cpu_engine": round(headline / cpu_cells_per_s, 2),
        "current_cpu_engine_cells_per_s": round(cpu_cells_per_s),
        # all three phase buckets, separately: round-over-round comparisons
        # must compare like phases (null = that class never occurred
        # in-run).  tp_healthy = latency-degraded but op-THROUGHPUT-fine
        # (burst probe <= 2.5 ms): the depth-3 pipelined production stream
        # hides latency entirely, so this is a valid sustained-capability
        # measurement for phases where the strict latency gate never opens
        # (observed lasting hours).
        "sustained_healthy_cells_per_s": (
            round(healthy) if healthy is not None else None
        ),
        "sustained_tp_healthy_cells_per_s": (
            round(tp_healthy) if tp_healthy is not None else None
        ),
        "sustained_degraded_cells_per_s": (
            round(degraded) if degraded is not None else None
        ),
        "sample_rounds": rounds,
        "kernel_only_cells_per_s": round(kernel_cells_per_s),
        "sustained_floor_cells_per_s": round(floor),
        # tri-state (VERDICT r3 weak #1): true/false only when a healthy
        # sample exists; null = "unknown, no healthy window this run" so a
        # degraded capture can't vacuously pass the floor
        "floor_ok": (None if healthy is None else bool(healthy >= floor)),
        "floor_ok_tp_healthy": (
            None if tp_healthy is None else bool(tp_healthy >= floor)
        ),
        # kernel-only regression guard: catches kernel slowdowns even when
        # the whole run sat in a degraded relay phase
        "kernel_floor_cells_per_s": round(kernel_floor),
        "kernel_floor_ok": bool(kernel_cells_per_s >= kernel_floor),
        # relay health context: ~4-8ms = healthy phase; 25+ms = degraded
        # phase (hours-long observed) that scales every number above
        "relay_op_ms": round(relay_op_ms, 1),
        # pipelined per-op cost: separates latency-throttled phases (the
        # stream still flows) from op-throughput-throttled ones (it stalls)
        "relay_burst_op_ms": round(dev.get("relay_burst_op_ms", -1.0), 2),
        # bulk-transfer throughput (8 MB u8 round trip, best-of-3): the
        # bandwidth term of per-group dispatch overhead, separate from the
        # flat per-op costs above
        "relay_put_mbps": round(dev.get("relay_put_mbps", -1.0), 1),
        "relay_get_mbps": round(dev.get("relay_get_mbps", -1.0), 1),
        "relay_degraded": bool(healthy is None),
        # true only when op THROUGHPUT was also throttled all run (no
        # latency-healthy AND no tp_healthy sample)
        "relay_throughput_degraded": bool(
            healthy is None and tp_healthy is None
        ),
        # per-arm dispatch A/B (unfused vs fused-4 launches), per phase
        # bucket — phase-relative valid even degraded (arms interleave
        # within each round, so both pay the same per-op relay cost)
        "dispatch_arms": {
            ph: {a: round(v) for a, v in bucket.items()}
            for ph, bucket in arms.items() if bucket
        },
        "e2e_chrM_wall_s": round(e2e_s, 3),
        "workload": (
            f"16 region jobs of {N_READS}x{N_HAPS} pairs each per round, "
            f"pipelined submit/drain stream, {READ_LEN}bp reads, "
            f"{HAP_LEN}bp haps; best over dispatch arms "
            f"({', '.join(ARM_NAMES)}), best round of {rounds}"
        ),
    }
    # best-ever healthy context on EVERY artifact: round-over-round readers
    # can always separate relay phase from engine state
    result.update(_history_fields())
    print(json.dumps(result))


if __name__ == "__main__":
    main()
