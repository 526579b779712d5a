"""Scaling-efficiency measurement: production runner + multihost DCN.

Emits ONE JSON line with three sections:

* ``runner_weak_scaling``: the production PallasPairHMMRunner dispatching a
  fixed per-device workload across 1/2/4/8 devices of a mesh (round-robin
  group placement, exactly the call_batched path).  Ideal weak scaling
  keeps wall time flat; efficiency = t(1) / t(N).
* ``sharded_step_weak_scaling``: the shard_map (data, hap) likelihood step.
* ``dcn_2proc``: a real 2-process jax.distributed run of run_multihost over
  the chrM fixture vs the same single-process run; strong-scaling
  efficiency = t(1) / (2 * t(2)).

On virtual CPU devices (this CI host: one physical core) all devices share
one core, so compute-bound weak scaling degenerates toward 1/N — those
numbers validate the MECHANISM and measure the per-device orchestration
overhead; on a real pod slice the same script measures ICI/DCN efficiency
against the >=80% @ 2 hosts north star (BASELINE.json).

Usage: python tools/scaling_bench.py [--skip-dcn]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _ensure_devices(n: int) -> None:
    import jax

    try:
        from jax._src import xla_bridge

        backend_up = bool(xla_bridge._backends)
    except Exception:
        backend_up = False
    if not backend_up:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", n)
        except Exception:
            pass


def _runner_jobs(n_jobs: int, seed: int = 0):
    from gatk_hc_tpu.ops.runner import PairHMMJob

    rng = np.random.default_rng(seed)
    jobs = []
    for _ in range(n_jobs):
        hap = np.frombuffer(
            np.array([65, 67, 71, 84], np.uint8)[rng.integers(0, 4, 120)]
            .tobytes(),
            np.uint8,
        )
        reads = [
            (hap[s : s + 24].copy(), np.full(24, ord("I"), np.uint8))
            for s in rng.integers(0, 90, 16)
        ]
        jobs.append(PairHMMJob(reads, [hap, hap[:100].copy()]))
    return jobs


def bench_runner_weak_scaling(counts):
    """Production runner, one group per job via a small read budget; jobs
    per device fixed (weak scaling)."""
    import dataclasses

    import jax

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.runner import PallasPairHMMRunner

    jobs_per_dev = 8
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
        stripe_height=8, device_timeout_s=0.0,  # no failover in a benchmark
    )
    rows = {}
    for n_dev in counts:
        if n_dev > len(jax.devices()):
            break
        runner = PallasPairHMMRunner(
            cfg, pair_budget=128, devices=jax.devices()[:n_dev]
        )
        runner.READ_BUCKETS = (16,)
        runner.HAP_BUCKETS = (4,)
        runner.run(_runner_jobs(n_dev * jobs_per_dev))  # warm
        best = float("inf")
        for _ in range(3):
            jobs = _runner_jobs(n_dev * jobs_per_dev)
            t0 = time.perf_counter()
            runner.run(jobs)
            best = min(best, time.perf_counter() - t0)
        rows[n_dev] = best
    base = rows[min(rows)]
    return {
        "jobs_per_device": jobs_per_dev,
        "seconds": {str(k): round(v, 4) for k, v in rows.items()},
        "efficiency": {
            str(k): round(base / v, 3) for k, v in rows.items()
        },
    }


def bench_sharded_step_weak_scaling(counts):
    import jax
    import jax.numpy as jnp

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
    from gatk_hc_tpu.parallel.sharded_step import (
        HAP_SPECS, READ_SPECS, make_mesh, make_sharded_raw_step,
        shard_inputs,
    )

    trans = transition_constants(ord("I"), ord("+"))
    r_pad, c_pad = 32, 128
    reads_per_dev, n_haps = 256, 8
    use_pallas = jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)
    rows = {}
    for n_dev in counts:
        if n_dev > len(jax.devices()):
            break
        mesh = make_mesh(n_dev, hap_parallel=1)
        n_reads = reads_per_dev * n_dev
        hc = rng.integers(0, 4, (n_haps, c_pad)).astype(np.int32)
        hl = np.full(n_haps, c_pad - 8, np.int32)
        rc = np.stack(
            [hc[i % n_haps, 3 : 3 + r_pad] for i in range(n_reads)]
        ).astype(np.int32)
        q = np.float32(1e-4)
        omq = np.full((n_reads, r_pad), 1.0 - q, np.float32)
        q3 = np.full((n_reads, r_pad), q / 3.0, np.float32)
        rl = np.full(n_reads, r_pad - 2, np.int32)
        iy = (np.float32(2.0**120) / hl.astype(np.float32)).astype(np.float32)
        step = make_sharded_raw_step(
            mesh, trans, r_pad, c_pad, use_pallas, DEFAULT_CONFIG
        )
        args = shard_inputs(
            mesh, (rc, omq, q3, rl, hc, hl, iy), READ_SPECS + HAP_SPECS
        )
        jax.block_until_ready(step(*args))
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out)
        rows[n_dev] = (time.perf_counter() - t0) / 5
    base = rows[min(rows)]
    return {
        "reads_per_device": reads_per_dev,
        "seconds": {str(k): round(v, 4) for k, v in rows.items()},
        "efficiency": {
            str(k): round(base / v, 3) for k, v in rows.items()
        },
    }


_DCN_WORKER = r"""
import sys, time, resource
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.parallel.multihost import run_multihost
from gatk_hc_tpu.utils.logging import StageTimers
cfg = dataclasses.replace(
    DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
)
pid = int(sys.argv[1]); n = int(sys.argv[2])
timers = StageTimers()
t0 = time.perf_counter()
run_multihost({sam!r}, {fa!r}, None, cfg,
              coordinator={coord!r} if n > 1 else None,
              num_processes=n if n > 1 else None,
              process_id=pid if n > 1 else None,
              timers=timers)
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
print(f"WALL {{time.perf_counter()-t0:.3f}} "
      f"PARSE {{timers.totals.get('parse', 0.0):.3f}} RSS {{rss_mb:.0f}}")
"""


def bench_dcn_2proc(sam=None, fa=None):
    sam = sam or os.path.join(REPO, "fixtures", "chrM.sam")
    fa = fa or os.path.join(REPO, "fixtures", "chrM.fa")
    if not os.path.exists(sam):
        return None
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    def wall_of(outputs):
        for line in outputs.splitlines():
            if line.startswith("WALL "):
                parts = line.split()
                return {
                    "wall": float(parts[1]),
                    "parse": float(parts[3]),
                    "rss_mb": float(parts[5]),
                }
        raise RuntimeError(outputs[-2000:])

    # single process
    script = _DCN_WORKER.format(repo=REPO, sam=sam, fa=fa, coord="")
    out = subprocess.run(
        [sys.executable, "-c", script, "0", "1"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    m1 = wall_of(out.stdout)
    t1 = m1["wall"]
    # two processes over localhost DCN
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _DCN_WORKER.format(
        repo=REPO, sam=sam, fa=fa, coord=f"127.0.0.1:{port}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    metrics = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(stdout[-2000:])
        metrics.append(wall_of(stdout))
    t2 = max(m["wall"] for m in metrics)
    n_cores = os.cpu_count() or 1
    # expected ceiling: with fewer cores than processes the processes time-
    # slice one CPU (ceiling 1/n_proc x core count); with enough cores the
    # north star is >=0.8 (BASELINE.json)
    expected = min(1.0, n_cores / 2) * 0.8
    measured = t1 / (2 * t2)
    return {
        "t_1proc_s": round(t1, 3),
        "t_2proc_s": round(t2, 3),
        # strong scaling over a fixed workload: ideal halves the time
        "efficiency": round(measured, 3),
        "expected_efficiency": round(expected, 3),
        "efficiency_vs_expected": round(measured / expected, 3),
        # shard-parse health: with the per-process SAM shard parse each
        # process should parse ~half the bytes of the single-process run
        "parse_1proc_s": round(m1["parse"], 3),
        "parse_2proc_s": [round(m["parse"], 3) for m in metrics],
        "rss_1proc_mb": round(m1["rss_mb"]),
        "rss_2proc_mb": [round(m["rss_mb"]) for m in metrics],
        "note": f"{os.path.basename(sam)}, native engine, localhost DCN, "
                f"{n_cores} core(s): CPU-bound strong-scaling ceiling is "
                f"~{min(1.0, n_cores / 2):.2f} on this host",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-dcn", action="store_true")
    ap.add_argument("--sam", default=None, help="DCN fixture SAM override")
    ap.add_argument("--fa", default=None, help="DCN fixture FASTA override")
    args = ap.parse_args()

    _ensure_devices(8)
    import jax

    counts = (1, 2, 4, 8)
    result = {
        "platform": jax.default_backend(),
        "n_devices": len(jax.devices()),
        "runner_weak_scaling": bench_runner_weak_scaling(counts),
        "sharded_step_weak_scaling": bench_sharded_step_weak_scaling(counts),
    }
    if not args.skip_dcn:
        result["dcn_2proc"] = bench_dcn_2proc(args.sam, args.fa)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
