"""Multi-device scaling check for the sharded likelihood step.

Runs the (data, hap)-mesh likelihood step of parallel/sharded_step.py over
1/2/4/8 devices with a fixed per-device workload (weak scaling) and reports
step time — on virtual CPU devices this validates the sharding/collective
mechanism; on a real pod slice the same code measures ICI scaling
efficiency (BASELINE.json north star: >=80% at 2 hosts).

Usage: [JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python tools/scaling_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    # config must change BEFORE the first backend use (jax.devices() pins it)
    try:
        from jax._src import xla_bridge

        backend_up = bool(xla_bridge._backends)
    except Exception:
        backend_up = False
    if not backend_up:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass
    n_avail = len(jax.devices())
    if n_avail < 2:
        print(
            f"WARNING: only {n_avail} device visible — scaling sweep "
            "degenerates to the 1-device row"
        )
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
    from gatk_hc_tpu.parallel.sharded_step import (
        make_mesh, make_sharded_likelihood_step, shard_inputs,
    )

    trans = transition_constants(ord("I"), ord("+"))
    r_pad, c_pad = 32, 128
    reads_per_dev, n_haps = 256, 8
    use_pallas = jax.default_backend() in ("tpu", "axon")
    rng = np.random.default_rng(0)

    if not use_pallas:
        print(
            "NOTE: virtual CPU devices share one host's cores — weak-scaling "
            "efficiency is expected to look like 1/N here; this validates "
            "the sharding mechanism, the efficiency number is only "
            "meaningful on a real pod slice."
        )
    base = None
    for n_dev in (1, 2, 4, 8):
        if n_dev > n_avail:
            break
        mesh = make_mesh(n_dev, hap_parallel=1)
        n_reads = reads_per_dev * n_dev  # weak scaling: fixed work/device
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
        step = make_sharded_likelihood_step(
            mesh, trans, r_pad, c_pad, use_pallas, DEFAULT_CONFIG
        )
        specs = (
            P("data", None), P("data", None), P("data", None), P("data"),
            P("hap", None), P("hap"), P("hap"),
        )
        args = shard_inputs(mesh, (rc, omq, q3, rl, hc, hl, iy), specs)
        out = step(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        cells = n_reads * n_haps * (r_pad - 2) * (c_pad - 8)
        if base is None:
            base = dt
        eff = base / dt  # weak scaling: ideal keeps step time flat
        print(
            f"devices={n_dev}: {dt*1e3:7.2f} ms/step  "
            f"{cells/dt/1e9:6.2f} Gcells/s  weak-scaling eff {eff*100:5.1f}%"
        )


if __name__ == "__main__":
    main()
