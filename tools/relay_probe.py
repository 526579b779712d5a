"""Quick relay/TPU health probe.

Prints one JSON line: device enumeration time, first program roundtrip,
and steady-state op+sync latency.  Reference points on this environment:
healthy ~4-8 ms steady / <2 s first; degraded phases (minutes to hours)
measure 25+ ms steady and 60+ s first roundtrips; a wedged relay times
out entirely.  Run before trusting any benchmark number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/relay_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    devices = jax.devices()
    t_devices = time.perf_counter() - t0

    t0 = time.perf_counter()
    x = jax.device_put(np.ones((1024, 480), np.float32))
    f = jax.jit(lambda a: a * 2 + 1)
    _ = jax.device_get(jnp.sum(f(x)))
    t_first = time.perf_counter() - t0

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = jax.device_get(jnp.sum(f(x)))
        best = min(best, time.perf_counter() - t0)

    fields = {
        "platform": jax.default_backend(),
        "n_devices": len(devices),
        "devices_s": round(t_devices, 2),
        "first_roundtrip_s": round(t_first, 2),
        "steady_op_ms": round(best * 1e3, 1),
        "healthy": bool(best * 1e3 < 12.0 and t_first < 5.0),
    }
    # print the latency-only line FIRST: callers run this under
    # `timeout 300 ... | tail -1`, and in a deeply degraded phase the
    # burst chain below can outlive the timeout — an alive relay must
    # still be reported as alive
    print(json.dumps(fields), flush=True)

    # pipelined burst: per-op cost with dependent ops enqueued and ONE
    # sync — the relay's op THROUGHPUT, which is what the production
    # submit/drain stream rides (latency phases that read 20+ ms above can
    # still stream at 60-70 Gcells/s when this is low).  Shared with
    # bench.py (classification thresholds live in bench.classify_phase).
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from bench import probe_relay_burst_op_ms

    burst_ms = (
        probe_relay_burst_op_ms()
        if best * 1e3 <= 50.0
        else probe_relay_burst_op_ms(depth=8, reps=1)
    )
    fields["burst_op_ms"] = round(burst_ms, 2)
    print(json.dumps(fields), flush=True)


if __name__ == "__main__":
    main()
