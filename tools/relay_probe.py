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

    # pipelined burst: per-op cost with 32 dependent ops enqueued and ONE
    # sync — the relay's op THROUGHPUT, which is what the production
    # submit/drain stream rides (latency phases that read 20+ ms above can
    # still stream at 60-70 Gcells/s when this is low)
    burst = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = x
        for _ in range(32):
            y = f(y)
        _ = jax.device_get(jnp.sum(y))
        burst = min(burst, (time.perf_counter() - t0) / 32)

    print(
        json.dumps(
            {
                "platform": jax.default_backend(),
                "n_devices": len(devices),
                "devices_s": round(t_devices, 2),
                "first_roundtrip_s": round(t_first, 2),
                "steady_op_ms": round(best * 1e3, 1),
                "burst_op_ms": round(burst * 1e3, 2),
                "healthy": bool(best * 1e3 < 12.0 and t_first < 5.0),
            }
        )
    )


if __name__ == "__main__":
    main()
