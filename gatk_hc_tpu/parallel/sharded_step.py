"""Multi-chip sharded likelihood step.

The PairHMM pair grid (reads × haplotypes) decomposes naturally in 2D:

* the **'data'** mesh axis shards READS (each device holds a row block of
  the pair matrix) — this is the scale-out axis for read streaming;
* the **'hap'** mesh axis shards HAPLOTYPES (column blocks) — useful when
  regions carry many candidate haplotypes.

Each device computes its local (reads_shard × haps_shard) pair block with
the same forward kernel used single-chip, then the likelihood
normalization's per-read best (intel_pairhmm.hpp:24-46) runs as a
``jax.lax.pmax`` over the 'hap' axis; counters reduce with ``psum``.
Collectives ride ICI; no NCCL/MPI analogue exists in the reference (it is
OpenMP-only) — this subsystem is new, per SURVEY.md §5.

Works on any mesh (virtual CPU devices in tests, TPU pods in production).

RELATION TO THE PRODUCTION MULTI-CHIP PATH (read before extending): the
production driver scales across a host's chips by round-robining
independent dispatch groups in ops/runner.py::PallasPairHMMRunner — no
collectives, results bit-identical to single-chip, and the exact host
float64 normalize/rescue chain applies.  THIS module is the shard_map
alternative for pod-scale deployments where normalization must stay on
device next to the kernel: its normalization is a float32 approximation
(floor at 1e-45, f32 log10) of that host chain, adequate because the
floor/keep decisions feed the same downstream filters, but NOT
bit-identical.  Both paths are compile-validated by
__graft_entry__.dryrun_multichip; only the runner path writes VCFs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import HCConfig
from ..utils.quality import LOG10_INITIAL_CONSTANT_F32


def make_mesh(
    n_devices: Optional[int] = None, hap_parallel: int = 1
) -> Mesh:
    """(data, hap) mesh over the first n devices."""
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    if len(devices) % hap_parallel != 0:
        raise ValueError("device count must divide by hap_parallel")
    grid = devices.reshape(len(devices) // hap_parallel, hap_parallel)
    return Mesh(grid, ("data", "hap"))


def _forward_local(
    rc, omq, q3, rl, hc, hl, iy, trans, r_pad, c_pad, use_pallas, stripe=32
):
    """All-pairs forward for the local read/hap shards -> (nr, nh) raw f32."""
    nr, nh = rc.shape[0], hc.shape[0]
    pair_read = jnp.repeat(jnp.arange(nr, dtype=jnp.int32), nh)
    pair_hap = jnp.tile(jnp.arange(nh, dtype=jnp.int32), nr)
    rc_p = jnp.take(rc, pair_read, axis=0)
    omq_p = jnp.take(omq, pair_read, axis=0)
    q3_p = jnp.take(q3, pair_read, axis=0)
    rl_p = jnp.take(rl, pair_read)
    hc_p = jnp.take(hc, pair_hap, axis=0)
    hl_p = jnp.take(hl, pair_hap)
    iy_p = jnp.take(iy, pair_hap)
    if use_pallas:
        from ..ops.pairhmm_pallas import _pallas_forward

        probs = _pallas_forward(
            rc_p, omq_p, q3_p, rl_p, hc_p, hl_p, iy_p, trans,
            r_pad, c_pad, min(stripe, r_pad), False,
        )
    else:
        from ..ops.pairhmm_jax import pairhmm_forward_batch

        probs = pairhmm_forward_batch(
            rc_p, omq_p, q3_p, rl_p, hc_p, hl_p, iy_p, trans,
            r_pad=r_pad, c_pad=c_pad,
        )
    return probs.reshape(nr, nh)


def make_sharded_likelihood_step(
    mesh: Mesh,
    trans: Tuple,
    r_pad: int,
    c_pad: int,
    use_pallas: bool,
    cfg: HCConfig,
):
    """jitted (reads, haps) -> (log-lik matrix floored at best-4.5, keep mask)
    with reads sharded over 'data' and haps sharded over 'hap'."""
    from jax import shard_map

    max_alt_diff = jnp.float32(cfg.max_best_alt_likelihood_difference)

    def local_step(rc, omq, q3, rl, hc, hl, iy):
        probs = _forward_local(
            rc, omq, q3, rl, hc, hl, iy, trans, r_pad, c_pad, use_pallas,
            stripe=cfg.stripe_height,
        )
        # f32 log10 likelihood (device-side normalization path; the exact
        # host path remains available through ops/runner.py)
        lik = jnp.log10(jnp.maximum(probs, jnp.float32(1e-45))) - jnp.float32(
            LOG10_INITIAL_CONSTANT_F32
        )
        local_best = jnp.max(lik, axis=1)  # (nr_local,)
        best = jax.lax.pmax(local_best, "hap")  # collective over hap shards
        floored = jnp.maximum(lik, (best + max_alt_diff)[:, None])
        threshold = (
            jnp.minimum(
                jnp.float32(cfg.max_expected_error_per_read),
                jnp.ceil(rl.astype(jnp.float32) * cfg.expected_error_rate_per_base),
            )
            * jnp.float32(cfg.log10_quality_per_base)
        )
        keep = best >= threshold
        # progress counter: replicated scalar, returned as rank-1
        n_kept = jax.lax.psum(keep.sum(), "data")[None]
        return floored, keep, n_kept

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("data", None), P("data", None), P("data", None), P("data"),
            P("hap", None), P("hap"), P("hap"),
        ),
        out_specs=(P("data", "hap"), P("data"), P(None)),
        check_vma=False,
    )
    return jax.jit(step)


def shard_inputs(mesh: Mesh, arrays, specs):
    """Place host arrays with the given PartitionSpecs."""
    return [
        jax.device_put(a, NamedSharding(mesh, spec))
        for a, spec in zip(arrays, specs)
    ]
