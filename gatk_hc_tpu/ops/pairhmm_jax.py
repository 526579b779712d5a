"""Batched PairHMM forward in pure jnp (device-agnostic reference engine).

Anti-diagonal formulation over padded pair batches: state arrays are
(B, R_pad+1) slices indexed by row; diagonal d holds cells (r, d-r).  Each
cell's fp expression tree is exactly the reference recurrence
(avx-pairhmm-template.h:183-198), so per-cell results are bit-comparable
with the NumPy oracle and the C++ engine; the final sum accumulates the last
row in column order like the reference's per-lane accumulators.

This engine exists to (a) cross-check the Pallas kernel, (b) run the full
pipeline anywhere JAX runs.  The Pallas kernel (pairhmm_pallas.py) is the
TPU production path.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import HCConfig
from ..utils.quality import (
    BASE_TABLE,
    INITIAL_CONSTANT_F32,
    MATCH_TO_MATCH_F32,
    PH2PR_F32,
    set_mm_prob,
)
from .batching import PairBatch, all_pairs, pack_pairs


def transition_constants(gop: int, gcp: int) -> Tuple[float, ...]:
    """Scalar transition probs (GOP/GCP are constant strings, sam.hpp:31-32,
    indexed raw-ASCII per the main-path quirk)."""
    i_q, c_q = gop & 127, gcp & 127
    p_mm = set_mm_prob(i_q, i_q, MATCH_TO_MATCH_F32)
    p_gapm = np.float32(1.0) - PH2PR_F32[c_q]
    p_mx = PH2PR_F32[i_q]
    p_xx = PH2PR_F32[c_q]
    p_my = PH2PR_F32[i_q]
    p_yy = PH2PR_F32[c_q]
    return (
        np.float32(p_mm),
        np.float32(p_gapm),
        np.float32(p_mx),
        np.float32(p_xx),
        np.float32(p_my),
        np.float32(p_yy),
    )


@functools.partial(jax.jit, static_argnames=("r_pad", "c_pad", "flush_denormals"))
def pairhmm_forward_batch(
    read_codes: jnp.ndarray,  # (B, R_pad) int32 base codes (A0 C1 T2 G3 N4)
    read_omq: jnp.ndarray,  # (B, R_pad) f32 1 - ph2pr[qual]   (host-computed)
    read_q3: jnp.ndarray,  # (B, R_pad) f32 ph2pr[qual] / 3    (host-computed)
    read_lens: jnp.ndarray,  # (B,) int32
    hap_codes: jnp.ndarray,  # (B, C_pad) int32
    hap_lens: jnp.ndarray,  # (B,) int32
    init_y: jnp.ndarray,  # (B,) f32 INITIAL_CONSTANT / hap_len (host-computed)
    trans: Tuple[jnp.ndarray, ...],  # 6 scalar f32
    r_pad: int,
    c_pad: int,
    flush_denormals: bool = False,
) -> jnp.ndarray:
    """Raw forward probabilities (B,) f32, scaled by INITIAL_CONSTANT.

    Divisions (q/3, INITIAL/haplen) happen on the HOST: TPU f32 division is
    reciprocal-based and can differ from IEEE by an ulp, while mul/add/select
    chains measured exact vs the CPU engines (and the TPU flushes denormals
    like the reference's FTZ mode).
    """
    p_mm, p_gapm, p_mx, p_xx, p_my, p_yy = [jnp.float32(t) for t in trans]
    B = read_codes.shape[0]
    R, C = r_pad, c_pad
    f32 = jnp.float32

    min_normal = f32(np.ldexp(1.0, -126))
    if flush_denormals:
        ftz = lambda x: jnp.where(jnp.abs(x) < min_normal, f32(0.0), x)
    else:
        ftz = lambda x: x

    # row-indexed vectors, index 0 = boundary row
    zero_col = jnp.zeros((B, 1), f32)
    omq = jnp.concatenate([zero_col, read_omq], axis=1)  # (B, R+1)
    q3 = jnp.concatenate([zero_col, read_q3], axis=1)
    rcodes = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), read_codes], axis=1
    )  # (B, R+1)

    r_idx = jnp.arange(R + 1, dtype=jnp.int32)  # (R+1,)

    def up(a: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([zero_col, a[:, :-1]], axis=1)

    def set_row0(a: jnp.ndarray, value: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([value[:, None], a[:, 1:]], axis=1)

    zeros = jnp.zeros((B, R + 1), f32)
    zero_b = jnp.zeros((B,), f32)
    Y0 = set_row0(zeros, init_y)

    def step(carry, d):
        M2, X2, Y2, M1, X1, Y1, acc_m, acc_x = carry
        c_of_r = d - r_idx  # (R+1,)
        hap_idx = jnp.clip(c_of_r - 1, 0, C - 1)
        hapc = hap_codes[:, hap_idx]  # (B, R+1)
        match = (rcodes == hapc) | (rcodes == 4) | (hapc == 4)
        distm = jnp.where(match, omq, q3)

        t1 = ftz(up(M2) * p_mm)
        t2 = ftz(up(X2) * p_gapm)
        t3 = ftz(up(Y2) * p_gapm)
        M_new = ftz(ftz(ftz(t1 + t2) + t3) * distm)
        X_new = ftz(ftz(up(M1) * p_mx) + ftz(up(X1) * p_xx))
        Y_new = ftz(ftz(M1 * p_my) + ftz(Y1 * p_yy))

        M_new = set_row0(M_new, zero_b)
        X_new = set_row0(X_new, zero_b)
        Y_new = set_row0(Y_new, init_y)

        # capture last-row cells (r == rlen) while inside 1 <= c <= clen
        last = read_lens[:, None]  # (B,1)
        m_last = jnp.take_along_axis(M_new, last, axis=1)[:, 0]
        x_last = jnp.take_along_axis(X_new, last, axis=1)[:, 0]
        c_last = d - read_lens  # (B,)
        in_range = (c_last >= 1) & (c_last <= hap_lens)
        acc_m = acc_m + jnp.where(in_range, m_last, f32(0.0))
        acc_x = acc_x + jnp.where(in_range, x_last, f32(0.0))
        return (M1, X1, Y1, M_new, X_new, Y_new, acc_m, acc_x), None

    carry = (zeros, zeros, Y0, zeros, zeros, Y0, zero_b, zero_b)
    diags = jnp.arange(2, R + C + 1, dtype=jnp.int32)
    carry, _ = jax.lax.scan(step, carry, diags)
    return carry[6] + carry[7]


def batch_to_device_args(batch: PairBatch):
    read_codes = BASE_TABLE[batch.read_bases].astype(np.int32)
    read_q = PH2PR_F32[(batch.read_quals & 127).astype(np.int64)].astype(np.float32)
    read_omq = (np.float32(1.0) - read_q).astype(np.float32)
    read_q3 = (read_q / np.float32(3.0)).astype(np.float32)
    hap_codes = BASE_TABLE[batch.hap_bases].astype(np.int32)
    init_y = (INITIAL_CONSTANT_F32 / batch.hap_lens.astype(np.float32)).astype(
        np.float32
    )
    return (read_codes, read_omq, read_q3, batch.read_lens, hap_codes,
            batch.hap_lens, init_y)


def jax_pairhmm_engine(cfg: HCConfig, forward_fn: Callable = pairhmm_forward_batch):
    """Engine over padded pair batches; rescue through the host f64 path."""
    from .pairhmm_oracle import finalize_log10

    trans = transition_constants(cfg.gop_char, cfg.gcp_char)

    def engine(reads, haplotypes):
        from .engines import _to_arrays

        read_arrays, hap_arrays = _to_arrays(reads, haplotypes)
        n_r, n_h = len(read_arrays), len(hap_arrays)
        pair_read, pair_hap = all_pairs(n_r, n_h)
        batch = pack_pairs(
            read_arrays,
            hap_arrays,
            pair_read,
            pair_hap,
            cfg.read_pad_buckets,
            cfg.hap_pad_buckets,
            cfg.pair_batch,
        )
        args = batch_to_device_args(batch)
        probs = np.asarray(
            forward_fn(
                *[jnp.asarray(a) for a in args],
                trans,
                r_pad=batch.shape[1],
                c_pad=batch.shape[2],
            )
        )[: batch.n_valid]

        def rescue(indices):
            return _host_f64_rescue(cfg, read_arrays, hap_arrays,
                                    pair_read[indices], pair_hap[indices])

        return finalize_log10(
            probs, rescue, mode=cfg.f64_rescue
        ).reshape(n_r, n_h)

    return engine


def _host_f64_rescue(cfg, read_arrays, hap_arrays, pair_read, pair_hap):
    """f64 rescue on the host: native library if available, else the oracle."""
    try:
        from .. import native

        if native.available():
            stride_r = max(len(b) for b, _ in read_arrays)
            stride_h = max(len(h) for h in hap_arrays)
            rb = np.zeros((len(read_arrays), stride_r), dtype=np.uint8)
            rq = np.zeros_like(rb)
            rl = np.zeros(len(read_arrays), dtype=np.int32)
            for i, (b, qv) in enumerate(read_arrays):
                rb[i, : len(b)] = b
                rq[i, : len(qv)] = qv
                rl[i] = len(b)
            hb = np.zeros((len(hap_arrays), stride_h), dtype=np.uint8)
            hl = np.zeros(len(hap_arrays), dtype=np.int32)
            for j, h in enumerate(hap_arrays):
                hb[j, : len(h)] = h
                hl[j] = len(h)
            return native.pairhmm_raw_native(
                rb, rq, rl, hb, hl,
                pair_read.astype(np.int32), pair_hap.astype(np.int32),
                cfg.gop_char, cfg.gcp_char, np.float64,
            )
    except Exception:
        pass
    from .pairhmm_oracle import pairhmm_prob

    return np.array(
        [
            pairhmm_prob(
                read_arrays[r][0], read_arrays[r][1], hap_arrays[h],
                cfg.gop_char, cfg.gcp_char, np.float64,
            )
            for r, h in zip(pair_read, pair_hap)
        ],
        dtype=np.float64,
    )
