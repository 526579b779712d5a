"""PairHMM forward as TPU Pallas kernels — the production device path.

Two kernel designs (TPU-first, cf. SURVEY.md §7 step 5), bit-identical to
each other and to the C++/NumPy oracles on TPU hardware:

* **Pair-per-element (production, `_kernel_ppe`/`_kernel_ppe2`).**  Every
  VPU element (sublane, lane) owns ONE (read, hap) pair — 1024 pairs per
  grid block — and sweeps its DP matrix row-major: no cross-sublane traffic
  at all, no anti-diagonal ramp waste.  Row-above M/X/Y live in C-deep VMEM
  buffers, left/diagonal cells in registers; read rows stream from HBM via
  double-buffered async DMA; base match is one AND+compare on one-hot codes
  (N=0xF matches anything); the inner loop unrolls 32 columns; the default
  two-row variant sweeps rows r/r+1 together so the lower row reads the
  upper row's fresh cells from registers.
* **Striped anti-diagonal (`_kernel`).**  128 pairs on lanes, rows in
  sublane stripes of height H swept by an anti-diagonal wavefront with a
  VMEM carry buffer — the reference AVX kernel's dependency structure
  (avx-pairhmm-template.h:200-209) vectorized across pairs.  Kept as the
  second implementation and used in interpret mode (XLA:CPU FMA
  contraction perturbs the larger ppe program by 1 ulp; on real TPUs both
  kernels are exact).

**Exact fp semantics.**  Every cell evaluates the reference recurrence with
separate mul/add (TPU measured unfused), divisions are precomputed on host
(TPU f32 divide is reciprocal-based), and the TPU's flush-to-zero matches
the reference's FTZ mode.  The final sum accumulates the last row in column
order.  Shapes are static per (R_pad, C_pad) bucket; XLA compiles a handful
of variants reused across all regions.

Striped carry-buffer index map (stripe height H, steps t = 1..C+H):
  carryM/X[j] = previous stripe's last-row M/X at column j-(H-1)
  carryY[j]   = previous stripe's last-row Y at column j-H
  reads at j = t+H, writes at j = t  (read-before-write per index)
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import HCConfig
from .batching import PairBatch, all_pairs, pack_pairs
from .pairhmm_jax import batch_to_device_args, transition_constants

LANES = 128
_PPE_UNROLL = 32  # columns per inner-loop iteration in the ppe kernel
# Kernel selection (default algo and ppe row count) is routed through
# HCConfig.pallas_algo / HCConfig.ppe_rows — env overrides are validated
# there at import (config._env_choice), not read as module globals here.


def _kernel(
    trans_ref,  # (1, 8) f32 SMEM: p_mm, p_gapm, p_mx, p_xx, p_my, p_yy, 0, 0
    rs_ref,  # (R, L) i32 read base codes, transposed
    omq_ref,  # (R, L) f32 1 - q
    q3_ref,  # (R, L) f32 q / 3
    hap_ref,  # (C, L) i32 hap base codes, transposed
    rlen_ref,  # (1, L) i32
    clen_ref,  # (1, L) i32
    inity_ref,  # (1, L) f32
    out_ref,  # (1, L) f32 raw forward probability
    carry_ref,  # (3, C + 2H + 1, L) f32 VMEM scratch: M, X, Y carries
    *,
    r_pad: int,
    c_pad: int,
    stripe: int,
):
    H = stripe
    R, C, L = r_pad, c_pad, LANES
    f32 = jnp.float32

    p_mm = trans_ref[0, 0]
    p_gapm = trans_ref[0, 1]
    p_mx = trans_ref[0, 2]
    p_xx = trans_ref[0, 3]
    p_my = trans_ref[0, 4]
    p_yy = trans_ref[0, 5]

    init_y = inity_ref[...]  # (1, L)
    rlen = rlen_ref[...]  # (1, L)
    clen = clen_ref[...]  # (1, L)

    # derive zeros from loaded data so loop-carried vectors have a concrete
    # (non-replicated) layout — Mosaic rejects replicated-constant carries
    zeros = omq_ref[0:H, :] * f32(0.0)
    izeros = rs_ref[0:H, :] * 0
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (H, L), 0)
    is_row0 = row_iota == 0

    # initialize carries: M/X zero, Y init_y everywhere (row-0 boundary)
    carry_ref[0] = jnp.zeros((C + 2 * H + 1, L), f32)
    carry_ref[1] = jnp.zeros((C + 2 * H + 1, L), f32)
    carry_ref[2] = jnp.broadcast_to(init_y, (C + 2 * H + 1, L))

    def insert_row0(rolled, value_row):  # value_row: (1, L)
        return jnp.where(is_row0, jnp.broadcast_to(value_row, (H, L)), rolled)

    clen_b = jnp.broadcast_to(clen, (H, L))
    rlen_b = jnp.broadcast_to(rlen, (H, L))
    n_stripes = R // H

    def stripe_body(s, accs):
        acc_m, acc_x = accs
        rs_s = rs_ref[pl.ds(s * H, H), :]  # (H, L)
        omq_s = omq_ref[pl.ds(s * H, H), :]
        q3_s = q3_ref[pl.ds(s * H, H), :]
        # matrix row of sublane i in this stripe is s*H + i + 1
        mat_row = row_iota + (s * H + 1)
        capture_row = mat_row == rlen_b

        Ms1_init = insert_row0(zeros, carry_ref[0, pl.ds(H, 1), :])
        Xs1_init = insert_row0(zeros, carry_ref[1, pl.ds(H, 1), :])
        # stripe 0: row-0 boundary Y(0, 0) = init_y enters via Ys2
        Ys2_init = jnp.where(
            (s == 0) & is_row0, jnp.broadcast_to(init_y, (H, L)), zeros
        )

        def step(t, state):
            (Ms2, Xs2, Ys2, Ms1, Xs1, Mu1, Yu1, hw, a_m, a_x) = state
            # hap window: hw[i] = hap code at column t - i
            hw = insert_row0(
                pltpu.roll(hw, shift=1, axis=0),
                hap_ref[pl.ds(t - 1, 1), :],
            )
            match = (rs_s == hw) | (rs_s == 4) | (hw == 4)
            distm = jnp.where(match, omq_s, q3_s)

            t1 = Ms2 * p_mm
            t2 = Xs2 * p_gapm
            t3 = Ys2 * p_gapm
            M_t = ((t1 + t2) + t3) * distm
            X_t = Ms1 * p_mx + Xs1 * p_xx
            Y_t = Mu1 * p_my + Yu1 * p_yy

            # capture last-row cells while 1 <= c <= clen
            c_of_row = t - row_iota
            take = capture_row & (c_of_row >= 1) & (c_of_row <= clen_b)
            a_m = a_m + jnp.where(take, M_t, f32(0.0))
            a_x = a_x + jnp.where(take, X_t, f32(0.0))

            # shifts with carry through VMEM (the reference's _vector_shift
            # schedule: shift M_t, X_t, and the OLD unshifted Y_t_1)
            def shift(vec, buf_idx):
                carry_in = carry_ref[buf_idx, pl.ds(t + H, 1), :]  # (1, L)
                carry_ref[buf_idx, pl.ds(t, 1), :] = vec[H - 1 : H, :]
                return insert_row0(pltpu.roll(vec, shift=1, axis=0), carry_in)

            Ms_new = shift(M_t, 0)
            Xs_new = shift(X_t, 1)
            Ys_new = shift(Yu1, 2)

            return (Ms1, Xs1, Ys_new, Ms_new, Xs_new, M_t, Y_t, hw, a_m, a_x)

        state = (
            zeros, zeros, Ys2_init,  # Ms2, Xs2, Ys2
            Ms1_init, Xs1_init,  # Ms1, Xs1
            zeros, zeros,  # Mu1 (unshifted M_{t-1}), Yu1
            izeros,  # hap window
            acc_m, acc_x,
        )
        state = jax.lax.fori_loop(1, C + H + 1, step, state)
        return (state[8], state[9])

    acc_m, acc_x = jax.lax.fori_loop(0, n_stripes, stripe_body, (zeros, zeros))
    total = acc_m + acc_x
    out_ref[...] = jnp.sum(total, axis=0, keepdims=True)


def _kernel_ppe(
    trans_ref,  # (1, 8) f32 SMEM
    rows_hbm,  # (nb, R, 3, 8, 128) i32 in ANY/HBM: [base mask | omq bits | q3 bits]
    hap_ref,  # (1, C, 8, 128) i32 hap base masks, VMEM block
    rlen_ref,  # (1, 8, 128) i32
    clen_ref,  # (1, 8, 128) i32
    inity_ref,  # (1, 8, 128) f32
    out_ref,  # (1, 8, 128) f32 raw forward probability
    mbuf,  # (C, 8, 128) f32 VMEM scratch: previous-row M
    xbuf,  # (C, 8, 128) f32 VMEM scratch: previous-row X
    ybuf,  # (C, 8, 128) f32 VMEM scratch: previous-row Y
    cbuf,  # (C, 8, 128) f32 VMEM scratch: 1.0 where column <= clen else 0.0
    rows_s,  # (2, 3, 8, 128) i32 VMEM scratch: double-buffered read rows
    sem,  # DMA semaphores (2,)
    *,
    r_pad: int,
    c_pad: int,
):
    """Pair-per-element PairHMM forward.

    Every VPU element (sublane, lane) owns ONE (read, hap) pair — 1024 pairs
    per grid block — and sweeps its DP matrix row-major.  Unlike the striped
    anti-diagonal kernel there is no cross-sublane traffic at all: the
    row-above values live in C-deep VMEM ring buffers, the left/diagonal
    cells in vector registers.  Read rows stream from HBM with a
    double-buffered async copy; base match uses one-hot codes (A=1, C=2,
    G=4, T=8, N=15) so the reference's 3-way wildcard test
    (pairhmm.hpp:98-111, N matches anything) is a single AND+compare.
    Per-cell fp semantics and the final row-major sum order are identical
    to the striped kernel (bit-exact vs the scalar oracle).
    """
    R, C = r_pad, c_pad
    f32 = jnp.float32
    i = pl.program_id(0)

    p_mm = trans_ref[0, 0]
    p_gapm = trans_ref[0, 1]
    p_mx = trans_ref[0, 2]
    p_xx = trans_ref[0, 3]
    p_my = trans_ref[0, 4]
    p_yy = trans_ref[0, 5]

    def row_dma(slot, r):  # r: matrix row 1..R
        return pltpu.make_async_copy(
            rows_hbm.at[i, r - 1], rows_s.at[slot], sem.at[slot]
        )

    row_dma(0, 1).start()

    inity = inity_ref[0]  # (8, 128)
    rlen_b = rlen_ref[0]
    clen_b = clen_ref[0]
    zeros = inity * f32(0.0)  # concrete layout for loop carries

    # row-0 boundary: M = X = 0, Y = init_y for every column
    mbuf[...] = jnp.zeros((C, 8, LANES), f32)
    xbuf[...] = jnp.zeros((C, 8, LANES), f32)
    ybuf[...] = jnp.broadcast_to(inity, (C, 8, LANES))
    # column-validity mask as f32 (row-invariant: hoisted out of the sweep;
    # M*1.0 and sm+0.0 are exact, so capture semantics are unchanged)
    col1 = (
        jax.lax.broadcasted_iota(jnp.int32, (C, 8, LANES), 0) + 1
    )  # matrix column of each slot
    cbuf[...] = jnp.where(col1 <= clen_b[None], f32(1.0), f32(0.0))

    def row_body(r, accs):
        a_m, a_x = accs
        slot = jax.lax.rem(r - 1, 2)

        @pl.when(r < R)
        def _():
            row_dma(jax.lax.rem(r, 2), r + 1).start()

        row_dma(slot, r).wait()
        rows = rows_s[pl.ds(slot, 1)][0]  # (3, 8, 128) i32
        rs_row = rows[0]
        omq_row = pltpu.bitcast(rows[1], f32)
        q3_row = pltpu.bitcast(rows[2], f32)
        row_mask = rlen_b == r
        # Y(0, c) = init_y is the only nonzero diagonal input at row 1
        y_diag0 = jnp.where(r == 1, inity, zeros)

        # unrolled by U columns per iteration: the scalar core's loop
        # overhead over R*C iterations otherwise dominates; batched (U,8,128)
        # buffer loads/stores amortize slice addressing too
        U = _PPE_UNROLL

        def chunk_body(k, st):
            m_diag, x_diag, y_diag, m_left, y_left, sm_m, sm_x = st
            c0 = k * U  # 0-based column offset; matrix columns c0+1..c0+U
            hw_u = hap_ref[0, pl.ds(c0, U)]  # (U, 8, 128)
            ma_u = mbuf[pl.ds(c0, U)]
            xa_u = xbuf[pl.ds(c0, U)]
            ya_u = ybuf[pl.ds(c0, U)]
            cm_u = cbuf[pl.ds(c0, U)]
            Ms, Xs, Ys = [], [], []
            for j in range(U):
                match = (rs_row & hw_u[j]) != 0
                distm = jnp.where(match, omq_row, q3_row)
                t1 = m_diag * p_mm
                t2 = x_diag * p_gapm
                t3 = y_diag * p_gapm
                M_t = ((t1 + t2) + t3) * distm
                X_t = ma_u[j] * p_mx + xa_u[j] * p_xx
                Y_t = m_left * p_my + y_left * p_yy
                sm_m = sm_m + M_t * cm_u[j]
                sm_x = sm_x + X_t * cm_u[j]
                Ms.append(M_t)
                Xs.append(X_t)
                Ys.append(Y_t)
                m_diag, x_diag, y_diag = ma_u[j], xa_u[j], ya_u[j]
                m_left, y_left = M_t, Y_t
            mbuf[pl.ds(c0, U)] = jnp.stack(Ms)
            xbuf[pl.ds(c0, U)] = jnp.stack(Xs)
            ybuf[pl.ds(c0, U)] = jnp.stack(Ys)
            return (m_diag, x_diag, y_diag, m_left, y_left, sm_m, sm_x)

        st = jax.lax.fori_loop(
            0, C // U, chunk_body,
            (zeros, zeros, y_diag0, zeros, zeros, zeros, zeros),
        )
        # capture this row's masked column sums iff it is the final row
        a_m = jnp.where(row_mask, st[5], a_m)
        a_x = jnp.where(row_mask, st[6], a_x)
        return (a_m, a_x)

    a_m, a_x = jax.lax.fori_loop(1, R + 1, row_body, (zeros, zeros))
    out_ref[0] = a_m + a_x


def _kernel_ppe2(
    trans_ref,  # (1, 8) f32 SMEM
    rows_hbm,  # (nb, R, 3, 8, 128) i32 in ANY/HBM
    hap_ref,  # (1, C, 8, 128) i32
    rlen_ref,  # (1, 8, 128) i32
    clen_ref,  # (1, 8, 128) i32
    inity_ref,  # (1, 8, 128) f32
    out_ref,  # (1, 8, 128) f32
    mbuf,  # (C, 8, 128) f32 scratch
    xbuf,
    ybuf,
    cbuf,
    rows_s,  # (2, 2, 3, 8, 128) i32 scratch: double-buffered row PAIRS
    sem,  # DMA semaphores (2,)
    *,
    r_pad: int,
    c_pad: int,
):
    """Two-row variant of _kernel_ppe: rows r and r+1 sweep columns together,
    so the lower row reads the upper row's fresh cells from REGISTERS —
    halving VMEM row-buffer traffic, hap loads, and DMA waits.  Per-cell
    arithmetic and capture order are identical (bit-exact)."""
    R, C = r_pad, c_pad
    f32 = jnp.float32
    i = pl.program_id(0)

    p_mm = trans_ref[0, 0]
    p_gapm = trans_ref[0, 1]
    p_mx = trans_ref[0, 2]
    p_xx = trans_ref[0, 3]
    p_my = trans_ref[0, 4]
    p_yy = trans_ref[0, 5]

    def pair_dma(slot, p):  # matrix rows 2p+1, 2p+2 -> input rows 2p, 2p+1
        return pltpu.make_async_copy(
            rows_hbm.at[i, pl.ds(2 * p, 2)], rows_s.at[slot], sem.at[slot]
        )

    pair_dma(0, 0).start()

    inity = inity_ref[0]
    rlen_b = rlen_ref[0]
    clen_b = clen_ref[0]
    zeros = inity * f32(0.0)

    mbuf[...] = jnp.zeros((C, 8, LANES), f32)
    xbuf[...] = jnp.zeros((C, 8, LANES), f32)
    ybuf[...] = jnp.broadcast_to(inity, (C, 8, LANES))
    col1 = jax.lax.broadcasted_iota(jnp.int32, (C, 8, LANES), 0) + 1
    cbuf[...] = jnp.where(col1 <= clen_b[None], f32(1.0), f32(0.0))

    U = _PPE_UNROLL

    def row_body(p, accs):
        a_m, a_x = accs
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < R // 2)
        def _():
            pair_dma(jax.lax.rem(p + 1, 2), p + 1).start()

        pair_dma(slot, p).wait()
        rows = rows_s[pl.ds(slot, 1)][0]  # (2, 3, 8, 128)
        rsA = rows[0, 0]
        omqA = pltpu.bitcast(rows[0, 1], f32)
        q3A = pltpu.bitcast(rows[0, 2], f32)
        rsB = rows[1, 0]
        omqB = pltpu.bitcast(rows[1, 1], f32)
        q3B = pltpu.bitcast(rows[1, 2], f32)
        rA = 2 * p + 1
        maskA = rlen_b == rA
        maskB = rlen_b == rA + 1
        # Y(0, 0..) = init_y is row 1's only nonzero diagonal input
        ydA0 = jnp.where(rA == 1, inity, zeros)

        def chunk_body(k, st):
            (mdA, xdA, ydA, mlA, ylA,
             mdB, xdB, ydB, mlB, ylB,
             smAm, smAx, smBm, smBx) = st
            c0 = k * U
            hw_u = hap_ref[0, pl.ds(c0, U)]
            ma_u = mbuf[pl.ds(c0, U)]
            xa_u = xbuf[pl.ds(c0, U)]
            ya_u = ybuf[pl.ds(c0, U)]
            cm_u = cbuf[pl.ds(c0, U)]
            MsB, XsB, YsB = [], [], []
            for j in range(U):
                hw = hw_u[j]
                cm = cm_u[j]
                # row A (above values come from the VMEM row buffers)
                distA = jnp.where((rsA & hw) != 0, omqA, q3A)
                t1 = mdA * p_mm
                t2 = xdA * p_gapm
                t3 = ydA * p_gapm
                MA = ((t1 + t2) + t3) * distA
                XA = ma_u[j] * p_mx + xa_u[j] * p_xx
                YA = mlA * p_my + ylA * p_yy
                smAm = smAm + MA * cm
                smAx = smAx + XA * cm
                # row B (above values are row A's fresh registers)
                distB = jnp.where((rsB & hw) != 0, omqB, q3B)
                u1 = mdB * p_mm
                u2 = xdB * p_gapm
                u3 = ydB * p_gapm
                MB = ((u1 + u2) + u3) * distB
                XB = MA * p_mx + XA * p_xx
                YB = mlB * p_my + ylB * p_yy
                smBm = smBm + MB * cm
                smBx = smBx + XB * cm
                MsB.append(MB)
                XsB.append(XB)
                YsB.append(YB)
                mdA, xdA, ydA = ma_u[j], xa_u[j], ya_u[j]
                mlA, ylA = MA, YA
                mdB, xdB, ydB = MA, XA, YA
                mlB, ylB = MB, YB
            mbuf[pl.ds(c0, U)] = jnp.stack(MsB)
            xbuf[pl.ds(c0, U)] = jnp.stack(XsB)
            ybuf[pl.ds(c0, U)] = jnp.stack(YsB)
            return (mdA, xdA, ydA, mlA, ylA,
                    mdB, xdB, ydB, mlB, ylB,
                    smAm, smAx, smBm, smBx)

        st = jax.lax.fori_loop(
            0, C // U, chunk_body,
            (zeros, zeros, ydA0, zeros, zeros,
             zeros, zeros, zeros, zeros, zeros,
             zeros, zeros, zeros, zeros),
        )
        a_m = jnp.where(maskA, st[10], a_m)
        a_x = jnp.where(maskA, st[11], a_x)
        a_m = jnp.where(maskB, st[12], a_m)
        a_x = jnp.where(maskB, st[13], a_x)
        return (a_m, a_x)

    a_m, a_x = jax.lax.fori_loop(0, R // 2, row_body, (zeros, zeros))
    out_ref[0] = a_m + a_x


def _make_kernel_ppe_multi(NR: int):
    """Build an NR-row variant of _kernel_ppe2: rows r..r+NR-1 sweep columns
    together; rows 2..NR read their above-values from the previous row's
    registers, so VMEM row-buffer traffic, hap/mask loads, and DMA waits
    drop to 1/NR of the one-row kernel.  Per-cell arithmetic and capture
    order are identical (bit-exact).  Live vector state grows as 7*NR
    registers per (8,128) block — NR=8 trades DMA/buffer traffic against
    register pressure (A/B'd on hardware via tools/kernel_bench.py)."""

    def kernel(
        trans_ref,  # (1, 8) f32 SMEM
        rows_hbm,  # (nb, R, 3, 8, 128) i32 in ANY/HBM
        hap_ref,  # (1, C, 8, 128) i32
        rlen_ref,  # (1, 8, 128) i32
        clen_ref,  # (1, 8, 128) i32
        inity_ref,  # (1, 8, 128) f32
        out_ref,  # (1, 8, 128) f32
        mbuf,  # (C, 8, 128) f32 scratch
        xbuf,
        ybuf,
        cbuf,
        rows_s,  # (2, NR, 3, 8, 128) i32 scratch: double-buffered row groups
        sem,  # DMA semaphores (2,)
        *,
        r_pad: int,
        c_pad: int,
    ):
        R, C = r_pad, c_pad
        f32 = jnp.float32
        i = pl.program_id(0)

        p_mm = trans_ref[0, 0]
        p_gapm = trans_ref[0, 1]
        p_mx = trans_ref[0, 2]
        p_xx = trans_ref[0, 3]
        p_my = trans_ref[0, 4]
        p_yy = trans_ref[0, 5]

        def group_dma(slot, p):  # matrix rows NR*p+1.. -> input rows NR*p..
            return pltpu.make_async_copy(
                rows_hbm.at[i, pl.ds(NR * p, NR)], rows_s.at[slot], sem.at[slot]
            )

        group_dma(0, 0).start()

        inity = inity_ref[0]
        rlen_b = rlen_ref[0]
        clen_b = clen_ref[0]
        zeros = inity * f32(0.0)

        mbuf[...] = jnp.zeros((C, 8, LANES), f32)
        xbuf[...] = jnp.zeros((C, 8, LANES), f32)
        ybuf[...] = jnp.broadcast_to(inity, (C, 8, LANES))
        col1 = jax.lax.broadcasted_iota(jnp.int32, (C, 8, LANES), 0) + 1
        cbuf[...] = jnp.where(col1 <= clen_b[None], f32(1.0), f32(0.0))

        U = _PPE_UNROLL

        def row_body(p, accs):
            a_m, a_x = accs
            slot = jax.lax.rem(p, 2)

            @pl.when(p + 1 < R // NR)
            def _():
                group_dma(jax.lax.rem(p + 1, 2), p + 1).start()

            group_dma(slot, p).wait()
            rows = rows_s[pl.ds(slot, 1)][0]  # (NR, 3, 8, 128)
            rs = [rows[q, 0] for q in range(NR)]
            omq = [pltpu.bitcast(rows[q, 1], f32) for q in range(NR)]
            q3 = [pltpu.bitcast(rows[q, 2], f32) for q in range(NR)]
            r0 = NR * p + 1
            masks = [rlen_b == (r0 + q) for q in range(NR)]
            # Y(0, 0..) = init_y is row 1's only nonzero diagonal input
            yd0 = jnp.where(r0 == 1, inity, zeros)

            def chunk_body(k, st):
                md, xd, yd, ml, yl, sm_m, sm_x = (
                    list(st[0:NR]), list(st[NR:2*NR]), list(st[2*NR:3*NR]),
                    list(st[3*NR:4*NR]), list(st[4*NR:5*NR]),
                    list(st[5*NR:6*NR]), list(st[6*NR:7*NR]),
                )
                c0 = k * U
                hw_u = hap_ref[0, pl.ds(c0, U)]
                ma_u = mbuf[pl.ds(c0, U)]
                xa_u = xbuf[pl.ds(c0, U)]
                ya_u = ybuf[pl.ds(c0, U)]
                cm_u = cbuf[pl.ds(c0, U)]
                Ms, Xs, Ys = [], [], []
                for j in range(U):
                    hw = hw_u[j]
                    cm = cm_u[j]
                    MA = XA = YA = None
                    for q in range(NR):
                        dist = jnp.where((rs[q] & hw) != 0, omq[q], q3[q])
                        t1 = md[q] * p_mm
                        t2 = xd[q] * p_gapm
                        t3 = yd[q] * p_gapm
                        M = ((t1 + t2) + t3) * dist
                        if q == 0:
                            X = ma_u[j] * p_mx + xa_u[j] * p_xx
                        else:
                            X = MA * p_mx + XA * p_xx
                        Y = ml[q] * p_my + yl[q] * p_yy
                        sm_m[q] = sm_m[q] + M * cm
                        sm_x[q] = sm_x[q] + X * cm
                        # next row's diagonal = this row's above (the fresh row
                        # just computed when q advances)
                        if q == 0:
                            md[q], xd[q], yd[q] = ma_u[j], xa_u[j], ya_u[j]
                        else:
                            md[q], xd[q], yd[q] = MA, XA, YA
                        ml[q], yl[q] = M, Y
                        MA, XA, YA = M, X, Y
                    Ms.append(MA)
                    Xs.append(XA)
                    Ys.append(YA)
                mbuf[pl.ds(c0, U)] = jnp.stack(Ms)
                xbuf[pl.ds(c0, U)] = jnp.stack(Xs)
                ybuf[pl.ds(c0, U)] = jnp.stack(Ys)
                return tuple(md + xd + yd + ml + yl + sm_m + sm_x)

            init = (
                [zeros] * NR  # md
                + [zeros] * NR  # xd
                + [yd0] + [zeros] * (NR - 1)  # yd: only the quad's first row
                + [zeros] * NR  # ml
                + [zeros] * NR  # yl
                + [zeros] * NR  # sm_m
                + [zeros] * NR  # sm_x
            )
            st = jax.lax.fori_loop(0, C // U, chunk_body, tuple(init))
            for q in range(NR):
                a_m = jnp.where(masks[q], st[5 * NR + q], a_m)
                a_x = jnp.where(masks[q], st[6 * NR + q], a_x)
            return (a_m, a_x)

        a_m, a_x = jax.lax.fori_loop(0, R // NR, row_body, (zeros, zeros))
        out_ref[0] = a_m + a_x

    return kernel


_kernel_ppe4 = _make_kernel_ppe_multi(4)
_kernel_ppe8 = _make_kernel_ppe_multi(8)


def _ppe_base_mask(codes):
    """one-hot base masks: A=1 C=2 G=4 T=8, N=15 (matches anything)"""
    return jnp.where(
        codes == 4, jnp.int32(15), jnp.left_shift(jnp.int32(1), codes)
    )


def _ppe_eligible(
    B: int, c_pad: int, interpret: bool, default_algo: str = "ppe"
) -> bool:
    return (
        default_algo == "ppe"
        and not interpret
        and B % (8 * LANES) == 0
        and c_pad % _PPE_UNROLL == 0
        and c_pad <= 640
    )


def _pallas_forward_ppe(
    read_codes, read_omq, read_q3, read_lens, hap_codes, hap_lens, init_y,
    trans, r_pad, c_pad, interpret, ppe_rows: int = 2,
) -> jnp.ndarray:
    B = read_codes.shape[0]
    assert B % (8 * LANES) == 0, "ppe kernel needs pair batches of 1024"
    nb = B // (8 * LANES)

    def to_blocks(a):  # (B, S) -> (nb, S, 8, 128)
        return a.reshape(nb, 8, LANES, a.shape[1]).transpose(0, 3, 1, 2)

    bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    rows_hbm = jnp.stack(
        [
            to_blocks(_ppe_base_mask(read_codes)),
            bits(to_blocks(read_omq)),
            bits(to_blocks(read_q3)),
        ],
        axis=2,
    )  # (nb, R, 3, 8, 128) i32
    hap_blk = to_blocks(_ppe_base_mask(hap_codes))  # (nb, C, 8, 128)
    vec = lambda v: v.reshape(nb, 8, LANES)
    return _pallas_call_ppe(
        rows_hbm, hap_blk, vec(read_lens.astype(jnp.int32)),
        vec(hap_lens.astype(jnp.int32)), vec(init_y),
        trans, r_pad, c_pad, interpret, ppe_rows,
    )


def _pallas_call_ppe(
    rows_hbm, hap_blk, rlen_blk, clen_blk, iy_blk, trans, r_pad, c_pad,
    interpret, ppe_rows: int = 2,
) -> jnp.ndarray:
    nb = rows_hbm.shape[0]
    B = nb * 8 * LANES
    R, C = r_pad, c_pad
    f32 = jnp.float32
    trans_arr = jnp.array([list(trans) + [0.0, 0.0]], dtype=f32)

    if ppe_rows == 8 and R % 8 == 0:
        kernel = functools.partial(_kernel_ppe8, r_pad=R, c_pad=C)
        rows_scratch = pltpu.VMEM((2, 8, 3, 8, LANES), jnp.int32)
    elif ppe_rows == 4 and R % 4 == 0:
        kernel = functools.partial(_kernel_ppe4, r_pad=R, c_pad=C)
        rows_scratch = pltpu.VMEM((2, 4, 3, 8, LANES), jnp.int32)
    elif ppe_rows >= 2 and R % 2 == 0:
        kernel = functools.partial(_kernel_ppe2, r_pad=R, c_pad=C)
        rows_scratch = pltpu.VMEM((2, 2, 3, 8, LANES), jnp.int32)
    else:
        kernel = functools.partial(_kernel_ppe, r_pad=R, c_pad=C)
        rows_scratch = pltpu.VMEM((2, 3, 8, LANES), jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, C, 8, LANES), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, LANES), f32),
        scratch_shapes=[
            pltpu.VMEM((C, 8, LANES), f32),
            pltpu.VMEM((C, 8, LANES), f32),
            pltpu.VMEM((C, 8, LANES), f32),
            pltpu.VMEM((C, 8, LANES), f32),
            rows_scratch,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * R * C * B,
            bytes_accessed=B * (3 * R + C) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        trans_arr,
        rows_hbm,
        hap_blk,
        rlen_blk,
        clen_blk,
        iy_blk,
    )
    return out.reshape(B)


@functools.partial(
    jax.jit, static_argnames=("r_pad", "c_pad", "stripe", "interpret")
)
def pairhmm_pallas_unique(
    read_u8: jnp.ndarray,  # (NR, R_pad) uint8 ASCII bases, 0-padded
    qual_u8: jnp.ndarray,  # (NR, R_pad) uint8 ASCII quals
    read_lens: jnp.ndarray,  # (NR,) i32
    hap_u8: jnp.ndarray,  # (NH, C_pad) uint8 ASCII bases
    hap_lens: jnp.ndarray,  # (NH,) i32
    hap_init_y: jnp.ndarray,  # (NH,) f32 INITIAL/haplen (host-computed)
    pair_read: jnp.ndarray,  # (B,) i32
    pair_hap: jnp.ndarray,  # (B,) i32
    base_table: jnp.ndarray,  # (256,) i32
    ph2pr_omq: jnp.ndarray,  # (128,) f32: 1 - ph2pr[q]
    ph2pr_q3: jnp.ndarray,  # (128,) f32: ph2pr[q] / 3
    trans: Tuple,
    r_pad: int,
    c_pad: int,
    stripe: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Device-side pair expansion + Pallas kernel, one jit.

    Ships only unique reads/haps as uint8 over the (slow) host link and
    gathers per-pair tensors on device — the TPU analogue of the reference's
    testcase pointer table (intel_pairhmm.hpp:154-203).
    """
    # Table lookups run on the SMALL unique tables first (8-30x fewer
    # elements than the pair-expanded arrays); the per-pair expansion is then
    # a plain f32/i32 row gather — measured ~5x faster than gathering uint8
    # rows and doing the lookups afterwards.
    rc_unique = jnp.take(base_table, read_u8.astype(jnp.int32), axis=0)
    q_idx = (qual_u8 & 127).astype(jnp.int32)
    omq_unique = jnp.take(ph2pr_omq, q_idx, axis=0)
    q3_unique = jnp.take(ph2pr_q3, q_idx, axis=0)
    hc_unique = jnp.take(base_table, hap_u8.astype(jnp.int32), axis=0)

    read_codes = jnp.take(rc_unique, pair_read, axis=0)  # (B, R) i32
    read_omq = jnp.take(omq_unique, pair_read, axis=0)
    read_q3 = jnp.take(q3_unique, pair_read, axis=0)
    hap_codes = jnp.take(hc_unique, pair_hap, axis=0)  # (B, C) i32
    rlens = jnp.take(read_lens, pair_read)
    clens = jnp.take(hap_lens, pair_hap)
    init_y = jnp.take(hap_init_y, pair_hap)
    return _pallas_forward(
        read_codes, read_omq, read_q3, rlens, hap_codes, clens, init_y,
        trans, r_pad, c_pad, stripe, interpret,
    )


def _pallas_forward(
    read_codes, read_omq, read_q3, read_lens, hap_codes, hap_lens, init_y,
    trans, r_pad, c_pad, stripe, interpret, algo: str = "auto",
    default_algo: str = "ppe", ppe_rows: int = 2,
) -> jnp.ndarray:
    B = read_codes.shape[0]
    assert B % LANES == 0, "pair batch must be a multiple of 128"
    # pair-per-element kernel: faster (no cross-sublane traffic, no
    # anti-diagonal ramp) but needs 1024-pair blocks and ~C*13KB of VMEM.
    # On real TPUs ppe and striped are bitwise-identical (mul/add stay
    # unfused); XLA:CPU contracts FMAs in interpret mode and drifts the two
    # by 1 ulp on ~0.5% of pairs, so `auto` keeps interpret runs on striped
    # — the kernel whose interpret output matches the oracle bit-for-bit.
    if algo == "ppe":
        assert c_pad % _PPE_UNROLL == 0, (
            f"ppe kernel needs c_pad % {_PPE_UNROLL} == 0, got {c_pad}"
        )
    use_ppe = algo == "ppe" or (
        algo == "auto" and _ppe_eligible(B, c_pad, interpret, default_algo)
    )
    if use_ppe:
        return _pallas_forward_ppe(
            read_codes, read_omq, read_q3, read_lens, hap_codes, hap_lens,
            init_y, trans, r_pad, c_pad, interpret, ppe_rows,
        )
    assert r_pad % stripe == 0, "r_pad must be a multiple of the stripe height"
    n_blocks = B // LANES

    trans_arr = jnp.array([list(trans) + [0.0, 0.0]], dtype=jnp.float32)

    # transpose to (seq, B): rows/columns on sublanes, pairs on lanes
    rs_t = read_codes.T
    omq_t = read_omq.T
    q3_t = read_q3.T
    hap_t = hap_codes.T

    kernel = functools.partial(_kernel, r_pad=r_pad, c_pad=c_pad, stripe=stripe)
    block = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    grid_flops = 10 * r_pad * c_pad * LANES
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            block(r_pad),
            block(r_pad),
            block(r_pad),
            block(c_pad),
            block(1),
            block(1),
            block(1),
        ],
        out_specs=block(1),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, c_pad + 2 * stripe + 1, LANES), jnp.float32)
        ],
        cost_estimate=pl.CostEstimate(
            flops=grid_flops, bytes_accessed=B * (3 * r_pad + c_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        trans_arr,
        rs_t,
        omq_t,
        q3_t,
        hap_t,
        read_lens[None, :].astype(jnp.int32),
        hap_lens[None, :].astype(jnp.int32),
        init_y[None, :],
    )
    return out[0]


@functools.partial(
    jax.jit, static_argnames=("r_pad", "c_pad", "stripe", "interpret")
)
def pairhmm_pallas_batch(
    read_codes: jnp.ndarray,  # (B, R_pad) i32
    read_omq: jnp.ndarray,  # (B, R_pad) f32
    read_q3: jnp.ndarray,  # (B, R_pad) f32
    read_lens: jnp.ndarray,  # (B,) i32
    hap_codes: jnp.ndarray,  # (B, C_pad) i32
    hap_lens: jnp.ndarray,  # (B,) i32
    init_y: jnp.ndarray,  # (B,) f32
    trans: Tuple,  # 6 scalars
    r_pad: int,
    c_pad: int,
    stripe: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pair-expanded entry point (tests + small batches)."""
    return _pallas_forward(
        read_codes, read_omq, read_q3, read_lens, hap_codes, hap_lens,
        init_y, trans, r_pad, c_pad, stripe, interpret,
    )


def pallas_pairhmm_engine(cfg: HCConfig):
    """Per-region engine: a single-job dispatch through the batched runner
    (the cross-region runner in ops/runner.py is the production path)."""
    from .engines import _to_arrays
    from .runner import PairHMMJob, PallasPairHMMRunner

    runner = PallasPairHMMRunner(cfg)

    def engine(reads, haplotypes):
        read_arrays, hap_arrays = _to_arrays(reads, haplotypes)
        job = PairHMMJob(read_arrays, hap_arrays)
        runner.run([job])
        return job.result

    return engine


# ---------------------------------------------------------------------------
# Group dispatch building blocks.
#
# Production (ppe on real TPUs): the runner ships HOST-prepared element
# planes and calls pairhmm_pallas_planes per chunk — zero device-side table
# prep (the relay-tunnelled chip charges multiple ms per non-fused XLA op,
# and small-table gathers run at ~5ns/element there).
# prepare_tables_ppe + dispatch_pairs_ppe keep the device-side one-gather
# prep as the alternative for hardware without per-op relay costs.
# Striped/interpret groups use prepare_tables_striped (once per group) +
# dispatch_pairs_striped per chunk over packed uint8 buffers.


def ppe_element_table(base_table: np.ndarray, ph2pr_f32: np.ndarray) -> np.ndarray:
    """The 768-entry combined lookup table for the one-gather prep:
    [0:256]   byte -> one-hot base mask (A=1 C=2 G=4 T=8, N=15),
    [256:512] byte -> (1 - ph2pr[byte & 127]) f32 bits,
    [512:768] byte -> (ph2pr[byte & 127] / 3) f32 bits.
    Segment offsets come from the packed-buffer position, so ONE jnp.take
    produces every per-element plane (each small-table gather is a separate
    XLA op with a multi-ms fixed cost on the relay-tunnelled chip)."""
    codes = base_table.astype(np.int64)
    masks = np.where(codes == 4, 15, 1 << codes).astype(np.int32)
    k = np.arange(256) & 127
    omq = (np.float32(1.0) - ph2pr_f32)[k].astype(np.float32)
    q3 = (ph2pr_f32 / np.float32(3.0))[k].astype(np.float32)
    return np.concatenate(
        [masks, omq.view(np.int32), q3.view(np.int32)]
    ).astype(np.int32)


def _unpack_u8(u8buf, i32buf, base_table, ph2pr_omq, ph2pr_q3,
               nr_pad, nh_pad, r_pad, c_pad):
    """Raw-encoding unpack (striped kernel path).  u8buf layout:
    [reads | quals | haps]."""
    nrr = nr_pad * r_pad
    read_u8 = u8buf[:nrr].reshape(nr_pad, r_pad)
    qual_u8 = u8buf[nrr : 2 * nrr].reshape(nr_pad, r_pad)
    hap_u8 = u8buf[2 * nrr : 2 * nrr + nh_pad * c_pad].reshape(nh_pad, c_pad)
    rc = jnp.take(base_table, read_u8.astype(jnp.int32), axis=0)
    q_idx = (qual_u8 & 127).astype(jnp.int32)
    omq = jnp.take(ph2pr_omq, q_idx, axis=0)
    q3 = jnp.take(ph2pr_q3, q_idx, axis=0)
    hc = jnp.take(base_table, hap_u8.astype(jnp.int32), axis=0)
    read_lens = i32buf[:nr_pad]
    hap_lens = i32buf[nr_pad : nr_pad + nh_pad]
    init_y = jax.lax.bitcast_convert_type(
        i32buf[nr_pad + nh_pad : nr_pad + 2 * nh_pad], jnp.float32
    )
    return rc, omq, q3, hc, read_lens, hap_lens, init_y


def plane_tables(base_table: np.ndarray, ph2pr_f32: np.ndarray):
    """Host-side 256-entry lookup tables for the planes path:
    (byte -> one-hot mask i32, byte -> omq f32 bits, byte -> q3 f32 bits).
    Identical values to ppe_element_table's segments — the host applies
    them with numpy fancy-indexing and ships ready i32 planes, because the
    relay-tunnelled chip runs small-table gathers at ~5 ns/element."""
    t = ppe_element_table(base_table, ph2pr_f32)
    return t[:256].copy(), t[256:512].copy(), t[512:768].copy()


def _unpack_planes(buf, nr_pad, nh_pad, r_pad, c_pad):
    """View-only unpack of the host-prepared plane buffer:
    [rlens(NR) | hlens(NH) | iy bits(NH) | ru(3*NR*R) | hu(NH*C)] i32."""
    nrr = nr_pad * r_pad
    head = nr_pad + 2 * nh_pad
    read_lens = buf[:nr_pad]
    hap_lens = buf[nr_pad : nr_pad + nh_pad]
    init_y = jax.lax.bitcast_convert_type(
        buf[nr_pad + nh_pad : head], jnp.float32
    )
    ru = buf[head : head + 3 * nrr].reshape(3, nr_pad, r_pad)
    hu = buf[head + 3 * nrr : head + 3 * nrr + nh_pad * c_pad].reshape(
        nh_pad, c_pad
    )
    return ru, hu, read_lens, hap_lens, init_y


@functools.partial(
    jax.jit,
    static_argnames=(
        "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows", "interpret",
    ),
)
def pairhmm_pallas_planes(
    buf: jnp.ndarray,  # host-prepared i32 plane buffer (_unpack_planes)
    pairs: jnp.ndarray,  # (2, B) i32
    trans: Tuple,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Planes-path dispatch: view-only unpack + pair expansion + ppe kernel.
    Works for single- and multi-chunk groups alike (re-viewing the shared
    buffer per chunk is free), so no separate table-prep program exists on
    this path at all."""
    ru, hu, read_lens, hap_lens, init_y = _unpack_planes(
        buf, nr_pad, nh_pad, r_pad, c_pad
    )
    pair_read, pair_hap = pairs[0], pairs[1]
    B = pair_read.shape[0]
    nb = B // (8 * LANES)
    rows_hbm = (
        jnp.take(ru, pair_read, axis=1)
        .reshape(3, nb, 8, LANES, r_pad)
        .transpose(1, 4, 0, 2, 3)
    )
    hap_blk = (
        jnp.take(hu, pair_hap, axis=0)
        .reshape(nb, 8, LANES, c_pad)
        .transpose(0, 3, 1, 2)
    )
    vec = lambda v: v.reshape(nb, 8, LANES)
    rlens = jnp.take(read_lens, pair_read).astype(jnp.int32)
    clens = jnp.take(hap_lens, pair_hap).astype(jnp.int32)
    iy = jnp.take(init_y, pair_hap)
    return _pallas_call_ppe(
        rows_hbm, hap_blk, vec(rlens), vec(clens), vec(iy),
        trans, r_pad, c_pad, interpret, ppe_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows", "interpret",
    ),
)
def pairhmm_pallas_planes_fused(
    bufs: jnp.ndarray,  # (k, L) stacked plane buffers, one per group
    pairs: jnp.ndarray,  # (k, 2, B) stacked pair chunks
    trans: Tuple,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch dispatch of k same-signature plane groups (the relay
    charges ~4ms per program launch regardless of size, so fusing k groups
    amortizes the per-launch cost k-fold — the sustained-vs-kernel gap
    closer, VERDICT r3 next-step 3).  lax.map compiles the per-group body
    once and runs the k kernels sequentially inside one XLA program, so
    each group's result is BITWISE identical to a pairhmm_pallas_planes
    dispatch of the same buffer.  Returns (k*B,) f32, group-major."""

    def one(xs):
        buf, p = xs
        return pairhmm_pallas_planes(
            buf, p, trans, nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad,
            c_pad=c_pad, ppe_rows=ppe_rows, interpret=interpret,
        )

    return jax.lax.map(one, (bufs, pairs)).reshape(-1)


def _unpack_u8_ppe(u8buf, i32buf, ppe_table, nr_pad, nh_pad, r_pad, c_pad):
    """Two-gather unpack for the ppe kernel (source-index gather over the
    packed bytes, then the 768-entry combined element table).  Returns ru
    in (3, NR, R) layout (segment-major: masks | omq bits | q3 bits) plus
    hu (NH, C)."""
    nrr = nr_pad * r_pad
    n = 3 * nrr + nh_pad * c_pad
    pos = jax.lax.iota(jnp.int32, n)
    # u8buf ships each byte ONCE ([reads | quals | haps], 2*nrr + hc — the
    # whole point of the packed encoding); the qual bytes feed BOTH the omq
    # (offset 256) and q3 (offset 512) segments of ppe_element_table, so
    # the source index re-reads the qual segment for output positions
    # [2*nrr, 3*nrr) and shifts the hap segment down by one nrr.
    offs = jnp.where(
        (pos >= nrr) & (pos < 2 * nrr), jnp.int32(256),
        jnp.where((pos >= 2 * nrr) & (pos < 3 * nrr), jnp.int32(512),
                  jnp.int32(0)),
    )
    src = jnp.where(pos >= 2 * nrr, pos - nrr, pos)
    flat = jnp.take(ppe_table, jnp.take(u8buf, src).astype(jnp.int32) + offs)
    ru = flat[: 3 * nrr].reshape(3, nr_pad, r_pad)
    hu = flat[3 * nrr :].reshape(nh_pad, c_pad)
    read_lens = i32buf[:nr_pad]
    hap_lens = i32buf[nr_pad : nr_pad + nh_pad]
    init_y = jax.lax.bitcast_convert_type(
        i32buf[nr_pad + nh_pad : nr_pad + 2 * nh_pad], jnp.float32
    )
    return ru, hu, read_lens, hap_lens, init_y


@functools.partial(
    jax.jit, static_argnames=("nr_pad", "nh_pad", "r_pad", "c_pad")
)
def prepare_tables_ppe(
    u8buf, i32buf, ppe_table,
    nr_pad: int, nh_pad: int, r_pad: int, c_pad: int,
):
    """Unique tables in the ppe kernel's element encodings, via the
    one-gather combined table: ru (3, NR, R) i32 [masks | omq | q3 bits],
    hu (NH, C) i32 masks."""
    return _unpack_u8_ppe(
        u8buf, i32buf, ppe_table, nr_pad, nh_pad, r_pad, c_pad
    )


@functools.partial(
    jax.jit, static_argnames=("r_pad", "c_pad", "ppe_rows", "interpret")
)
def dispatch_pairs_ppe(
    ru, hu, read_lens, hap_lens, init_y, pairs,
    trans: Tuple, r_pad: int, c_pad: int, ppe_rows: int = 2,
    interpret: bool = False,
):
    """Pair expansion (gathers from prepared tables) + the ppe kernel.
    ru arrives segment-major (3, NR, R)."""
    pair_read, pair_hap = pairs[0], pairs[1]
    B = pair_read.shape[0]
    nb = B // (8 * LANES)
    rows_hbm = (
        jnp.take(ru, pair_read, axis=1)
        .reshape(3, nb, 8, LANES, r_pad)
        .transpose(1, 4, 0, 2, 3)
    )
    hap_blk = (
        jnp.take(hu, pair_hap, axis=0)
        .reshape(nb, 8, LANES, c_pad)
        .transpose(0, 3, 1, 2)
    )
    vec = lambda v: v.reshape(nb, 8, LANES)
    rlens = jnp.take(read_lens, pair_read).astype(jnp.int32)
    clens = jnp.take(hap_lens, pair_hap).astype(jnp.int32)
    iy = jnp.take(init_y, pair_hap)
    return _pallas_call_ppe(
        rows_hbm, hap_blk, vec(rlens), vec(clens), vec(iy),
        trans, r_pad, c_pad, interpret, ppe_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows", "interpret",
    ),
)
def pairhmm_pallas_packed(
    u8buf: jnp.ndarray,  # packed group bytes [reads | quals | haps]
    i32buf: jnp.ndarray,  # [rlens | hlens | init_y bits]
    ppe_table: jnp.ndarray,  # 768-entry combined element table (device)
    pairs: jnp.ndarray,  # (2, B) i32
    trans: Tuple,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch packed dispatch: device unpack-gather (_unpack_u8_ppe) +
    pair expansion + ppe kernel in a single XLA program.  The split
    prepare_tables_ppe / dispatch_pairs_ppe pair costs TWO relay launches
    per single-chunk group (the relay charges ~4ms per launch regardless of
    size); combining them halves the per-group dispatch cost and is the
    unit the fused variant below maps over.  All pre-kernel ops are exact
    gathers/reshapes/bitcasts, so results are bitwise identical to the
    split dispatch."""
    tables = _unpack_u8_ppe(
        u8buf, i32buf, ppe_table, nr_pad, nh_pad, r_pad, c_pad
    )
    return dispatch_pairs_ppe(
        *tables, pairs, trans, r_pad=r_pad, c_pad=c_pad,
        ppe_rows=ppe_rows, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows", "interpret",
    ),
)
def pairhmm_pallas_packed_fused(
    u8bufs: jnp.ndarray,  # (k, U) stacked packed byte buffers
    i32bufs: jnp.ndarray,  # (k, I) stacked length/init buffers
    ppe_table: jnp.ndarray,  # shared 768-entry combined element table
    pairs: jnp.ndarray,  # (k, 2, B) stacked pair chunks
    trans: Tuple,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch dispatch of k same-signature PACKED groups: the packed
    encoding's 4x-smaller transfer (uint8 vs i32 planes) composed with the
    fused path's k-fold launch amortization — the combination the round-4
    A/B showed each winning separately but that could not previously
    coexist (fusion was planes-only).  lax.map of pairhmm_pallas_packed, so
    each group's result is BITWISE identical to its own packed dispatch.
    Returns (k*B,) f32, group-major."""

    def one(xs):
        u8, i32, p = xs
        return pairhmm_pallas_packed(
            u8, i32, ppe_table, p, trans, nr_pad=nr_pad, nh_pad=nh_pad,
            r_pad=r_pad, c_pad=c_pad, ppe_rows=ppe_rows,
            interpret=interpret,
        )

    return jax.lax.map(one, (u8bufs, i32bufs, pairs)).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_pairs", "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows",
        "interpret",
    ),
)
def pairhmm_pallas_packed_nib_fused(
    u8bufs: jnp.ndarray,  # (k, U) stacked nib byte buffers
    i32bufs: jnp.ndarray,  # (k, I) stacked length/init buffers
    minitabs: jnp.ndarray,  # (k, 72) per-group dictionary mini-tables
    ppe_table: jnp.ndarray,  # shared 768-entry combined element table
    spans: jnp.ndarray,  # (k, S, 4) stacked job span descriptors
    trans: Tuple,
    n_pairs: int,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch dispatch of k same-signature NIB groups: minimal bytes
    (1 B/base + span tables) composed with k-fold launch amortization, so
    the deep-degraded fusion path no longer regresses to the raw packed
    encoding's 2.6x transfer size.  lax.map of pairhmm_pallas_packed_nib —
    each group's result is BITWISE identical to its own nib dispatch.
    Returns (k*B,) f32, group-major."""

    def one(xs):
        u8, i32, mt, sp = xs
        return pairhmm_pallas_packed_nib(
            u8, i32, mt, ppe_table, sp, trans, n_pairs=n_pairs,
            nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
            ppe_rows=ppe_rows, interpret=interpret,
        )

    return jax.lax.map(one, (u8bufs, i32bufs, minitabs, spans)).reshape(-1)


def _expand_pairs_from_spans(spans, n_pairs: int):
    """Device pair-index expansion from per-job span descriptors
    ((S, 4) i32 rows [read_base, hap_base, nr, nh], jobs in group order):
    replaces shipping the (2, B) pair-index arrays — 8 B/pair, 128 KB per
    16384-pair group through a ~100 MB/s relay link where transfers
    serialize with compute (relay_put_mbps, depth_sweep_r5).  Must be
    bitwise-identical to the host construction in runner._submit_group:
    read-major within each job, jobs in span order, tail positions past
    the group's pair total padded with pair (0, 0).  Padding span rows
    (all-zero) contribute zero pairs; searchsorted side='right' skips
    zero-count rows that share a start with a real row."""
    counts = spans[:, 2] * spans[:, 3]
    starts = jnp.cumsum(counts) - counts
    total = starts[-1] + counts[-1]
    i = jax.lax.iota(jnp.int32, n_pairs)
    j = jnp.clip(
        jnp.searchsorted(starts, i, side="right").astype(jnp.int32) - 1,
        0, spans.shape[0] - 1,
    )
    nh = jnp.maximum(jnp.take(spans[:, 3], j), 1)
    local = i - jnp.take(starts, j)
    pr = jnp.take(spans[:, 0], j) + local // nh
    ph = jnp.take(spans[:, 1], j) + local % nh
    valid = i < total
    zero = jnp.int32(0)
    return jnp.where(valid, pr, zero), jnp.where(valid, ph, zero)


def _unpack_nib_ppe(u8buf, i32buf, minitab, ppe_table,
                    nr_pad, nh_pad, r_pad, c_pad):
    """Nibble-dictionary unpack (the packednib shipping encoding): each
    read byte carries (seq_idx << 5) | qual_idx into per-group mini-tables
    the host builds from the SAME plane tables every other encoding uses
    (minitab layout: [0:8] seq one-hot masks, [8:40] omq f32 bits,
    [40:72] q3 f32 bits; dictionary index 0 is pinned to byte 0 so padding
    bytes yield the exact values of the raw-u8 encodings).  Halves the
    read-plane bytes vs raw [reads | quals] shipping; haps stay raw bytes
    through the 768-entry table's mask segment.  u8buf layout:
    [nib reads (NR*R) | haps (NH*C)]."""
    nrr = nr_pad * r_pad
    nb = u8buf[:nrr].astype(jnp.int32)
    masks = jnp.take(minitab, nb >> 5)
    omq = jnp.take(minitab, (nb & 31) + 8)
    q3 = jnp.take(minitab, (nb & 31) + 40)
    ru = jnp.concatenate([masks, omq, q3]).reshape(3, nr_pad, r_pad)
    hu = jnp.take(
        ppe_table, u8buf[nrr : nrr + nh_pad * c_pad].astype(jnp.int32)
    ).reshape(nh_pad, c_pad)
    read_lens = i32buf[:nr_pad]
    hap_lens = i32buf[nr_pad : nr_pad + nh_pad]
    init_y = jax.lax.bitcast_convert_type(
        i32buf[nr_pad + nh_pad : nr_pad + 2 * nh_pad], jnp.float32
    )
    return ru, hu, read_lens, hap_lens, init_y


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_pairs", "nr_pad", "nh_pad", "r_pad", "c_pad", "ppe_rows",
        "interpret",
    ),
)
def pairhmm_pallas_packed_nib(
    u8buf: jnp.ndarray,  # [nib reads | haps] group bytes
    i32buf: jnp.ndarray,  # [rlens | hlens | init_y bits]
    minitab: jnp.ndarray,  # (72,) per-group dictionary mini-tables
    ppe_table: jnp.ndarray,  # 768-entry combined element table (device)
    spans: jnp.ndarray,  # (S, 4) i32 job span descriptors
    trans: Tuple,
    n_pairs: int,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    ppe_rows: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE-launch minimal-bytes packed dispatch: nibble-dictionary unpack
    (_unpack_nib_ppe) + on-device pair expansion (_expand_pairs_from_spans)
    + ppe kernel in a single XLA program.  vs pairhmm_pallas_packed this
    ships ~62%% fewer bytes per 16384-pair group (reads+quals 2 B/base ->
    1 B/base; the 128 KB pair arrays -> a <=1 KB span table) — the lever
    the r5 bandwidth probe identified (~100 MB/s put rate means transfers
    serialize with the 6.5 ms kernel; depth_sweep_r5 measured sustained
    pinned at ~half the kernel rate).  All pre-kernel ops are exact
    gathers/int ops, so results are bitwise identical to every other
    dispatch path."""
    tables = _unpack_nib_ppe(
        u8buf, i32buf, minitab, ppe_table, nr_pad, nh_pad, r_pad, c_pad
    )
    pr, ph = _expand_pairs_from_spans(spans, n_pairs)
    return dispatch_pairs_ppe(
        *tables, jnp.stack([pr, ph]), trans, r_pad=r_pad, c_pad=c_pad,
        ppe_rows=ppe_rows, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("nr_pad", "nh_pad", "r_pad", "c_pad")
)
def prepare_tables_striped(
    u8buf, i32buf, base_table, ph2pr_omq, ph2pr_q3,
    nr_pad: int, nh_pad: int, r_pad: int, c_pad: int,
):
    """Unique tables in the striped kernel's raw encodings (codes + f32)."""
    return _unpack_u8(
        u8buf, i32buf, base_table, ph2pr_omq, ph2pr_q3,
        nr_pad, nh_pad, r_pad, c_pad,
    )


@functools.partial(
    jax.jit, static_argnames=("r_pad", "c_pad", "stripe", "interpret")
)
def dispatch_pairs_striped(
    rc, omq, q3, hc, read_lens, hap_lens, init_y, pairs,
    trans: Tuple, r_pad: int, c_pad: int, stripe: int, interpret: bool,
):
    pair_read, pair_hap = pairs[0], pairs[1]
    read_codes = jnp.take(rc, pair_read, axis=0)
    read_omq = jnp.take(omq, pair_read, axis=0)
    read_q3 = jnp.take(q3, pair_read, axis=0)
    hap_codes = jnp.take(hc, pair_hap, axis=0)
    rlens = jnp.take(read_lens, pair_read)
    clens = jnp.take(hap_lens, pair_hap)
    iy = jnp.take(init_y, pair_hap)
    return _pallas_forward(
        read_codes, read_omq, read_q3, rlens, hap_codes, clens, iy,
        trans, r_pad, c_pad, stripe, interpret, algo="striped",
    )
