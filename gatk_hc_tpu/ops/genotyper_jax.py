"""Device-side genotyper reductions (jnp): batched marginalization +
diploid genotype likelihoods + GQ over fixed-shape site tiles.

This is the device analogue of models/genotyper.py's per-site reductions
(reference genotyper.hpp:234-362): per-read max over each allele's
haplotypes, hom/het diploid composition via the Jacobian log table, and
GQ from the top-2 gap.  Sites are padded into (S, R, H) tiles so XLA sees
a handful of shapes; masks carry the per-site read/hap/allele counts.

Where it fits: the production path keeps these reductions on the host in
float64 (vectorized NumPy — bit-exact with the reference and fast enough
that genotyping is ~3% of end-to-end wall at 60 Mb).  This module exists
for pod-scale deployments where genotyping runs next to the PairHMM step:
on CPU backends it runs in float64 and matches the host genotyper exactly
(tested).  TPUs have no float64, so there it computes in float32 with
Neumaier-compensated read sums, and the caller-side stability guard
(models/genotyper.py::genotype_regions_jax) host-verifies every site whose
GT/GQ decision is not provably stable under the f32 error bound — so the
emitted VCF is host-identical on every backend, with a few percent of
sites re-running on the host (counted as ``gq_host_verified``).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.quality import (
    JACOBIAN_F64,
    JACOBIAN_LOG_TABLE_INV_STEP,
    MAX_JACOBIAN_TOLERANCE,
)

_LOG10_2 = math.log10(2.0)
MAX_ALLELES = 8
MAX_GENOTYPES = (MAX_ALLELES * (MAX_ALLELES + 1)) // 2


def genotype_pair_tables() -> Tuple[np.ndarray, np.ndarray]:
    """(a1, a2) per genotype index, for the MAX_ALLELES-allele layout —
    the allele_index_cache analogue (genotyper.hpp:22-33)."""
    a1, a2 = np.triu_indices(MAX_ALLELES)
    return a1.astype(np.int32), a2.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("max_gq", "compensated"))
def genotype_sites(
    likelihoods: jnp.ndarray,  # (S, R, H) read x hap log10 likelihoods
    hap_to_allele: jnp.ndarray,  # (S, H) int32 allele index per haplotype
    read_keep: jnp.ndarray,  # (S, R) bool: read overlaps the site span
    hap_valid: jnp.ndarray,  # (S, H) bool: haplotype slot is real
    allele_count: jnp.ndarray,  # (S,) int32
    jacobian: jnp.ndarray,  # (table_size,) Jacobian log table
    max_gq: int = 99,
    compensated: bool = False,
):
    """Returns (genotype_lik (S, G), best_index (S,), gq (S,)).

    Genotype slots with a1/a2 >= allele_count hold -inf-like fill and are
    excluded from the best/GQ scan, exactly mirroring the host genotyper's
    variable-length loops.
    """
    dtype = likelihoods.dtype
    lowest = jnp.asarray(-np.finfo(np.float64).max, dtype)
    S, R, H = likelihoods.shape

    # marginalize: per-read max over each allele's haplotypes
    # (S, R, H) -> (S, R, A) via segment-max on the hap->allele mapping;
    # assign[s, a, h]: hap h of site s maps to allele a
    a_iota = jnp.arange(MAX_ALLELES, dtype=jnp.int32)
    assign = (
        hap_to_allele[:, None, :] == a_iota[None, :, None]
    ) & hap_valid[:, None, :]  # (S, A, H)
    lik_sah = jnp.where(
        assign[:, None, :, :],  # (S, 1, A, H)
        likelihoods[:, :, None, :],  # (S, R, 1, H)
        lowest,
    )  # (S, R, A, H)
    allele_lik = jnp.max(lik_sah, axis=-1)  # (S, R, A)

    # diploid composition over all (a1 <= a2) pairs
    a1, a2 = genotype_pair_tables()
    l1 = jnp.take(allele_lik, jnp.asarray(a1), axis=2)  # (S, R, G)
    l2 = jnp.take(allele_lik, jnp.asarray(a2), axis=2)
    big = jnp.maximum(l1, l2)
    small = jnp.minimum(l1, l2)
    diff = big - small
    in_range = diff < MAX_JACOBIAN_TOLERANCE
    ind = jnp.floor(
        jnp.where(in_range, diff, 0.0) * JACOBIAN_LOG_TABLE_INV_STEP + 0.5
    ).astype(jnp.int32)
    het = jnp.where(in_range, big + jnp.take(jacobian, ind), big)
    hom = l1 + jnp.asarray(_LOG10_2, dtype)
    vals = jnp.where(jnp.asarray(a1 == a2), hom, het)  # (S, R, G)
    vals = jnp.where(read_keep[:, :, None], vals, 0.0)  # masked reads add 0
    n_reads = jnp.sum(read_keep, axis=1).astype(dtype)  # (S,)
    zero = jnp.zeros((S, vals.shape[2]), dtype)
    if compensated:
        # Neumaier compensated summation for the f32 (TPU) path: shrinks
        # the summation error from O(R^2 * eps * m) to ~2*eps*sum|v|, which
        # tightens the stability bound the host-verify guard uses
        # (models/genotyper.py::genotype_regions_jax) and so keeps nearly
        # every site's GT/GQ decision on device.
        def nstep(carry, v):
            s, c = carry
            t = s + v
            c = c + jnp.where(
                jnp.abs(s) >= jnp.abs(v), (s - t) + v, (v - t) + s
            )
            return (t, c), None

        (s_sum, comp), _ = jax.lax.scan(
            nstep, (zero, zero), vals.transpose(1, 0, 2)
        )
        summed = s_sum + comp
    else:
        # lax.scan forces the host genotyper's left-to-right addition order
        # (XLA lowers cumsum/sum to a reassociating parallel prefix) — the
        # f64 path is bit-exact with the host engine
        summed, _ = jax.lax.scan(
            lambda carry, v: (carry + v, None),
            zero,
            vals.transpose(1, 0, 2),
        )
    totals = summed - (n_reads * jnp.asarray(_LOG10_2, dtype))[:, None]

    # mask genotype slots beyond each site's allele count
    valid_g = (jnp.asarray(a1)[None] < allele_count[:, None]) & (
        jnp.asarray(a2)[None] < allele_count[:, None]
    )
    masked = jnp.where(valid_g, totals, lowest)

    # best/second scan with the reference's >=-lets-later-ties-win rule
    # (genotyper.hpp:330-362): jnp.argmax picks the FIRST max, so argmax the
    # flipped row and mirror the index to make the LAST max win
    g_iota = jnp.arange(MAX_GENOTYPES)
    best_index = MAX_GENOTYPES - 1 - jnp.argmax(masked[:, ::-1], axis=1)
    best = jnp.take_along_axis(masked, best_index[:, None], axis=1)[:, 0]
    without_best = jnp.where(
        g_iota[None] == best_index[:, None], lowest, masked
    )
    second = jnp.max(without_best, axis=1)
    gq = jnp.floor(-10.0 * (second - best) + 0.5).astype(jnp.int32)
    gq = jnp.minimum(gq, max_gq)
    return masked, best_index.astype(jnp.int32), gq


def genotype_sites_host(
    likelihoods: np.ndarray,
    hap_to_allele: np.ndarray,
    read_keep: np.ndarray,
    hap_valid: np.ndarray,
    allele_count: np.ndarray,
    max_gq: int = 99,
):
    """Convenience wrapper: pads nothing, runs the jitted reduction with the
    float64 Jacobian table (CPU backends) or float32 (TPU, compensated
    summation so the host-verify guard's bound stays tight)."""
    import contextlib

    use_f64 = likelihoods.dtype == np.float64
    table = JACOBIAN_F64.astype(np.float64 if use_f64 else np.float32)
    ctx = jax.enable_x64(True) if use_f64 else contextlib.nullcontext()
    with ctx:
        return genotype_sites(
            jnp.asarray(likelihoods),
            jnp.asarray(hap_to_allele),
            jnp.asarray(read_keep),
            jnp.asarray(hap_valid),
            jnp.asarray(allele_count),
            jnp.asarray(table),
            max_gq=max_gq,
            compensated=not use_f64,
        )
