"""JAX PairHMM engine: bit-exactness vs the NumPy oracle (CPU backend)."""

import dataclasses

import numpy as np
import pytest

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.ops import pairhmm_oracle as oracle
from gatk_hc_tpu.ops.batching import all_pairs, pack_pairs
from gatk_hc_tpu.ops.pairhmm_jax import (
    batch_to_device_args,
    pairhmm_forward_batch,
    transition_constants,
)
from tests.conftest import mutate, random_dna
from tests.test_pairhmm import make_pair, to_bytes


def run_batch(read_arrays, hap_arrays, pair_read, pair_hap):
    batch = pack_pairs(read_arrays, hap_arrays, pair_read, pair_hap,
                       read_pad_buckets=(64,), hap_pad_buckets=(128,),
                       pair_batch=8)
    args = batch_to_device_args(batch)
    trans = transition_constants(ord("I"), ord("+"))
    probs = pairhmm_forward_batch(
        *args, trans, r_pad=batch.shape[1], c_pad=batch.shape[2]
    )
    return np.asarray(probs)[: batch.n_valid]


class TestJaxForward:
    def test_matches_oracle(self, rng):
        # On TPU the jnp engine is bit-exact vs the FTZ oracle (measured on
        # hardware: mul/add unfused, FTZ on).  XLA:CPU contracts mul+add into
        # FMA regardless of --xla_allow_excess_precision, so on the CPU test
        # backend we assert ulp-level closeness instead; VCF-level equality
        # is covered by the e2e engine-agreement tests.
        import jax

        exact = jax.default_backend() in ("tpu", "axon")
        read_arrays, hap_arrays = [], []
        for _ in range(6):
            read, quals, hap = make_pair(
                rng, rng.randint(12, 50), rng.randint(40, 100), rng.randint(0, 3)
            )
            read_arrays.append((to_bytes(read), to_bytes(quals)))
            hap_arrays.append(to_bytes(hap))
        pair_read, pair_hap = all_pairs(6, 6)
        got = run_batch(read_arrays, hap_arrays, pair_read, pair_hap)
        for k in range(len(pair_read)):
            b, q = read_arrays[pair_read[k]]
            h = hap_arrays[pair_hap[k]]
            want = np.float32(oracle.pairhmm_prob(b, q, h, ftz=exact))
            if exact:
                assert want == got[k], f"pair {k}: {want} vs {got[k]}"
            else:
                assert got[k] == pytest.approx(want, rel=2e-6), f"pair {k}"

    def test_varied_lengths_padding_invariant(self, rng):
        # same pair packed alone vs packed with others must give same result
        read, quals, hap = make_pair(rng, 33, 77, 2)
        ra = [(to_bytes(read), to_bytes(quals))]
        ha = [to_bytes(hap)]
        solo = run_batch(ra, ha, *all_pairs(1, 1))[0]
        other_r, other_q, other_h = make_pair(rng, 50, 100, 1)
        ra2 = ra + [(to_bytes(other_r), to_bytes(other_q))]
        ha2 = ha + [to_bytes(other_h)]
        together = run_batch(ra2, ha2, *all_pairs(2, 2))[0]
        assert solo == together


class TestJaxEngineEndToEnd:
    def test_pipeline_rows_match_native(self):
        import os

        fixtures = os.path.join(os.path.dirname(__file__), "..", "fixtures")
        sam = os.path.join(fixtures, "chrM.sam")
        fasta = os.path.join(fixtures, "chrM.fa")
        if not os.path.exists(sam):
            pytest.skip("fixture not generated")
        from gatk_hc_tpu.models.caller import call

        cfg_native = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        cfg_jax = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="jax", assembler_engine="native"
        )
        keep = lambda i: i in (2, 3, 11)
        r_native = call(sam, fasta, None, cfg_native, region_filter=keep)
        r_jax = call(sam, fasta, None, cfg_jax, region_filter=keep)
        rows_native = [v.to_vcf_row() for r in r_native for v in r.variants]
        rows_jax = [v.to_vcf_row() for r in r_jax for v in r.variants]
        assert rows_native == rows_jax
        assert rows_native
