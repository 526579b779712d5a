"""Parallel subsystem: sharded step vs unsharded, multihost utils, manifest."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.models.haplotype import Variant
from gatk_hc_tpu.ops.pairhmm_jax import pairhmm_forward_batch, transition_constants
from gatk_hc_tpu.parallel import multihost
from gatk_hc_tpu.parallel.checkpoint import RegionManifest
from gatk_hc_tpu.parallel.sharded_step import (
    HAP_SPECS,
    READ_SPECS,
    ShardMapPairHMMRunner,
    make_mesh,
    make_sharded_raw_step,
    shard_inputs,
)
from gatk_hc_tpu.utils.interval import Interval

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _mesh_workload(n_reads, n_haps, r_pad=16, c_pad=128, seed=0):
    rng = np.random.default_rng(seed)
    hc = rng.integers(0, 4, (n_haps, c_pad)).astype(np.int32)
    hl = np.full(n_haps, c_pad - 8, np.int32)
    rc = np.stack([hc[i % n_haps, 3 : 3 + r_pad] for i in range(n_reads)]).astype(
        np.int32
    )
    q = np.float32(1e-4)
    omq = np.full((n_reads, r_pad), 1.0 - q, np.float32)
    q3 = np.full((n_reads, r_pad), q / 3.0, np.float32)
    rl = np.full(n_reads, r_pad - 2, np.int32)
    iy = (np.float32(2.0**120) / hl.astype(np.float32)).astype(np.float32)
    return rc, omq, q3, rl, hc, hl, iy


def _unsharded_probs(trans, rc, omq, q3, rl, hc, hl, iy, r_pad, c_pad):
    """Full pair grid through the single-chip jnp forward (the oracle-exact
    engine) — the bitwise reference for the sharded step."""
    n_reads, n_haps = rc.shape[0], hc.shape[0]
    pr = np.repeat(np.arange(n_reads, dtype=np.int32), n_haps)
    ph = np.tile(np.arange(n_haps, dtype=np.int32), n_reads)
    return np.asarray(
        pairhmm_forward_batch(
            jnp.asarray(rc[pr]), jnp.asarray(omq[pr]), jnp.asarray(q3[pr]),
            jnp.asarray(rl[pr]), jnp.asarray(hc[ph]), jnp.asarray(hl[ph]),
            jnp.asarray(iy[ph]), trans, r_pad=r_pad, c_pad=c_pad,
        )
    ).reshape(n_reads, n_haps)


@needs_8_devices
class TestShardedStep:
    def test_raw_matches_unsharded_bitwise(self):
        """The sharded step emits RAW f32 probabilities — bitwise equal to
        the single-chip jnp forward, so the exact host f64 finalize chain
        yields identical likelihoods (VERDICT r3 weak #3)."""
        trans = transition_constants(ord("I"), ord("+"))
        r_pad, c_pad = 16, 128
        n_reads, n_haps = 16, 4
        rc, omq, q3, rl, hc, hl, iy = _mesh_workload(n_reads, n_haps, r_pad, c_pad)

        mesh = make_mesh(8, hap_parallel=2)
        step = make_sharded_raw_step(
            mesh, trans, r_pad, c_pad, use_pallas=False, cfg=DEFAULT_CONFIG
        )
        args = shard_inputs(
            mesh, (rc, omq, q3, rl, hc, hl, iy), READ_SPECS + HAP_SPECS
        )
        raw, best, n_rescue = step(*args)
        want = _unsharded_probs(trans, rc, omq, q3, rl, hc, hl, iy, r_pad, c_pad)
        np.testing.assert_array_equal(np.asarray(raw), want)
        np.testing.assert_array_equal(np.asarray(best), want.max(axis=1))
        assert int(np.asarray(n_rescue)[0]) == 0

    def test_pallas_kernel_under_shard_map(self):
        """Kernel-under-collectives composition (VERDICT r3 weak #7): the
        Pallas kernel (striped, interpret mode — the CPU-exact variant)
        compiles and runs inside shard_map on an 8-device mesh, bitwise
        equal to the jnp forward."""
        trans = transition_constants(ord("I"), ord("+"))
        r_pad, c_pad = 16, 128
        n_reads, n_haps = 8, 2
        rc, omq, q3, rl, hc, hl, iy = _mesh_workload(n_reads, n_haps, r_pad, c_pad)

        mesh = make_mesh(8, hap_parallel=2)
        step = make_sharded_raw_step(
            mesh, trans, r_pad, c_pad, use_pallas=True, cfg=DEFAULT_CONFIG,
            interpret=True,
        )
        args = shard_inputs(
            mesh, (rc, omq, q3, rl, hc, hl, iy), READ_SPECS + HAP_SPECS
        )
        raw = np.asarray(step(*args)[0])
        want = _unsharded_probs(trans, rc, omq, q3, rl, hc, hl, iy, r_pad, c_pad)
        np.testing.assert_array_equal(raw, want)

    def test_mesh_shapes(self):
        mesh = make_mesh(8, hap_parallel=2)
        assert mesh.devices.shape == (4, 2)
        mesh1 = make_mesh(8, hap_parallel=1)
        assert mesh1.devices.shape == (8, 1)
        with pytest.raises(ValueError):
            make_mesh(8, hap_parallel=3)


@needs_8_devices
class TestShardMapRunnerGolden:
    def test_chrm_golden_vcf_through_shard_map(self, tmp_path):
        """The full chrM pipeline with the PairHMM computed by the shard_map
        runner over the 8-virtual-device (data=4, hap=2) mesh must produce
        the byte-identical golden VCF: raw probs on device (pmax/psum
        collectives), exact f64 finalize + normalize on host (VERDICT r3
        #7 'Done =' criterion)."""
        import dataclasses
        import os

        from gatk_hc_tpu.models.caller import call_batched

        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "fixtures"
        )
        golden = os.path.join(fixtures, "chrM.golden.vcf")
        cfg = dataclasses.replace(DEFAULT_CONFIG, pairhmm_engine="shardmap")
        out = tmp_path / "chrM_shardmap.vcf"
        call_batched(
            os.path.join(fixtures, "chrM.sam"),
            os.path.join(fixtures, "chrM.fa"),
            str(out), cfg,
        )
        assert out.read_text() == open(golden).read()


@needs_8_devices
class TestMultiDeviceRunner:
    """The production PallasPairHMMRunner must round-robin dispatch groups
    across every local device (BASELINE config 4: N chips, one host) with
    placement-independent results."""

    def test_groups_span_devices_and_match_single_device(self, rng):
        import dataclasses

        from gatk_hc_tpu.ops.runner import PallasPairHMMRunner, PairHMMJob
        from tests.test_pallas import make_job

        cfg = dataclasses.replace(
            DEFAULT_CONFIG, read_pad_buckets=(32,), hap_pad_buckets=(128,),
            stripe_height=8,
        )

        def tiny(devices=None):
            r = PallasPairHMMRunner(
                cfg, pair_budget=128, interpret=True, devices=devices
            )
            r.READ_BUCKETS = (4,)
            r.HAP_BUCKETS = (4,)
            return r

        jobs = [make_job(rng, 2, 2) for _ in range(16)]
        solo_jobs = [PairHMMJob(j.reads, j.haps) for j in jobs]

        runner = tiny()
        token = runner.submit(jobs)
        submitted = token.resolve()[1]
        touched = {d for outs, _ in submitted for o in outs for d in o.devices()}
        runner.drain([token])
        assert len(submitted) == 8  # 2 jobs per group via the read budget
        assert len(touched) == 8, f"only {len(touched)} devices dispatched"

        single = tiny(devices=jax.devices()[:1])
        single.run(solo_jobs)
        for got, want in zip(jobs, solo_jobs):
            np.testing.assert_array_equal(got.result, want.result)


class TestMultihost:
    def test_partition_regions(self):
        parts = [
            list(multihost.partition_regions(10, i, 3)) for i in range(3)
        ]
        assert parts[0] == [0, 1, 2, 3]
        assert parts[1] == [4, 5, 6, 7]
        assert parts[2] == [8, 9]
        assert sum(len(p) for p in parts) == 10

    def test_variant_roundtrip(self):
        variants = [
            Variant(Interval("chrM", 10, 11), alleles=("A", "T"), gt=(0, 1), gq=99),
            Variant(
                Interval("chrM", 50, 54),
                alleles=("ACGT", "A", "*"),
                gt=(1, 2),
                gq=50,
            ),
        ]
        table, blob = multihost.encode_variants([3, 1], variants, "chrM")
        decoded = multihost.decode_variants(table, blob, "chrM")
        assert [rid for rid, _ in decoded] == [1, 3]
        roundtripped = {rid: v for rid, v in decoded}
        assert roundtripped[3].alleles == ("A", "T")
        assert roundtripped[3].to_vcf_row() == variants[0].to_vcf_row()
        assert roundtripped[1].alleles == ("ACGT", "A", "*")
        assert roundtripped[1].gt == (1, 2)

    def test_gather_single_process(self):
        variants = [
            Variant(Interval("chrM", 5, 6), alleles=("G", "C"), gt=(0, 1), gq=42)
        ]
        merged = multihost.gather_variants([0], variants, "chrM")
        assert len(merged) == 1
        assert merged[0][1].to_vcf_row() == variants[0].to_vcf_row()


class TestManifest:
    def test_resume_roundtrip(self, tmp_path):
        path = str(tmp_path / "manifest.jsonl")
        m = RegionManifest(path)
        v = Variant(Interval("chrM", 7, 8), alleles=("A", "G"), gt=(1, 1), gq=99)
        m.record(0, [v])
        m.record(2, [])
        # fresh load resumes
        m2 = RegionManifest(path)
        assert m2.is_done(0) and m2.is_done(2) and not m2.is_done(1)
        assert m2.variants_for(0)[0].to_vcf_row() == v.to_vcf_row()
        out = tmp_path / "out.vcf"
        m2.write_vcf(str(out), "#header\n")
        assert out.read_text() == "#header\n" + v.to_vcf_row()

    def test_manifest_with_genotype_worker_threads(self, tmp_path):
        """With host_threads>1, chunk genotyping (and so manifest.record)
        runs on the genotype worker thread — the manifest must still record
        every region and the VCF stay byte-identical to golden."""
        import dataclasses
        import os

        from gatk_hc_tpu.config import DEFAULT_CONFIG
        from gatk_hc_tpu.models.caller import call_batched

        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "fixtures"
        )
        sam = os.path.join(fixtures, "chrM.sam")
        fa = os.path.join(fixtures, "chrM.fa")
        golden = os.path.join(fixtures, "chrM.golden.vcf")
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", host_threads=4
        )
        mpath = str(tmp_path / "m.jsonl")
        out = tmp_path / "o.vcf"
        call_batched(sam, fa, str(out), cfg, manifest=RegionManifest(mpath))
        assert out.read_text() == open(golden).read()
        # resume from the manifest alone reproduces the same calls
        m2 = RegionManifest(mpath)
        out2 = tmp_path / "o2.vcf"
        call_batched(sam, fa, str(out2), cfg, manifest=m2)
        assert out2.read_text() == open(golden).read()


class TestAOTCache:
    def test_roundtrip_matches_jit(self, tmp_path, monkeypatch):
        # the aot cache must return a callable whose outputs are identical
        # to the plain jit path (same StableHLO); exercised here with a
        # small stand-in program on the CPU backend
        import jax.numpy as jnp

        from gatk_hc_tpu.ops import aot

        monkeypatch.setattr(aot, "_CACHE_DIR", str(tmp_path))

        def f(a, b):
            return jnp.log10(jnp.maximum(a * b + 1.0, 1e-30)).sum(axis=1)

        shapes = (
            jax.ShapeDtypeStruct((8, 16), jnp.float32),
            jax.ShapeDtypeStruct((8, 16), jnp.float32),
        )
        key = "test-prog-abc123"
        assert aot.load(key) is None
        aot.save(key, f, shapes)
        fn = aot.load(key)
        assert fn is not None
        rng = np.random.default_rng(3)
        a = rng.random((8, 16), np.float32)
        b = rng.random((8, 16), np.float32)
        np.testing.assert_array_equal(np.asarray(fn(a, b)), np.asarray(jax.jit(f)(a, b)))

    def test_source_hash_invalidates(self):
        from gatk_hc_tpu.ops import aot

        key1 = aot.planes_signature_key(
            "cpu", 8, 8, 32, 128, 256, 2, (0.1,) * 6
        )
        key2 = aot.planes_signature_key(
            "cpu", 8, 8, 32, 128, 256, 2, (0.2,) * 6
        )
        assert key1 != key2  # transition constants are part of the key


class TestMultihostManifest:
    def test_per_process_manifest_resume(self, tmp_path):
        """run_multihost with a manifest path checkpoints per process and
        resumes to identical output (single-process here; region ids are
        the same global index multihost shards use)."""
        import dataclasses
        import os

        from gatk_hc_tpu.parallel.multihost import run_multihost

        fixtures = os.path.join(os.path.dirname(__file__), "..", "fixtures")
        sam = os.path.join(fixtures, "chrM.sam")
        fa = os.path.join(fixtures, "chrM.fa")
        if not os.path.exists(sam):
            pytest.skip("fixture missing")
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
        )
        out1 = str(tmp_path / "a.vcf")
        mpath = str(tmp_path / "m.jsonl")
        run_multihost(sam, fa, out1, cfg, manifest_path=mpath)
        assert os.path.getsize(mpath + ".p0") > 0
        out2 = str(tmp_path / "b.vcf")
        run_multihost(sam, fa, out2, cfg, manifest_path=mpath)
        assert open(out1).read() == open(out2).read()


class TestGatherStats:
    def test_single_process_merge(self):
        from gatk_hc_tpu.parallel.multihost import gather_stats
        from gatk_hc_tpu.utils.logging import RunCounters, StageTimers

        counters = RunCounters(regions=10, variants=3, cell_updates=12345)
        timers = StageTimers()
        timers.add("assemble", 1.5)
        timers.add("pairhmm", 2.25)
        merged = gather_stats(counters, timers)
        assert merged["processes"] == 1
        assert merged["counters"]["regions"] == 10
        assert merged["counters"]["cell_updates"] == 12345
        assert merged["timers"]["pairhmm"] == 2.25
        assert merged["timers_max"]["assemble"] == 1.5
