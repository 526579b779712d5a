"""Real 2-process jax.distributed run of the multi-host pipeline.

Spawns two OS processes that initialize jax.distributed over localhost
(CPU backend), shard the chrM regions contiguously, call their shards,
all-gather the encoded variant records, and have process 0 write the VCF —
which must be byte-identical to the single-process golden file.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")

_WORKER = r"""
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.parallel.multihost import run_multihost

pid = int(sys.argv[1])
cfg = dataclasses.replace(
    DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
)
from gatk_hc_tpu.utils.logging import RunCounters, StageTimers
counters, timers = RunCounters(), StageTimers()
run_multihost(
    {sam!r}, {fa!r}, {out!r} if pid == 0 else None, cfg,
    coordinator={coord!r}, num_processes=2, process_id=pid,
    counters=counters, timers=timers,
)
# cross-process observability: merged counters must cover the whole contig,
# not just this process's shard (collective — both processes participate)
from gatk_hc_tpu.parallel.multihost import gather_stats
merged = gather_stats(counters, timers)
assert merged["processes"] == 2, merged
if pid == 0:
    from gatk_hc_tpu.io.fasta import read_all_fasta
    n_regions = sum(
        (len(c.seq) + cfg.region_size - 1) // cfg.region_size
        for c in read_all_fasta({fa!r})
    )
    assert merged["counters"]["regions"] == n_regions, merged
    assert merged["counters"]["regions"] > counters.regions
    assert merged["counters"]["variants"] >= counters.variants
    print("merged stats ok")
print("proc", pid, "done")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_matches_golden(tmp_path):
    sam = os.path.join(FIXTURES, "chrM.sam")
    fa = os.path.join(FIXTURES, "chrM.fa")
    golden = os.path.join(FIXTURES, "chrM.golden.vcf")
    if not (os.path.exists(sam) and os.path.exists(golden)):
        pytest.skip("chrM fixture missing")
    out = str(tmp_path / "mh.vcf")
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=REPO, sam=sam, fa=fa, out=out, coord=coord)

    env = dict(os.environ)
    # drop the sandbox's axon sitecustomize so the CPU backend is used
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    with open(out) as f1, open(golden) as f2:
        assert f1.read() == f2.read()


@pytest.mark.slow
def test_two_process_multicontig_matches_single(tmp_path):
    """2-contig input, 2 processes: the global (contig-major) region id
    space must shard across processes without dropping later contigs, and
    the gathered VCF must byte-match a single-process run."""
    import dataclasses
    import random

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.parallel.multihost import run_multihost
    from tests.test_multicontig import write_two_contig_fixture

    rng = random.Random(7)
    sam, fa, _contigs = write_two_contig_fixture(tmp_path, rng)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, pairhmm_engine="native", assembler_engine="native"
    )
    single_out = str(tmp_path / "single.vcf")
    run_multihost(sam, fa, single_out, cfg)
    single_text = open(single_out).read()
    body = [l for l in single_text.splitlines() if not l.startswith("#")]
    assert {l.split("\t")[0] for l in body} == {"ctgA", "ctgB"}

    out = str(tmp_path / "mh2.vcf")
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=REPO, sam=sam, fa=fa, out=out, coord=coord)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, stdout.decode(errors="replace")[-2000:]

    assert open(out).read() == single_text


@pytest.mark.slow
def test_two_process_shardmap_matches_golden(tmp_path):
    """2 jax.distributed processes, each with a 4-virtual-device local
    (data=2, hap=2) mesh, PairHMM through the shard_map runner, exact host
    finalize: the gathered VCF must byte-match the golden (VERDICT r3 #7 —
    the pod-scale path produces the golden VCF in a real multi-process
    run)."""
    sam = os.path.join(FIXTURES, "chrM.sam")
    fa = os.path.join(FIXTURES, "chrM.fa")
    golden = os.path.join(FIXTURES, "chrM.golden.vcf")
    if not (os.path.exists(sam) and os.path.exists(golden)):
        pytest.skip("chrM fixture missing")
    out = str(tmp_path / "mh_shardmap.vcf")
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER.format(repo=REPO, sam=sam, fa=fa, out=out, coord=coord)
    script = script.replace('pairhmm_engine="native"', 'pairhmm_engine="shardmap"')

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text[-2000:]

    with open(out) as f1, open(golden) as f2:
        assert f1.read() == f2.read()
