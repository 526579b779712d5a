"""CLI integration: flag routing, -L interval restriction, manifest resume."""

import os
import subprocess
import sys

import pytest

from gatk_hc_tpu import native

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures")

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _run_cli(*args):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "gatk_hc_tpu.cli", *args],
        env=env, capture_output=True, text=True, timeout=300,
    )


def _fixture_args(out):
    sam = os.path.join(FIXTURES, "chrM.sam")
    fa = os.path.join(FIXTURES, "chrM.fa")
    if not os.path.exists(sam):
        pytest.skip("chrM fixture missing")
    return ["-I", sam, "-R", fa, "-O", out, "--pairhmm", "native"]


def _rows(path):
    return [l for l in open(path) if not l.startswith("#")]


def test_cli_native_matches_golden(tmp_path):
    out = str(tmp_path / "o.vcf")
    proc = _run_cli(*_fixture_args(out))
    assert proc.returncode == 0, proc.stderr[-2000:]
    golden = os.path.join(FIXTURES, "chrM.golden.vcf")
    assert open(out).read() == open(golden).read()


def test_cli_interval_restriction(tmp_path):
    full = str(tmp_path / "full.vcf")
    assert _run_cli(*_fixture_args(full)).returncode == 0
    part = str(tmp_path / "part.vcf")
    proc = _run_cli(*_fixture_args(part), "-L", "chrM:1-3000")
    assert proc.returncode == 0, proc.stderr[-2000:]
    full_rows = _rows(full)
    part_rows = _rows(part)
    assert 0 < len(part_rows) < len(full_rows)
    # restricted calls are a subset of the full run's calls
    assert set(part_rows) <= set(full_rows)
    assert all(int(r.split("\t")[1]) <= 3100 for r in part_rows)


def test_cli_interval_restriction_second_contig(tmp_path):
    """-L on a later contig: region ids are global across contigs, so the
    interval windows must resolve within ctgB's index range (a previous
    revision indexed windows from the first FASTA record only)."""
    import random

    from tests.test_multicontig import write_two_contig_fixture

    sam, fa, contigs = write_two_contig_fixture(tmp_path, random.Random(99))
    full = str(tmp_path / "full.vcf")
    args = ["-I", sam, "-R", fa, "--pairhmm", "native"]
    assert _run_cli(*args, "-O", full).returncode == 0
    part = str(tmp_path / "part.vcf")
    proc = _run_cli(*args, "-O", part, "-L", "ctgB:250-350")
    assert proc.returncode == 0, proc.stderr[-2000:]
    part_rows = _rows(part)
    # the planted ctgB SNP at position 300 must be called, and nothing
    # from ctgA may leak in
    assert part_rows and all(r.split("\t")[0] == "ctgB" for r in part_rows)
    assert any(int(r.split("\t")[1]) == 301 for r in part_rows)
    assert set(part_rows) <= {r for r in _rows(full) if r.startswith("ctgB")}


def test_cli_manifest_resume(tmp_path):
    manifest = str(tmp_path / "m.jsonl")
    out1 = str(tmp_path / "a.vcf")
    p1 = _run_cli(*_fixture_args(out1), "--manifest", manifest)
    assert p1.returncode == 0, p1.stderr[-2000:]
    size1 = os.path.getsize(manifest)
    assert size1 > 0
    # resume: second run reuses every region from the manifest and must
    # reproduce the identical VCF
    out2 = str(tmp_path / "b.vcf")
    p2 = _run_cli(*_fixture_args(out2), "--manifest", manifest)
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert open(out1).read() == open(out2).read()


def test_auto_engine_resolution():
    from gatk_hc_tpu.config import (
        AUTO_NATIVE_MAX_SAM_BYTES,
        resolve_auto_pairhmm_engine,
    )

    assert resolve_auto_pairhmm_engine(0) == "native"
    assert resolve_auto_pairhmm_engine(AUTO_NATIVE_MAX_SAM_BYTES - 1) == "native"
    assert resolve_auto_pairhmm_engine(AUTO_NATIVE_MAX_SAM_BYTES) == "pallas"
    assert resolve_auto_pairhmm_engine(50 * 1024 * 1024) == "pallas"


def test_cli_auto_engine_matches_golden(tmp_path):
    # chrM (1.1 MB SAM) is far below the auto threshold: the CLI must pick
    # the native engine (no jax startup) and still match golden exactly
    out = str(tmp_path / "o.vcf")
    args = _fixture_args(out)
    args[args.index("native")] = "auto"
    proc = _run_cli(*args, "--stats")
    assert proc.returncode == 0, proc.stderr[-2000:]
    golden = os.path.join(FIXTURES, "chrM.golden.vcf")
    assert open(out).read() == open(golden).read()
    import json

    stats = json.loads(proc.stdout.splitlines()[0])
    assert stats["engine"] == "native"
    assert stats["engine_requested"] == "auto"
