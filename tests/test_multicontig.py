"""Multi-contig calling (generalization over the single-contig reference)."""

import dataclasses
import random

from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.io.fasta import FastaRecord, write_fasta
from gatk_hc_tpu.models.caller import call_batched
from tests.conftest import random_dna


def write_two_contig_fixture(tmp_path, rng):
    contigs = []
    sam_lines = []
    for name in ("ctgA", "ctgB"):
        ref = random_dna(rng, 600)
        snp_pos = 300
        alt_base = "A" if ref[snp_pos] != "A" else "T"
        alt = ref[:snp_pos] + alt_base + ref[snp_pos + 1 :]
        contigs.append((FastaRecord(name, "", ref), snp_pos, ref[snp_pos], alt_base))
        for i in range(120):
            hap = ref if rng.random() < 0.5 else alt
            start = rng.randint(0, len(hap) - 100)
            seq = hap[start : start + 100]
            sam_lines.append(
                f"r{name}{i}\t99\t{name}\t{start + 1}\t60\t100M\t=\t"
                f"{start + 1}\t200\t{seq}\t{'I' * 100}"
            )
    fasta_path = tmp_path / "multi.fa"
    sam_path = tmp_path / "multi.sam"
    write_fasta(str(fasta_path), [c[0] for c in contigs])
    with open(sam_path, "w") as handle:
        handle.write("@HD\tVN:1.6\n")
        for record, _, _, _ in contigs:
            handle.write(f"@SQ\tSN:{record.name}\tLN:{len(record.seq)}\n")
        handle.write("\n".join(sam_lines) + "\n")
    return str(sam_path), str(fasta_path), contigs


def test_calls_on_both_contigs(tmp_path):
    rng = random.Random(99)
    sam, fasta, contigs = write_two_contig_fixture(tmp_path, rng)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        pairhmm_engine="native",
        assembler_engine="native",
    )
    from gatk_hc_tpu.ops.runner import PairHMMJob

    # use the native engine through a tiny runner shim for CPU determinism
    class NativeRunner:
        def run(self, jobs):
            from gatk_hc_tpu.native import native_pairhmm_engine
            from gatk_hc_tpu.models.haplotype import Haplotype
            from gatk_hc_tpu.io.sam import SAMRecord

            engine = native_pairhmm_engine(cfg)
            for job in jobs:
                reads = [
                    SAMRecord("r", 0, "c", 1, 60, (), "=", 1, 0,
                              b.tobytes().decode(), q.tobytes().decode())
                    for b, q in job.reads
                ]
                haps = [Haplotype(h.tobytes().decode()) for h in job.haps]
                job.result = engine(reads, haps)

    out = tmp_path / "multi.vcf"
    results = call_batched(sam, fasta, str(out), cfg, runner=NativeRunner())
    rows = [l.split("\t") for l in open(out) if not l.startswith("#")]
    chroms = {row[0] for row in rows}
    assert chroms == {"ctgA", "ctgB"}
    # planted het SNPs found at the right positions
    for record, snp_pos, ref_base, alt_base in contigs:
        matches = [
            row for row in rows
            if row[0] == record.name and int(row[1]) == snp_pos + 1
        ]
        assert matches, f"missing SNP on {record.name}"
        assert matches[0][3] == ref_base and matches[0][4] == alt_base
