"""Multi-host scale-out: region sharding + variant gathering.

Reference analogue: none — the reference is a single-node OpenMP program
(SURVEY.md §5).  Design per SURVEY.md §7 step 7:

* ``jax.distributed`` over DCN; each host parses its own SAM shard
  (FASTA and config replicated);
* regions are partitioned contiguously across processes, so each host's
  assembler feeds only its own chips;
* per-region variant rows encode to a flat fixed-width record array
  (device-friendly, cf. the reference's unused Boost-serialization hooks,
  sam.hpp:51-65) and gather to every host with
  ``multihost_utils.process_allgather``; process 0 writes the single VCF in
  region order.

Runs unchanged in single-process mode (trivial partition, no-op gather).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..config import HCConfig
from ..models.haplotype import Variant
from ..utils.interval import Interval

# flat record: region, contig id, begin, end, gt pair, gq, then allele lens
_MAX_ALLELES = 8
_MAX_ALLELE_LEN = 64
_FIXED_COLS = 7


def distributed_init(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op otherwise.
    Returns (process_index, process_count)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def partition_regions(n_regions: int, process_index: int, process_count: int):
    """Contiguous block partition; block i -> process i."""
    per = -(-n_regions // process_count)
    start = process_index * per
    return range(start, min(start + per, n_regions))


def shard_start_ranges(contigs, cfg: HCConfig, region_range: range):
    """Per-contig 0-based start-position spans a process's region block can
    select reads from — the columnar parse filter for the per-host SAM
    shard (each host materializes only its own reads instead of N full
    parses; SURVEY.md §7 step 7).

    Windows pick reads by START position inside their padded interval
    (models/downsampler.py), so the span for a contiguous run of local
    windows [first, last] is [first's padded begin, last's padded end):
    window 0 is only end-padded, later windows pad both sides
    (models/caller.py::iter_windows).  Reads in the overlap between two
    shards' spans are parsed by both — exactly the reads whose windows
    straddle the shard boundary."""
    ranges = {}
    base = 0
    for c in contigs:
        size = len(c.seq)
        n_c = (size + cfg.region_size - 1) // cfg.region_size
        lo_id = max(region_range.start, base)
        hi_id = min(region_range.stop, base + n_c)
        if lo_id < hi_id:
            first_local = lo_id - base
            last_local = hi_id - base - 1
            lo = (
                0
                if first_local == 0
                else first_local * cfg.region_size - cfg.padding_size
            )
            hi = min(
                size, (last_local + 1) * cfg.region_size + cfg.padding_size
            )
            ranges[c.name] = (lo, hi)
        base += n_c
    return ranges


def encode_variants(
    region_ids: Sequence[int],
    variants: Sequence[Variant],
    contig_names: Sequence[str] = (),
):
    """Variants -> (int32 table, uint8 allele blob) fixed-width records.
    Records carry the contig as an index into ``contig_names`` (FASTA
    order), so multi-contig runs gather losslessly.  Unknown contigs raise
    (a silent index-0 relabel would corrupt the gathered VCF)."""
    if isinstance(contig_names, str):
        contig_names = (contig_names,)
    index = {name: i for i, name in enumerate(contig_names)}
    n = len(variants)
    table = np.zeros((n, _FIXED_COLS + _MAX_ALLELES), dtype=np.int32)
    blob = np.zeros((n, _MAX_ALLELES, _MAX_ALLELE_LEN), dtype=np.uint8)
    for i, (rid, v) in enumerate(zip(region_ids, variants)):
        alleles = v.alleles[:_MAX_ALLELES]
        if v.location.contig not in index:
            # fail loudly: relabeling to contig 0 would silently corrupt
            # the gathered VCF if the contig/FASTA invariant ever broke
            raise KeyError(
                f"variant contig {v.location.contig!r} not in FASTA "
                f"contigs {list(contig_names)!r}"
            )
        table[i, :_FIXED_COLS] = (
            rid, index[v.location.contig],
            v.location.begin, v.location.end, v.gt[0], v.gt[1], v.gq,
        )
        for a, allele in enumerate(alleles):
            encoded = allele.encode()[:_MAX_ALLELE_LEN]
            table[i, _FIXED_COLS + a] = len(encoded)
            blob[i, a, : len(encoded)] = np.frombuffer(encoded, dtype=np.uint8)
    return table, blob


def decode_variants(
    table: np.ndarray, blob: np.ndarray, contig_names: Sequence[str]
):
    """Inverse of encode_variants -> [(region_id, Variant)] sorted by
    (region, begin).  ``contig_names`` may be a single name (str) for
    single-contig convenience."""
    if isinstance(contig_names, str):
        contig_names = (contig_names,)
    out = []
    for i in range(table.shape[0]):
        rid, cid, begin, end, gt1, gt2, gq = (
            int(x) for x in table[i, :_FIXED_COLS]
        )
        alleles = []
        for a in range(_MAX_ALLELES):
            ln = int(table[i, _FIXED_COLS + a])
            if ln == 0 and a > 0:
                break
            alleles.append(blob[i, a, :ln].tobytes().decode())
        out.append(
            (
                rid,
                Variant(
                    location=Interval(contig_names[cid], begin, end),
                    alleles=tuple(alleles),
                    gt=(gt1, gt2),
                    gq=gq,
                ),
            )
        )
    out.sort(key=lambda item: (item[0], item[1].location.begin))
    return out


def gather_variants(
    region_ids: Sequence[int],
    variants: Sequence[Variant],
    contig_names: Sequence[str],
):
    """All-gather variant records across processes (no-op single-process)."""
    import jax

    if isinstance(contig_names, str):
        contig_names = (contig_names,)
    table, blob = encode_variants(region_ids, variants, contig_names)
    if jax.process_count() == 1:
        return decode_variants(table, blob, contig_names)
    from jax.experimental import multihost_utils

    # pad to a common max count across processes
    counts = multihost_utils.process_allgather(np.array([table.shape[0]]))
    max_n = int(np.max(counts))
    pad = max_n - table.shape[0]
    table_p = np.pad(table, ((0, pad), (0, 0)), constant_values=-1)
    blob_p = np.pad(blob, ((0, pad), (0, 0), (0, 0)))
    tables = multihost_utils.process_allgather(table_p)
    blobs = multihost_utils.process_allgather(blob_p)
    tables = tables.reshape(-1, table.shape[1])
    blobs = blobs.reshape(-1, _MAX_ALLELES, _MAX_ALLELE_LEN)
    valid = tables[:, 0] >= 0
    return decode_variants(tables[valid], blobs[valid], contig_names)


_STATS_PAD = 8192


def gather_stats(counters, timers):
    """All-reduce of run counters + stage timers across processes (SURVEY.md
    §5: the distributed equivalent of the reference's stdout progress is an
    all-reduce of metrics).  Every process must call this (it is a
    collective); returns the merged dict on all of them.

    Counters sum; timers sum (they are per-process thread-seconds) and a
    per-stage max is included as ``timers_max`` — the straggler view, which
    is what scaling efficiency is measured against."""
    import dataclasses as _dc
    import jax

    payload = json.dumps(
        {
            "counters": _dc.asdict(counters) if counters is not None else {},
            "timers": dict(timers.totals) if timers is not None else {},
        }
    ).encode()
    if len(payload) > _STATS_PAD:
        raise ValueError(f"stats payload {len(payload)}B exceeds {_STATS_PAD}")
    if jax.process_count() == 1:
        rows = [payload]
    else:
        from jax.experimental import multihost_utils

        buf = np.zeros(_STATS_PAD, np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, dtype=np.uint8)
        gathered = multihost_utils.process_allgather(buf)
        rows = [
            bytes(row[row != 0].tobytes()) for row in np.asarray(gathered)
        ]
    counters_sum: dict = {}
    timers_sum: dict = {}
    timers_max: dict = {}
    for row in rows:
        decoded = json.loads(row.decode())
        for k, v in decoded["counters"].items():
            counters_sum[k] = counters_sum.get(k, 0) + v
        for k, v in decoded["timers"].items():
            timers_sum[k] = timers_sum.get(k, 0.0) + v
            timers_max[k] = max(timers_max.get(k, 0.0), v)
    return {
        "processes": len(rows),
        "counters": counters_sum,
        "timers": {k: round(v, 4) for k, v in timers_sum.items()},
        "timers_max": {k: round(v, 4) for k, v in timers_max.items()},
    }


def run_multihost(
    sam_path: str,
    fasta_path: str,
    out_path: Optional[str],
    cfg: HCConfig,
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    logger=None,
    timers=None,
    counters=None,
    manifest_path: Optional[str] = None,
):
    """Whole-pipeline multi-host entry: shard regions, call, gather, write.

    Returns (local RegionResults, merged [(region_id, Variant)]).  The
    region id space is the same contig-major global index that
    call_batched's all_windows() walks, so multi-contig inputs shard
    correctly (a previous revision sized regions from the first FASTA
    record only and silently dropped later contigs)."""
    from ..io.fasta import read_all_fasta
    from ..models.caller import call_batched, vcf_header
    from ..utils.logging import NULL_LOGGER

    pidx, pcount = distributed_init(coordinator, num_processes, process_id)
    contigs = read_all_fasta(fasta_path)
    contig_names = [c.name for c in contigs]
    n_regions = sum(
        (len(c.seq) + cfg.region_size - 1) // cfg.region_size for c in contigs
    )
    mine = partition_regions(n_regions, pidx, pcount)
    mine_set = set(mine)

    manifest = None
    if manifest_path is not None:
        # per-process manifest: region ids are the global index, so each
        # shard's checkpoint file resumes independently
        from .checkpoint import RegionManifest

        manifest = RegionManifest(f"{manifest_path}.p{pidx}")

    results = call_batched(
        sam_path, fasta_path, None, cfg,
        region_filter=lambda i: i in mine_set,
        logger=logger or NULL_LOGGER,
        timers=timers, counters=counters,
        manifest=manifest,
        # shard parse: this process materializes only the reads its padded
        # windows can select instead of the whole file
        start_ranges=shard_start_ranges(contigs, cfg, mine),
    )
    region_ids: List[int] = []
    variants: List[Variant] = []
    # results arrive in region order for our contiguous block
    base = mine.start if len(mine) else 0
    for offset, region in enumerate(results):
        for v in region.variants:
            region_ids.append(base + offset)
            variants.append(v)

    merged = gather_variants(region_ids, variants, contig_names)
    if out_path is not None and pidx == 0:
        with open(out_path, "w") as handle:
            handle.write(
                vcf_header([(c.name, len(c.seq)) for c in contigs], cfg)
            )
            for _, variant in merged:
                handle.write(variant.to_vcf_row())
    return results, merged
