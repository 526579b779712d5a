"""Typed configuration for the TPU-native HaplotypeCaller engine.

The reference implementation scatters its tuning constants across headers as
``static constexpr`` values (see /root/reference/src/haplotypecaller/
haplotypecaller.hpp:112-113, assembler/assembler.hpp:15-18,
assembler/graph_wrapper.hpp:22-24, pairhmm/pairhmm.hpp:29-36,
genotyper/genotyper.hpp:15-19, smithwaterman/smithwaterman.hpp:21-24).
Here they live in one dataclass so every component reads the same source of
truth and tests can vary them.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple


def _env_choice(name: str, default: str, choices: Tuple[str, ...]) -> str:
    """Env override for a config default, rejected loudly at import instead
    of silently falling back (kernel selection used to be process-global
    module state read straight from the environment)."""
    value = os.environ.get(name, default)
    if value not in choices:
        raise ValueError(f"{name}={value!r}: expected one of {choices}")
    return value


def _env_float(name: str, default: float, minimum: float = 0.0) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        value = float(raw)
    except ValueError as exc:
        raise ValueError(f"{name}={raw!r}: expected a number") from exc
    if value < minimum:
        raise ValueError(f"{name}={value}: must be >= {minimum}")
    return value


def _env_int_choice(name: str, default: int, choices: Tuple[int, ...]) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        value = int(raw)
    except ValueError as exc:
        raise ValueError(f"{name}={raw!r}: expected an integer") from exc
    if value not in choices:
        raise ValueError(f"{name}={value}: expected one of {choices}")
    return value


@dataclasses.dataclass(frozen=True)
class SWParameters:
    """Affine-gap Smith-Waterman scoring parameters.

    Mirrors hc::SWAligner::SWParameters (smithwaterman.hpp:12-24).
    """

    w_match: int
    w_mismatch: int
    w_open: int
    w_extend: int


# The four presets from smithwaterman.hpp:21-24. The assembly path uses
# NEW_SW_PARAMETERS (the default argument of IntelSWAligner::align,
# intel_smithwaterman.hpp:31).
ORIGINAL_DEFAULT_SW = SWParameters(3, -1, -4, -3)
STANDARD_NGS_SW = SWParameters(25, -50, -110, -6)
NEW_SW_PARAMETERS = SWParameters(200, -150, -260, -11)
ALIGNMENT_TO_BEST_HAPLOTYPE_SW = SWParameters(10, -15, -30, -5)


@dataclasses.dataclass(frozen=True)
class HCConfig:
    """All pipeline constants, defaulting to the reference's behavior."""

    # --- Region walker (haplotypecaller.hpp:112-113) ---
    region_size: int = 245
    padding_size: int = 85

    # --- Downsampling -----------------------------------------------------
    # The reference picks ONE random read per alignment-start position with a
    # std::random_device-seeded mt19937 (haplotypecaller.hpp:44-50), which is
    # nondeterministic run-to-run.  We support:
    #   "first"  - deterministically keep the first read parsed at each start
    #   "seeded" - mt19937-style choice from a fixed seed (per position)
    downsample_mode: str = "first"
    downsample_seed: int = 0

    # --- Read filters (utils/read_filter.hpp) ---
    min_mapping_quality: int = 20          # read_filter.hpp:10
    min_read_length_after_trimming: int = 10  # read_filter.hpp:29

    # --- Assembler (assembler.hpp:15-18, graph_wrapper.hpp:22-24) ---
    initial_kmer_size: int = 25
    kmer_size_iteration_increase: int = 10
    max_kmer_iterations: int = 9
    max_unique_kmers_to_discard: int = 2000
    max_num_haplotypes: int = 128          # GraphWrapper::DEFAULT_NUM_PATHS
    prune_factor: int = 2                  # GraphWrapper::PRUNE_FACTOR
    min_base_quality_to_use: int = 10 + 33  # ASCII '+'-ish: Q10 + '!' offset

    # --- Smith-Waterman ---
    sw_params: SWParameters = NEW_SW_PARAMETERS
    sw_max_mismatches_all_match: int = 2   # MINIMAL_MISMATCH_TO_TOLERANCE

    # --- PairHMM ---
    # The main (Intel AVX) path derives transition probabilities from the
    # constant GOP='I'/GCP='+' strings using the RAW ASCII byte value as the
    # Phred index into ph2pr (avx-pairhmm-template.h:108-119 does
    # `tc->i[r-1] & 127` on ASCII 'I'==73 with no -33 offset).  This is a
    # deliberate behavioral replication of the reference main path; the
    # scalar oracle path in the reference subtracts the offset instead.
    gop_char: int = ord("I")               # sam.hpp:31
    gcp_char: int = ord("+")               # sam.hpp:32
    max_read_length: int = 200             # sam.hpp:30
    min_accepted_float: float = 1e-28      # pairhmm_common.h:16 (MIN_ACCEPTED)
    # Likelihood normalization + poorly-modeled-read filter
    # (intel_pairhmm.hpp:19-23)
    max_best_alt_likelihood_difference: float = -4.5
    expected_error_rate_per_base: float = 0.02
    log10_quality_per_base: float = -4.0
    max_expected_error_per_read: float = 2.0

    # --- Genotyper (genotyper.hpp:15-19) ---
    allele_extension: int = 2
    max_genotype_quality: int = 99
    min_heterozygosity_quality: int = 50
    max_allele_count: int = 7

    # --- VCF output (haplotypecaller.hpp:132-135) ---
    sample_name: str = "NA12878"

    # --- Device batching ---
    # (read, hap) pairs are padded into fixed-shape device tiles so XLA sees
    # only a handful of shapes.  Read rows pad to multiples of the stripe
    # height; hap columns pad to lane-friendly buckets.
    pair_batch: int = 128                  # pairs per device tile (lanes)
    stripe_height: int = 32                # sublanes per stripe (tuned on v5e)
    # Few, coarse buckets: each distinct (r_pad, c_pad) is a separate XLA
    # program and the TPU AOT toolchain here costs minutes per compile
    # (persistently cached; see tools/warm_cache.py).
    read_pad_buckets: Tuple[int, ...] = (96, 160, 224)   # stripe multiples
    # 448 covers every standard 245+2*85=415bp window's haplotypes (incl.
    # insertion slack) with 12.5% fewer padded DP cells than 512
    hap_pad_buckets: Tuple[int, ...] = (448, 512)
    # Fuse up to N same-signature single-chunk groups (either shipping
    # encoding: planes or packed) into ONE device launch (lax.map inside
    # one XLA program, bitwise identical per group).  The relay charges
    # ~4ms per launch regardless of size, so fusing amortizes per-dispatch
    # overhead.  1 = off (each group its own launch).
    fuse_groups: int = _env_int_choice(
        "GATK_HC_TPU_FUSE_GROUPS", 4, (1, 2, 3, 4, 6, 8, 16)
    )
    # When True (default), fuse_groups applies only while the dispatch
    # controller MEASURES a DEEPLY degraded phase (per-pair cost > 6x its
    # best-ever; the 2x threshold only coarsens chunks).  The round-5
    # interleaved sweep showed why a static always-fuse default is wrong:
    # under the depth-3 pipelined stream, per-op LATENCY is already hidden
    # (one-launch packed unfused: median 69.3 G vs packed-fused4 60.7 G in
    # the same phase), while fusion still wins when the relay throttles op
    # THROUGHPUT (r4 deep-degraded: fused4 25-29 G vs unfused 17.7 G).
    # False = always fuse when fuse_groups > 1 (bench arms / tests set
    # this for determinism; also the way to get fusion under a FORCED
    # dispatch_mode or short runs, where the controller never calibrates
    # and the measured gate therefore never opens).
    fuse_auto: bool = _env_choice(
        "GATK_HC_TPU_FUSE_AUTO", "1", ("0", "1")
    ) == "1"

    # --- Engine selection ---
    # "pallas": TPU Pallas kernel;  "jax": pure-jnp fallback;
    # "native": C++ host engine;    "python": slow exact reference oracle;
    # "auto": native below AUTO_NATIVE_MAX_SAM_BYTES, pallas above (all
    # engines are bit-exact, so the choice is latency-only — see
    # resolve_auto_pairhmm_engine)
    pairhmm_engine: str = "pallas"
    assembler_engine: str = "native"       # "native" | "python"
    data_engine: str = "auto"              # "auto" | "native" | "python":
    # columnar C++ SAM parse + window prep vs per-record Python objects
    # "host": exact NumPy f64 reductions (default; bit-exact with the
    # reference).  "jax": batched device reductions (ops/genotyper_jax.py)
    # for pod-scale runs where genotyping shards next to PairHMM — exact
    # f64 on CPU backends, f32 on TPU (GQ may differ at f32 rounding
    # boundaries, hence not the default).
    genotyper_engine: str = "host"         # "host" | "jax"
    f64_rescue: str = "sentinel"           # "sentinel" | "exact": underflowed
    # f32 pairs get a provably VCF-neutral stand-in vs the reference's exact
    # float64 recomputation (see ops/pairhmm_oracle.py::RESCUE_SENTINEL_LOG10)
    sw_engine: str = "native"              # "native" | "python"
    # Pallas kernel selection (A/B hooks; env overrides validated at import):
    # "ppe" = pair-per-element production kernel where shapes allow, falling
    # back to striped; "striped" = force the anti-diagonal kernel everywhere
    pallas_algo: str = _env_choice(
        "GATK_HC_TPU_PALLAS_ALGO", "ppe", ("ppe", "striped")
    )
    # Dispatch shipping encoding for the ppe kernel.  "planes" ships
    # host-prepared i32 element planes (12 B/base, fewest device ops);
    # "packed" ships raw uint8 (2 B/base) and unpacks with one device-side
    # gather.  Which wins depends on the relay phase (per-op cost inflates
    # up to ~7x for minutes-to-hours), so "adaptive" times one group on
    # each path and keeps choosing the measured winner, re-calibrating
    # periodically.  Short runs (< ~32 groups) stay on planes and never pay
    # the packed path's one-time trace cost.
    dispatch_mode: str = _env_choice(
        "GATK_HC_TPU_DISPATCH", "adaptive", ("adaptive", "planes", "packed")
    )
    # Minimal-bytes packed shipping (the r5 bandwidth-probe lever: the
    # relay moves ~100 MB/s and transfers serialize with compute, so bytes
    # ARE wall time).  When a single-chunk unfused packed group's read
    # bytes fit a (<=8 seq symbols) x (<=32 qual symbols) dictionary —
    # always, for ACGTN reads with <=32 distinct quality bytes — the read
    # planes ship as 1 B/base nibble pairs + a 72-entry mini-table, and the
    # (2, B) pair-index arrays are replaced by a per-job span table
    # expanded on device (pairhmm_pallas_packed_nib, bitwise identical).
    # Groups whose alphabets overflow fall back to the raw packed program.
    packed_nib: bool = _env_choice(
        "GATK_HC_TPU_PACKED_NIB", "1", ("0", "1")
    ) == "1"
    # Rows swept per grid step in the ppe kernel.  4 measured fastest on
    # the v5e (149.5 vs 134.8 Gcells/s true for 2; tools/kernel_bench.py
    # 2026-08-17) and is hardware-verified bitwise-identical to 1/2-row.
    ppe_rows: int = _env_int_choice("GATK_HC_TPU_PPE_ROWS", 4, (1, 2, 4, 8))
    # Host-side region pipeline threads (prepare + assemble + job packing
    # run in a pool; ctypes releases the GIL, so this scales with cores —
    # the reference's OpenMP analogue for the HOST stages).  0 = one thread
    # per CPU; 1 = inline single-thread path.
    host_threads: int = 0
    # Bounded-memory data path for whole-genome inputs: parse one contig's
    # reads at a time (one cheap ranged scan of the whole file, then a
    # per-contig slice parse) and free each contig's columns when its last
    # region has been assembled.  Peak RSS is then O(largest contig's
    # reads), not O(whole SAM) — the reference holds every read in RAM
    # (haplotypecaller.hpp:24-42).  Only affects the columnar data engine.
    stream_contigs: bool = False
    # Streaming parse-ahead: while contig N assembles, slice-parse contig
    # N+1's columns on one background thread, so the walk never blocks on
    # a parse after the first contig (the native parse releases the GIL;
    # on multi-core hosts the overlap is full, on one core the file I/O
    # still overlaps).  Costs up to one extra contig's columns in RSS —
    # peak becomes O(2 largest contigs) instead of O(largest); disable for
    # the strict bound.  No effect without stream_contigs.
    parse_ahead: bool = True
    # Device-wedge failover: if resolving/fetching a submitted PairHMM
    # batch blocks longer than this (seconds), the runner declares the
    # device path wedged and recomputes on the bit-exact C++ engine, so a
    # WGS run completes (slower) instead of hanging forever.  The tunnelled
    # TPU here has been observed fully wedged for 5+ hours mid-phase.
    # Generous by design: a degraded-but-alive relay legitimately spends
    # minutes on first program loads, and a timeout alone does not declare
    # the wedge — a live health probe grants bounded extensions first
    # (ops/runner.py::MAX_SLOW_EXTENSIONS).  0 disables the failover.
    device_timeout_s: float = _env_float("GATK_HC_TPU_DEVICE_TIMEOUT", 1200.0)


DEFAULT_CONFIG = HCConfig()


# --pairhmm auto: below this input size the native C++ engine wins on
# latency — jax backend init + AOT load + first relay dispatch cost
# ~1.5-3 s that a chrM-scale run (device compute « 1 s) never amortizes,
# while at 32 MB of SAM (~0.4 Mb of 30x contig, ~10 Gcells of PairHMM)
# the device path is already >5x faster end-to-end.  Latency-only choice:
# every engine is bit-exact (the chrM golden VCF is byte-identical across
# all of them), so auto can never change output.
AUTO_NATIVE_MAX_SAM_BYTES = 32 * 1024 * 1024


def resolve_auto_pairhmm_engine(sam_bytes: int) -> str:
    """Pick the PairHMM engine for ``--pairhmm auto`` from input size."""
    return "native" if sam_bytes < AUTO_NATIVE_MAX_SAM_BYTES else "pallas"
