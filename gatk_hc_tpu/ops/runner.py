"""Cross-region PairHMM dispatch runner — the production device path.

The region pipeline produces many small (reads × haps) jobs; dispatching each
separately would drown in per-call host↔device latency.  The runner:

1. groups jobs greedily until a dispatch fills up (pair budget / unique-read
   budget / unique-hap budget);
2. ships each group's UNIQUE reads and haplotypes once, as uint8, into
   fixed-shape tables (bucketed so XLA compiles only a few programs);
3. expands (read, hap) pairs on device (gathers) and runs the Pallas kernel;
4. scatters raw f32 probabilities back to per-job read-major matrices and
   finalizes log10 likelihoods (sentinel or exact host float64 rescue for
   underflowed pairs, cfg.f64_rescue).

This is the TPU equivalent of the reference's flat testcase batch + OpenMP
loop (intel_pairhmm.hpp:115-203).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import HCConfig
from ..utils.logging import process_age_s as _process_age_s
from ..utils.quality import BASE_TABLE, INITIAL_CONSTANT_F32, PH2PR_F32

ReadArray = Tuple[np.ndarray, np.ndarray]  # (bases u8, quals u8)


@dataclasses.dataclass
class PairHMMJob:
    """One region's likelihood request.

    Every read and haplotype must be non-empty (the pipeline's
    min_read_length_after_trimming filter guarantees this on the production
    path; the check makes the public API safe too — a zero-length row would
    otherwise hit the underflow-rescue path with an undefined likelihood).

    NOTE on ``result``: under the default cfg.f64_rescue="sentinel", entries
    whose f32 forward probability underflowed MIN_ACCEPTED hold
    RESCUE_SENTINEL_LOG10 (-100.0) instead of the reference's exact f64
    recompute.  This is provably VCF-neutral through normalize_and_filter,
    but any NEW consumer of raw likelihoods (annotations, QUAL refinement)
    must either tolerate sentinels below -64.1 or run with
    f64_rescue="exact".
    """

    reads: Sequence[ReadArray]
    haps: Sequence[np.ndarray]
    # filled by the runner: read-major log10 matrix (n_reads, n_haps).
    # CAVEAT: with cfg.f64_rescue="sentinel" (default), underflowed entries
    # hold RESCUE_SENTINEL_LOG10 (-100.0), not exact values — see the class
    # docstring before consuming raw likelihoods downstream.
    result: Optional[np.ndarray] = None

    def __post_init__(self) -> None:
        off = getattr(self.reads, "off", None)
        if off is not None:  # columnar ReadPairs: vectorized check (the
            # cached .lengths diff is reused by group packing later)
            reads_ok = len(off) < 2 or int(self.reads.lengths.min()) > 0
        else:
            reads_ok = all(len(b) for b, _ in self.reads)
        if not reads_ok or any(len(h) == 0 for h in self.haps):
            raise ValueError("PairHMMJob rows must be non-empty")


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    raise ValueError(f"value {value} exceeds largest bucket {buckets[-1]}")


class DispatchPathController:
    """Measured planes-vs-packed selection for relay-phase adaptation.

    The relay-tunnelled TPU's per-op cost inflates up to ~7x in degraded
    phases that last minutes to hours, flipping which shipping encoding is
    cheaper (planes: 12 B/base, fewest ops; packed: 2 B/base + a device
    gather).  Instead of a hand-tuned cost model, the runner times one
    END-TO-END group per path (device_put + dispatch + block) and keeps
    dispatching on the measured winner, re-timing the staler path every
    ``recal_every`` groups so a phase change flips the choice within one
    calibration cycle.

    Short runs never pay for this: calibration starts only after
    ``min_groups`` groups (a chrM-sized run has ~5), so the planes default
    and its AOT-cached programs serve small inputs untouched."""

    PATHS = ("planes", "packed")

    def __init__(self, forced: Optional[str] = None, min_groups: int = 32,
                 recal_every: int = 32):
        self.forced = forced
        self.min_groups = min_groups
        self.recal_every = recal_every
        self.groups = 0
        # path -> (seconds per pair, group index of the measurement)
        self.measured: Dict[str, Tuple[float, int]] = {}

    def choose(self) -> Tuple[str, bool]:
        """-> (path, calibrate): when calibrate is True the caller times
        the group synchronously and reports via record()."""
        if self.forced is not None:
            return self.forced, False
        self.groups += 1
        if self.groups < self.min_groups:
            return "planes", False
        for path in self.PATHS:
            if path not in self.measured:
                return path, True
        stale = min(self.PATHS, key=lambda p: self.measured[p][1])
        if self.groups - self.measured[stale][1] >= self.recal_every:
            return stale, True
        return min(self.PATHS, key=lambda p: self.measured[p][0]), False

    def record(self, path: str, sec_per_pair: float) -> None:
        self.measured[path] = (sec_per_pair, self.groups)

    def degraded(self, factor: float = 2.0) -> bool:
        """True once measurements show the slow phase (winner's per-pair
        cost more than ``factor``x its best historical) — callers coarsen
        chunk sizes to cut op count at the default 2x."""
        if not self.measured:
            return False
        best_now = min(v[0] for v in self.measured.values())
        floor = getattr(self, "_best_ever", None)
        if floor is None or best_now < floor:
            self._best_ever = floor = best_now
        return best_now > factor * floor

    # Fusion gate: the calibration measurement is SYNCHRONOUS (device_put +
    # dispatch + block), i.e. latency-inclusive — and in latency-degraded /
    # throughput-fine phases fusion measured ~12% SLOWER than the pipelined
    # unfused packed stream (sustained_sweep_r5.json).  Fusion only wins in
    # op-THROUGHPUT collapses (r4 deep-degraded: 17.7 -> 25-29 G), which
    # show up as much larger multiples of the best-ever per-pair cost, so
    # the fuse_auto gate requires a DEEP degradation, not the 2x chunk-
    # coarsening threshold.
    DEEP_DEGRADATION_FACTOR = 6.0

    def deeply_degraded(self) -> bool:
        return self.degraded(self.DEEP_DEGRADATION_FACTOR)


class _SubmitHandle:
    """Opaque token for an in-flight submit(); resolve() joins the dispatch
    worker and returns (jobs, submitted, coalesced, layout), re-raising any
    packing/dispatch error.  ``jobs`` is kept on the handle so the wedge
    failover can recompute them on the CPU engine if the worker never
    returns."""

    __slots__ = ("_fut", "jobs")

    def __init__(self, fut, jobs) -> None:
        self._fut = fut
        self.jobs = jobs

    def resolve(self, timeout: Optional[float] = None):
        return self._fut.result(timeout)


class _ImmediateFuture:
    """Pre-completed future for jobs already finalized at submit time
    (post-wedge native fallback)."""

    def result(self, timeout=None):
        return None


_DONE_FUTURE = _ImmediateFuture()
_WEDGED = object()  # sentinel: a resolve() that never completed


class _WorkerFuture:
    """Minimal future for _DaemonWorker tasks."""

    __slots__ = ("_done", "_result", "_exc")

    def __init__(self):
        import threading

        self._done = threading.Event()
        self._result = None
        self._exc = None

    def _set(self, result=None, exc=None):
        self._result, self._exc = result, exc
        self._done.set()

    def result(self, timeout=None):
        if not self._done.wait(timeout):
            raise TimeoutError("worker task still running")
        if self._exc is not None:
            raise self._exc
        return self._result


# Bounded exit policy for every device-touching helper thread: all are
# DAEMON (a relay call wedged inside one must not block process exit — the
# reason the wedge failover exists), but an atexit hook waits up to
# _EXIT_JOIN_S for them to go idle so that in the HEALTHY case interpreter
# teardown never runs concurrently with an in-flight PJRT call (which can
# abort the process).  120 s covers the longest legitimate in-flight unit
# (one cold program load, observed 15-80 s); a wedged thread is abandoned
# after the bound instead of hanging exit forever.
_EXIT_JOIN_S = 120.0
_EXIT_WAITERS: List = []  # callables: (deadline_fn) -> None


def _join_device_threads() -> None:
    import time as _time

    deadline = _time.monotonic() + _EXIT_JOIN_S
    for wait in list(_EXIT_WAITERS):
        try:
            wait(max(0.0, deadline - _time.monotonic()))
        except Exception:
            pass


def _register_exit_wait(wait_fn) -> None:
    if not _EXIT_WAITERS:
        import atexit

        atexit.register(_join_device_threads)
    _EXIT_WAITERS.append(wait_fn)


class _DaemonWorker:
    """Single FIFO DAEMON worker thread.  Unlike ThreadPoolExecutor —
    whose workers are non-daemon and joined at interpreter exit — a task
    wedged inside a blocked relay call cannot prevent the process from
    exiting, which is the whole point of the device-wedge failover.  The
    module atexit hook (_join_device_threads) still waits — bounded — for
    the worker to go idle, so healthy in-flight device calls complete
    before interpreter teardown."""

    def __init__(self, name: str):
        import queue
        import threading

        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._lock = threading.Lock()
        self._pending = 0
        self._idle = threading.Event()
        self._idle.set()
        self.abandoned = False  # set by the wedge failover: exit must
        # not wait for a worker known to be blocked in a dead relay call
        self._t = threading.Thread(target=self._loop, name=name, daemon=True)
        self._t.start()
        _register_exit_wait(self.wait_idle)

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            fn, args, fut = item
            try:
                fut._set(result=fn(*args))
            except BaseException as exc:  # delivered at fut.result()
                fut._set(exc=exc)
            finally:
                with self._lock:
                    self._pending -= 1
                    if self._pending == 0:
                        self._idle.set()

    def submit(self, fn, *args) -> _WorkerFuture:
        fut = _WorkerFuture()
        with self._lock:
            self._pending += 1
            self._idle.clear()
        self._q.put((fn, args, fut))
        return fut

    def wait_idle(self, timeout: Optional[float] = None) -> bool:
        if self.abandoned:
            return True
        return self._idle.wait(timeout)


class PallasPairHMMRunner:
    """Batches PairHMMJobs into fixed-shape Pallas dispatches."""

    # Bucketed table shapes: a handful of (NR, NH) programs per
    # (r_pad, c_pad), compiled once and cached persistently.
    READ_BUCKETS = (1024, 4096)
    HAP_BUCKETS = (128, 512)

    def __init__(self, cfg: HCConfig, pair_budget: Optional[int] = None,
                 interpret: Optional[bool] = None, devices=None):
        import jax

        from .pairhmm_jax import transition_constants

        self.cfg = cfg
        self.trans = transition_constants(cfg.gop_char, cfg.gcp_char)
        self.interpret = (
            jax.default_backend() not in ("tpu", "axon")
            if interpret is None
            else interpret
        )
        # Multi-chip: dispatch groups round-robin across the process's local
        # devices (the TPU-native replacement for the reference's OpenMP
        # fan-out over pairs, intel_pairhmm.hpp:128-131, at group
        # granularity).  Groups are independent, so placement never affects
        # results — a 1-device host degenerates to the single-chip path.
        self._devices = list(devices) if devices is not None else jax.local_devices()
        self._next_device = 0
        # test hook: lets CPU (interpret-mode) tests exercise the ppe
        # planes/fused dispatch paths, which production gates to real TPUs
        self._allow_ppe_interpret = False
        # cold-start attribution (surfaced as init_profile in --stats):
        # first submit-batch / first drain-fetch durations land here, and
        # BackgroundRunner adds its ctor/prewarm stamps
        self.init_profile: Dict[str, float] = {}
        # Grouping budget (pairs per table group) and dispatch chunk sizes.
        # The relay-tunnelled TPU charges ~3ms per program launch, so real
        # hardware favors few, large dispatches; interpret mode (CPU tests)
        # must stay small or the emulated kernel dominates test time.
        # Measured on the v5e relay: 16384-pair dispatches pipeline better
        # than 65536-pair ones (bigger gather intermediates hurt more than
        # the extra launches cost).
        if self.interpret:
            default_budget, self._chunks = 4096, (4096,)
        else:
            default_budget, self._chunks = 16384, (16384, 8192, 4096)
        if pair_budget is None:
            pair_budget = default_budget
        # dispatches are pair vectors feeding a LANES-wide grid; keep every
        # chunk a multiple of the lane width (and of 8*LANES for the ppe
        # kernel — all defaults above are)
        self.pair_budget = max(128, ((pair_budget + 127) // 128) * 128)
        self._chunks = tuple(
            min(c, self.pair_budget) for c in self._chunks
        )
        self._base_table = BASE_TABLE.astype(np.int32)
        ph2pr = PH2PR_F32
        self._omq_table = (np.float32(1.0) - ph2pr).astype(np.float32)
        self._q3_table = (ph2pr / np.float32(3.0)).astype(np.float32)
        from .pairhmm_pallas import plane_tables

        self._mask_tab, self._omq_bits_tab, self._q3_bits_tab = plane_tables(
            BASE_TABLE, PH2PR_F32
        )
        import threading

        self._dev_tables: Dict = {}  # device -> lazily device_put tables
        self._call_cache: Dict = {}  # packed-dispatch signature -> callable
        # relay-phase adaptation (interpret mode always uses the striped
        # fallback, so the controller only runs on hardware)
        self._path_ctl = DispatchPathController(
            forced=None if cfg.dispatch_mode == "adaptive" else cfg.dispatch_mode
        )
        # serializes program load/trace: a dispatch needing a signature the
        # prewarm thread is mid-way through waits for it instead of tracing
        # the same program concurrently
        self._call_lock = threading.Lock()
        self._prewarm_stop = threading.Event()
        # ONE dispatch worker: submit() packing + device_put + launches run
        # here so they overlap the caller's host work AND device compute;
        # single-threaded FIFO keeps device round-robin placement identical
        # to a synchronous submit (results are placement-independent anyway).
        # Daemon worker (not ThreadPoolExecutor): a relay call wedged inside
        # it must not block interpreter exit after the failover kicks in.
        self._submit_pool = _DaemonWorker("hc-dispatch")
        # Device-wedge failover (cfg.device_timeout_s): once a submit or
        # fetch blocks past the budget the device path is declared dead and
        # every remaining batch recomputes on the bit-exact C++ engine.
        self._wedged = False
        # launch observability ({arm label -> program launches}), surfaced
        # as dispatch_profile in --stats: evidences which shipping encoding
        # and fusion width the production run actually used
        self.dispatch_counts: Dict[str, int] = {}
        self.device_fallbacks = 0
        self._native_runner = None
        self._fetch_pool: Optional[_DaemonWorker] = None

    def _device_tables(self, device):
        tables = self._dev_tables.get(device)
        if tables is None:
            import jax

            from .pairhmm_pallas import ppe_element_table

            tables = tuple(
                jax.device_put(t, device)
                for t in (
                    self._base_table, self._omq_table, self._q3_table,
                    ppe_element_table(BASE_TABLE, PH2PR_F32),
                )
            )
            self._dev_tables[device] = tables
        return tables

    def _planes_callable(self, nr_pad, nh_pad, r_pad, c_pad, n_pairs):
        """Callable for a planes-path dispatch program: an AOT export when
        one exists (skips ~3s of per-process tracing), else the regular
        jit.  Both lower to the same StableHLO, so results are bitwise
        identical."""
        key = (nr_pad, nh_pad, r_pad, c_pad, n_pairs, self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is not None:
                return fn
            import functools
            import os
            import sys

            import jax

            if os.environ.get("GATK_HC_TPU_LOG_PROGRAMS"):
                # cold-start tuning aid: which program signatures a run
                # actually needs (feed these to prewarm/warm_cache)
                print(
                    f"[program] planes nr={nr_pad} nh={nh_pad} r={r_pad} "
                    f"c={c_pad} B={n_pairs}",
                    file=sys.stderr, flush=True,
                )

            from . import aot
            from .pairhmm_pallas import pairhmm_pallas_planes

            fn = None
            if not self.interpret:
                fn = aot.load(
                    aot.planes_signature_key(
                        jax.default_backend(), nr_pad, nh_pad, r_pad, c_pad,
                        n_pairs, self.cfg.ppe_rows, self.trans,
                    )
                )
            if fn is None:
                fn = functools.partial(
                    pairhmm_pallas_planes,
                    trans=self.trans,
                    nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
                    ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                )
            self._call_cache[key] = fn
            return fn

    def _fused_callable(self, k, nr_pad, nh_pad, r_pad, c_pad, n_pairs):
        """Jitted one-launch program for k stacked same-signature plane
        groups (pairhmm_pallas_planes_fused)."""
        key = ("fused", k, nr_pad, nh_pad, r_pad, c_pad, n_pairs,
               self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is None:
                import functools

                import jax

                from . import aot
                from .pairhmm_pallas import pairhmm_pallas_planes_fused

                if not self.interpret:
                    fn = aot.load(
                        aot.fused_signature_key(
                            jax.default_backend(), k, nr_pad, nh_pad,
                            r_pad, c_pad, n_pairs, self.cfg.ppe_rows,
                            self.trans,
                        )
                    )
                if fn is None:
                    fn = functools.partial(
                        pairhmm_pallas_planes_fused,
                        trans=self.trans,
                        nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad,
                        c_pad=c_pad,
                        ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                    )
                self._call_cache[key] = fn
            return fn

    def _packed_callable(self, nr_pad, nh_pad, r_pad, c_pad, n_pairs):
        """One-launch program for a single-chunk PACKED group
        (pairhmm_pallas_packed: device unpack + expansion + kernel in one
        XLA program — halves the per-group launch count vs the split
        prepare/dispatch pair)."""
        key = ("packed", nr_pad, nh_pad, r_pad, c_pad, n_pairs,
               self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is None:
                import functools

                import jax

                from . import aot
                from .pairhmm_pallas import pairhmm_pallas_packed

                if not self.interpret:
                    fn = aot.load(
                        aot.packed_signature_key(
                            jax.default_backend(), nr_pad, nh_pad,
                            r_pad, c_pad, n_pairs, self.cfg.ppe_rows,
                            self.trans,
                        )
                    )
                if fn is None:
                    fn = functools.partial(
                        pairhmm_pallas_packed,
                        trans=self.trans,
                        nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad,
                        c_pad=c_pad,
                        ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                    )
                self._call_cache[key] = fn
            return fn

    def _packed_nib_callable(self, nr_pad, nh_pad, r_pad, c_pad, n_pairs,
                             n_spans):
        """One-launch program for a single-chunk minimal-bytes packed group
        (pairhmm_pallas_packed_nib: nibble-dictionary unpack + on-device
        pair expansion + kernel — ~62% fewer bytes shipped per group than
        the raw packed encoding through the bandwidth-bound relay)."""
        key = ("packednib", nr_pad, nh_pad, r_pad, c_pad, n_pairs, n_spans,
               self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is None:
                import functools

                import jax

                from . import aot
                from .pairhmm_pallas import pairhmm_pallas_packed_nib

                if not self.interpret:
                    fn = aot.load(
                        aot.packed_nib_signature_key(
                            jax.default_backend(), nr_pad, nh_pad,
                            r_pad, c_pad, n_pairs, n_spans,
                            self.cfg.ppe_rows, self.trans,
                        )
                    )
                if fn is None:
                    fn = functools.partial(
                        pairhmm_pallas_packed_nib,
                        trans=self.trans, n_pairs=n_pairs,
                        nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad,
                        c_pad=c_pad,
                        ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                    )
                self._call_cache[key] = fn
            return fn

    def _packed_nib_fused_callable(self, k, nr_pad, nh_pad, r_pad, c_pad,
                                   n_pairs, n_spans):
        """Jitted one-launch program for k stacked same-signature nib
        groups (pairhmm_pallas_packed_nib_fused): minimal bytes AND k-fold
        launch amortization, so deep-degraded fusion no longer regresses
        to the raw packed encoding's 2.6x transfer size."""
        key = ("packednibfused", k, nr_pad, nh_pad, r_pad, c_pad, n_pairs,
               n_spans, self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is None:
                import functools

                from .pairhmm_pallas import pairhmm_pallas_packed_nib_fused

                fn = functools.partial(
                    pairhmm_pallas_packed_nib_fused,
                    trans=self.trans, n_pairs=n_pairs,
                    nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
                    ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                )
                self._call_cache[key] = fn
            return fn

    def _nib_encode(self, read_u8, qual_u8):
        """Nibble-dictionary encoding of a group's read planes, or None
        when the group's alphabets overflow (seq > 8 or qual > 32 distinct
        bytes — never for ACGTN reads with binned qualities).  Byte 0 is
        forced into both dictionaries at index 0 so the zero padding bytes
        map to the exact values the raw-u8 encodings produce for them.
        Returns ((nr_pad, r_pad) u8 nibble planes, (72,) i32 mini-table)."""
        cs = np.bincount(read_u8.ravel(), minlength=256)
        cs[0] += 1
        seq_vals = np.nonzero(cs)[0]
        if seq_vals.size > 8:
            return None
        cq = np.bincount(qual_u8.ravel(), minlength=256)
        cq[0] += 1
        qual_vals = np.nonzero(cq)[0]
        if qual_vals.size > 32:
            return None
        lut_s = np.zeros(256, np.uint8)
        lut_s[seq_vals] = np.arange(seq_vals.size, dtype=np.uint8)
        lut_q = np.zeros(256, np.uint8)
        lut_q[qual_vals] = np.arange(qual_vals.size, dtype=np.uint8)
        nib = (lut_s[read_u8] << np.uint8(5)) | lut_q[qual_u8]
        minitab = np.zeros(72, np.int32)
        minitab[: seq_vals.size] = self._mask_tab[seq_vals]
        minitab[8 : 8 + qual_vals.size] = self._omq_bits_tab[qual_vals]
        minitab[40 : 40 + qual_vals.size] = self._q3_bits_tab[qual_vals]
        return nib, minitab

    def _packed_fused_callable(self, k, nr_pad, nh_pad, r_pad, c_pad,
                               n_pairs):
        """Jitted one-launch program for k stacked same-signature packed
        groups (pairhmm_pallas_packed_fused)."""
        key = ("packedfused", k, nr_pad, nh_pad, r_pad, c_pad, n_pairs,
               self.interpret)
        fn = self._call_cache.get(key)
        if fn is not None:
            return fn
        with self._call_lock:
            fn = self._call_cache.get(key)
            if fn is None:
                import functools

                import jax

                from . import aot
                from .pairhmm_pallas import pairhmm_pallas_packed_fused

                if not self.interpret:
                    fn = aot.load(
                        aot.packed_fused_signature_key(
                            jax.default_backend(), k, nr_pad, nh_pad,
                            r_pad, c_pad, n_pairs, self.cfg.ppe_rows,
                            self.trans,
                        )
                    )
                if fn is None:
                    fn = functools.partial(
                        pairhmm_pallas_packed_fused,
                        trans=self.trans,
                        nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad,
                        c_pad=c_pad,
                        ppe_rows=self.cfg.ppe_rows, interpret=self.interpret,
                    )
                self._call_cache[key] = fn
            return fn

    def prewarm(self, signatures=None, block: bool = False):
        """Trace/compile the expected first dispatch programs concurrently
        with host parse/assembly (a daemon thread; the per-process cost of
        a cold program is ~1.5-7s even with a warm executable cache).

        signatures: iterable of (nr_pad, nh_pad, r_pad, c_pad, n_pairs);
        defaults to the programs a standard short-read contig hits first.
        """
        import threading

        if signatures is None:
            r0 = self.cfg.read_pad_buckets[1] if len(
                self.cfg.read_pad_buckets
            ) > 1 else self.cfg.read_pad_buckets[0]
            c0 = self.cfg.hap_pad_buckets[0]
            signatures = [
                (self.READ_BUCKETS[-1], self.HAP_BUCKETS[-1], r0, c0, s)
                for s in self._chunks[:2]
            ]

        def work():
            import numpy as np

            for nr, nh, r, c, B in signatures:
                if self._prewarm_stop.is_set():
                    return
                try:
                    fn = self._planes_callable(nr, nh, r, c, B)
                    buf = np.ones(
                        nr + 2 * nh + 3 * nr * r + nh * c, np.int32
                    )
                    pairs = np.zeros((2, B), np.int32)
                    device = self._devices[0]
                    import jax

                    args = jax.device_put([buf, pairs], device)
                    fn(*args).block_until_ready()
                except Exception:  # pragma: no cover - prewarm is best-effort
                    pass

        # daemon + bounded atexit join (_join_device_threads): a healthy
        # in-flight program load still completes before interpreter
        # teardown (teardown mid-device-call aborts the process), but a
        # load wedged in a dead relay can only delay exit by _EXIT_JOIN_S
        # instead of blocking it forever; stop_prewarm() caps the wait at
        # one in-flight program when a short run finishes before warming
        thread = threading.Thread(target=work, daemon=True)
        thread.start()
        _register_exit_wait(
            lambda timeout: None if self._wedged else thread.join(timeout)
        )
        if block:
            thread.join()
        return thread

    def stop_prewarm(self) -> None:
        """Skip any prewarm signatures not yet started (called once the
        pipeline has drained — further warming is pure exit latency)."""
        self._prewarm_stop.set()

    def _round_stripe(self, r: int) -> int:
        h = self.cfg.stripe_height
        return ((r + h - 1) // h) * h

    def _pads_for_group(self, jobs, group):
        """Per-group padded shapes: tightest bucket over the group's actual
        lengths (fewer wasted cells than one global shape)."""
        max_r = max(
            (
                jobs[g].reads.max_len
                if hasattr(jobs[g].reads, "max_len")
                else max((len(b) for b, _ in jobs[g].reads), default=1)
            )
            for g in group
        ) if group else 1
        max_r = max(max_r, 1)
        max_c = max((len(h) for g in group for h in jobs[g].haps), default=1)
        r_pad = next(
            (b for b in self.cfg.read_pad_buckets if max_r <= b),
            self._round_stripe(max_r),
        )
        r_pad = self._round_stripe(r_pad)
        c_pad = next(
            (b for b in self.cfg.hap_pad_buckets if max_c <= b),
            ((max_c + 127) // 128) * 128,
        )
        return r_pad, c_pad

    # ------------------------------------------------------------------
    def run(self, jobs: Sequence[PairHMMJob]) -> None:
        """Compute results for all jobs in-place (submit + drain)."""
        self.drain([self.submit(jobs)])

    def submit(self, jobs: Sequence[PairHMMJob]):
        """Enqueue all device work for `jobs` WITHOUT waiting.

        The whole submit body — group packing (numpy), device_put (which
        blocks the calling thread for the relay transfer, ~4ms per group's
        2.3 MB plane buffer) and program dispatch — runs on the runner's
        single dispatch worker thread, so this returns in ~10us and the
        caller's thread keeps assembling while the device computes.  One
        worker (FIFO) keeps the device round-robin order, and therefore
        placement, identical to the synchronous path.  Errors surface at
        drain().  Pass the returned token(s) to drain() to collect.

        All dispatch outputs living on the same device are concatenated
        into ONE device array per submit call: on the relay-tunnelled TPU
        every readback costs ~30-60ms regardless of size (even inside a
        batched device_get), so fetching one coalesced array per device
        instead of one per dispatch is the difference between ~0.3s and
        ~4s of drain time on a 2Mb contig."""
        if self._wedged:
            # device path declared dead earlier: compute on the bit-exact
            # CPU engine right away (same results, no device contact)
            self._native_fallback(jobs)
            return _SubmitHandle(_DONE_FUTURE, jobs)
        return _SubmitHandle(
            self._submit_pool.submit(self._submit_batch, jobs), jobs
        )

    def _submit_batch(self, jobs: Sequence[PairHMMJob]):
        import jax.numpy as jnp

        first = "first_submit_batch_s" not in self.init_profile
        if first:
            self.init_profile["first_submit_at_age_s"] = round(
                _process_age_s(), 3
            )
            t_first = time.perf_counter()
        groups = self._plan_groups(jobs)
        # fuse_auto: fusion pays only when the relay throttles op
        # THROUGHPUT (the pipelined stream already hides per-op latency),
        # so by default it engages on the controller's measured DEEP
        # degradation (see DispatchPathController.deeply_degraded), not
        # statically (see HCConfig.fuse_auto)
        fuse_on = self.cfg.fuse_groups > 1 and (
            not self.cfg.fuse_auto or self._path_ctl.deeply_degraded()
        )
        if fuse_on:
            # defer single-chunk dispatches (either encoding) and fuse
            # same-signature runs into one launch each (per-launch relay
            # cost amortizes fuse_groups-fold); non-conforming groups
            # dispatch as usual
            sink: List = []
            submitted = []
            for group in groups:
                entry = self._submit_group(jobs, group, fuse_sink=sink)
                if entry is not None:
                    submitted.append(entry)
            submitted.extend(self._dispatch_fused(sink))
        else:
            submitted = [self._submit_group(jobs, group) for group in groups]
        per_dev: Dict = {}  # device -> [out arrays in order]
        layout = []  # per group: [(device, start, size), ...] for its outs
        for outs, _spans in submitted:
            entries = []
            for o in outs:
                (dev,) = o.devices()
                lst = per_dev.setdefault(dev, [])
                start = sum(a.shape[0] for a in lst)
                lst.append(o)
                entries.append((dev, start, o.shape[0]))
            layout.append(entries)
        coalesced = {
            dev: arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs)
            for dev, arrs in per_dev.items()
        }
        # kick the device->host copy off as soon as compute finishes so the
        # transfer overlaps later submits' packing/dispatch; drain()'s
        # device_get then finds the bytes already staged (the relay charges
        # 4-60 ms per readback when issued synchronously)
        for arr in coalesced.values():
            try:
                arr.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                break  # backend without async copies: drain fetches as before
        if first:
            # pack + device_put + dispatch of the first batch (programs
            # may still be loading: that cost shows up here)
            self.init_profile["first_submit_batch_s"] = round(
                time.perf_counter() - t_first, 3
            )
        return (jobs, submitted, coalesced, layout)

    def drain(self, batches) -> None:
        """Fetch + finalize every submitted batch (one readback per device
        per submit batch).  Accepts submit() tokens (resolved here — this
        is where a dispatch error raises) or already-resolved tuples.

        Wedge failover: if the dispatch worker or the result fetch blocks
        past cfg.device_timeout_s, the affected batches (and every later
        submit) recompute on the bit-exact C++ engine instead of hanging
        the run (the tunnelled device has been observed wedged for hours;
        dispatch calls block indefinitely while enumeration stays live)."""
        timeout = self.cfg.device_timeout_s or None
        resolved = []
        for b in batches:
            if not isinstance(b, _SubmitHandle):
                resolved.append(b)
                continue
            r = _WEDGED
            for attempt in range(self.MAX_SLOW_EXTENSIONS + 1):
                try:
                    # post-wedge, queued futures sit behind the stuck call —
                    # give them only a grace period, not the full budget
                    r = b.resolve(5.0 if self._wedged and timeout else timeout)
                    break
                except TimeoutError:
                    # distinguish wedged (probe can't finish either) from
                    # alive-but-throttled (degraded phases run 100x+ slow
                    # for minutes-to-hours): only a failed probe, or
                    # exhausting the slow-phase extensions, declares wedge
                    if self._wedged or not self._probe_device_alive():
                        break
                    self._note_slow("dispatch", attempt)
            if r is _WEDGED:
                self._declare_wedged("dispatch")
                self._native_fallback(b.jobs)
                continue
            if r is not None:
                resolved.append(r)
        if not resolved:
            return
        flat = [a for _, _, coalesced, _ in resolved for a in coalesced.values()]
        first_fetch = "first_drain_fetch_s" not in self.init_profile
        t_fetch = time.perf_counter()
        fetched_list = self._fetch(flat, timeout)
        if first_fetch:
            self.init_profile["first_drain_fetch_s"] = round(
                time.perf_counter() - t_fetch, 3
            )
        if fetched_list is None:
            self._declare_wedged("fetch")
            for jobs, _, _, _ in resolved:
                self._native_fallback(jobs)
            return
        fetched = iter(fetched_list)
        for jobs, submitted, coalesced, layout in resolved:
            host = {dev: next(fetched) for dev in coalesced}
            for (outs, spans), entries in zip(submitted, layout):
                host_outs = [
                    host[dev][start : start + size]
                    for dev, start, size in entries
                ]
                self._finalize_group(jobs, host_outs, spans)

    # How many extra full budgets drain grants when the batch timed out
    # but a probe shows the device alive (throttled, not wedged).  Bounds
    # the wait so a non-relay deadlock still fails over eventually.
    MAX_SLOW_EXTENSIONS = 3

    def _fetch(self, flat, timeout: Optional[float]):
        """device_get with the wedge budget; None on timeout.  The fetch
        runs on a side thread so a blocked relay read can be abandoned
        (the thread leaks until the relay unblocks — acceptable once per
        process, and nothing touches the device after a wedge)."""
        import jax

        if timeout is None:
            return jax.device_get(flat)
        if self._fetch_pool is None:
            self._fetch_pool = _DaemonWorker("hc-fetch")
        fut = self._fetch_pool.submit(jax.device_get, flat)
        for attempt in range(self.MAX_SLOW_EXTENSIONS + 1):
            try:
                return fut.result(5.0 if self._wedged else timeout)
            except TimeoutError:
                if self._wedged or not self._probe_device_alive():
                    return None
                self._note_slow("fetch", attempt)
        return None

    def _probe_device_alive(self, timeout_s: float = 30.0) -> bool:
        """One tiny device round-trip on a fresh daemon thread: True means
        the device path is alive (merely throttled); False (probe itself
        cannot finish) confirms a wedge.  A fresh thread each time — the
        dispatch and fetch workers may themselves be the blocked ones."""
        import threading

        ok = threading.Event()

        def probe():
            try:
                import jax

                jax.device_get(
                    jax.device_put(np.ones(8, np.float32), self._devices[0])
                )
                ok.set()
            except Exception:
                pass  # an erroring device is as good as wedged here

        t = threading.Thread(target=probe, daemon=True, name="hc-probe")
        t.start()
        # deliberately NOT exit-registered: a live probe finishes in <1s,
        # and a blocked one is exactly the wedge we refuse to wait for
        return ok.wait(timeout_s)

    def _note_slow(self, where: str, attempt: int) -> None:
        import sys

        print(
            f"[gatk_hc_tpu] device {where} exceeded "
            f"{self.cfg.device_timeout_s:.0f}s but the device probes alive "
            f"(throttled phase) — waiting up to "
            f"{self.MAX_SLOW_EXTENSIONS - attempt} more budget(s)",
            file=sys.stderr, flush=True,
        )

    def _declare_wedged(self, where: str) -> None:
        self.device_fallbacks += 1
        if not self._wedged:
            self._wedged = True
            self._submit_pool.abandoned = True
            if self._fetch_pool is not None:
                self._fetch_pool.abandoned = True
            import sys

            print(
                f"[gatk_hc_tpu] device {where} unresponsive for "
                f"{self.cfg.device_timeout_s:.0f}s — failing over to the "
                "bit-exact C++ PairHMM engine for the rest of the run",
                file=sys.stderr, flush=True,
            )

    def _native_fallback(self, jobs) -> None:
        if self._native_runner is None:
            self._native_runner = NativePairHMMRunner(self.cfg)
        self._native_runner.run(jobs)

    def _plan_groups(self, jobs: Sequence[PairHMMJob]) -> List[List[int]]:
        groups: List[List[int]] = []
        current: List[int] = []
        pairs = reads = haps = 0
        for idx, job in enumerate(jobs):
            jp = len(job.reads) * len(job.haps)
            if jp == 0:
                job.result = np.zeros((len(job.reads), len(job.haps)))
                continue
            if jp > self.pair_budget:
                # oversized region: its own group (multiple dispatches inside)
                if current:
                    groups.append(current)
                    current, pairs, reads, haps = [], 0, 0, 0
                groups.append([idx])
                continue
            if (
                current
                and (
                    pairs + jp > self.pair_budget
                    or reads + len(job.reads) > self.READ_BUCKETS[-1]
                    or haps + len(job.haps) > self.HAP_BUCKETS[-1]
                )
            ):
                groups.append(current)
                current, pairs, reads, haps = [], 0, 0, 0
            current.append(idx)
            pairs += jp
            reads += len(job.reads)
            haps += len(job.haps)
        if current:
            groups.append(current)
        return groups

    def _submit_group(self, jobs: Sequence[PairHMMJob], group: List[int],
                      fuse_sink: Optional[List] = None):
        # build unique tables
        r_pad, c_pad = self._pads_for_group(jobs, group)
        n_reads = sum(len(jobs[g].reads) for g in group)
        n_haps = sum(len(jobs[g].haps) for g in group)
        nr_pad = _bucket(n_reads, self.READ_BUCKETS)
        nh_pad = _bucket(n_haps, self.HAP_BUCKETS)

        def pack_rows(seq_lists, n_pad, w_pad):
            """Vectorized fill of (n_pad, w_pad) row tables from variable-
            length uint8 arrays (a python per-row loop costs ~1.5us/row and
            dominated submit time at 4096-read groups).  Rows are non-empty
            (PairHMMJob validates); padding rows default to length 1."""
            clipped = [s[:w_pad] for s in seq_lists]
            lens = np.fromiter(
                (len(s) for s in clipped), dtype=np.int64, count=len(clipped)
            )
            starts = np.arange(len(clipped), dtype=np.int64) * w_pad
            within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(lens) - lens, lens
            )
            pos = np.repeat(starts, lens) + within
            out_lens = np.ones(n_pad, dtype=np.int32)
            out_lens[: len(clipped)] = lens.astype(np.int32)
            return pos, clipped, out_lens

        # Per-JOB read collection: columnar ReadPairs jobs contribute their
        # whole flat CSR buffers (no per-read views), generic tuple-list
        # jobs stay per-read.  No clipping is needed on this side:
        # _pads_for_group sizes r_pad from the group's max read length.
        len_parts: List[np.ndarray] = []
        seq_parts: List[np.ndarray] = []
        qual_parts: List[np.ndarray] = []
        for g in group:
            r = jobs[g].reads
            if hasattr(r, "flat_seq"):
                nb = int(r.off[-1])
                len_parts.append(np.asarray(r.lengths, dtype=np.int64))
                seq_parts.append(r.flat_seq[:nb])
                qual_parts.append(r.flat_qual[:nb])
            else:
                len_parts.append(np.fromiter(
                    (len(b) for b, _ in r), dtype=np.int64, count=len(r)
                ))
                seq_parts.extend(b for b, _ in r)
                qual_parts.extend(q for _, q in r)
        lens = (
            np.concatenate(len_parts)
            if len_parts
            else np.zeros(0, dtype=np.int64)
        )
        starts = np.arange(lens.size, dtype=np.int64) * r_pad
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        rpos = np.repeat(starts, lens) + within
        read_lens = np.ones(nr_pad, dtype=np.int32)
        read_lens[: lens.size] = lens.astype(np.int32)

        haps_flat = [h for g in group for h in jobs[g].haps]
        hpos, hclip, hap_lens = pack_rows(haps_flat, nh_pad, c_pad)
        read_u8 = np.zeros(nr_pad * r_pad, dtype=np.uint8)
        qual_u8 = np.zeros(nr_pad * r_pad, dtype=np.uint8)
        hap_u8 = np.zeros(nh_pad * c_pad, dtype=np.uint8)
        if lens.size:
            read_u8[rpos] = (
                seq_parts[0] if len(seq_parts) == 1
                else np.concatenate(seq_parts)
            )
            qual_u8[rpos] = (
                qual_parts[0] if len(qual_parts) == 1
                else np.concatenate(qual_parts)
            )
        if haps_flat:
            hap_u8[hpos] = np.concatenate(hclip)

        read_base_idx: Dict[int, int] = {}
        hap_base_idx: Dict[int, int] = {}
        ri = hi = 0
        for g in group:
            read_base_idx[g] = ri
            ri += len(jobs[g].reads)
            hap_base_idx[g] = hi
            hi += len(jobs[g].haps)
        hap_init_y = (
            INITIAL_CONSTANT_F32 / hap_lens.astype(np.float32)
        ).astype(np.float32)

        # pair lists (read-major per job, jobs in group order), vectorized
        spans: List[Tuple[int, int, int, int]] = []  # (job, start, nr, nh)
        pr_parts: List[np.ndarray] = []
        ph_parts: List[np.ndarray] = []
        total = 0
        for g in group:
            nr, nh = len(jobs[g].reads), len(jobs[g].haps)
            spans.append((g, total, nr, nh))
            rb, hb = read_base_idx[g], hap_base_idx[g]
            pr_parts.append(
                np.repeat(np.arange(rb, rb + nr, dtype=np.int32), nh)
            )
            ph_parts.append(
                np.tile(np.arange(hb, hb + nh, dtype=np.int32), nr)
            )
            total += nr * nh

        # chunk plan: full-size chunks while the remainder exceeds the
        # biggest, then the smallest chunk that covers the tail (each chunk
        # size is its own compiled program, so only a few sizes exist).  In
        # a measured degraded relay phase the per-op cost dominates, so the
        # tail rounds up to the big chunk too — padded pairs are wasted
        # kernel cells (cheap) traded for one fewer program launch.
        big = self._chunks[0]
        chunks = (
            (big,)
            if not self.interpret and self._path_ctl.degraded()
            else self._chunks
        )
        sizes: List[int] = []
        covered = 0
        while covered < total:
            rem = total - covered
            if rem >= big:
                sizes.append(big)
            else:
                sizes.append(
                    min((c for c in chunks if c >= rem), default=big)
                )
            covered += sizes[-1]
        pr = np.zeros(covered, dtype=np.int32)
        ph = np.zeros(covered, dtype=np.int32)
        pr[:total] = np.concatenate(pr_parts)
        ph[:total] = np.concatenate(ph_parts)

        import jax

        from .pairhmm_pallas import (
            _PPE_UNROLL,
            dispatch_pairs_striped,
            prepare_tables_striped,
        )

        device = self._devices[self._next_device % len(self._devices)]
        self._next_device += 1
        chunk_pairs = []
        off = 0
        for size in sizes:
            sl = slice(off, off + size)
            chunk_pairs.append(np.stack([pr[sl], ph[sl]]))
            off += size

        use_ppe = (
            (not self.interpret or self._allow_ppe_interpret)
            and self.cfg.pallas_algo == "ppe"
            and c_pad % _PPE_UNROLL == 0
            and c_pad <= 640
            and all(s % 1024 == 0 for s in sizes)
        )
        outs = []
        if use_ppe:
            if self.interpret:
                # test hook path: interpret runs planes unless a test
                # forces the packed encoding (packed-fused CPU coverage)
                forced = self._path_ctl.forced
                path = "packed" if forced == "packed" else "planes"
                calibrate = False
            else:
                path, calibrate = self._path_ctl.choose()
            t0 = time.perf_counter() if calibrate else 0.0
            if path == "packed":
                i32buf = np.concatenate(
                    [read_lens, hap_lens, hap_init_y.view(np.int32)]
                )
                nib = (
                    self._nib_encode(read_u8, qual_u8)
                    if self.cfg.packed_nib and len(sizes) == 1
                    else None
                )
                if nib is not None:
                    # minimal-bytes single-chunk dispatch: 1 B/base nibble
                    # read planes + per-job span table expanded on device
                    # (no pair arrays shipped) — the bandwidth-bound-relay
                    # lever (relay_put_mbps ~100 MB/s, transfers serialize
                    # with the kernel)
                    nib_u8, minitab = nib
                    u8buf_n = np.concatenate(
                        [nib_u8.ravel(), hap_u8.ravel()]
                    )
                    n_spans = 8
                    while n_spans < len(spans):
                        n_spans *= 2
                    spans_arr = np.zeros((n_spans, 4), np.int32)
                    for si, (g, _start, s_nr, s_nh) in enumerate(spans):
                        spans_arr[si] = (
                            read_base_idx[g], hap_base_idx[g], s_nr, s_nh
                        )
                    if fuse_sink is not None and not calibrate:
                        # defer for fused dispatch (_dispatch_fused): k
                        # same-signature nib groups become ONE launch,
                        # minimal bytes AND amortized launches
                        fuse_sink.append((
                            "packednib",
                            (u8buf_n, i32buf, minitab, spans_arr), None,
                            sizes[0], spans, total,
                            (nr_pad, nh_pad, r_pad, c_pad), device,
                        ))
                        return None
                    u8_dev, i32_dev, mt_dev, sp_dev = jax.device_put(
                        [u8buf_n, i32buf, minitab, spans_arr], device
                    )
                    _b, _o, _q, ppe_tab = self._device_tables(device)
                    fn = self._packed_nib_callable(
                        nr_pad, nh_pad, r_pad, c_pad, sizes[0],
                        spans_arr.shape[0],
                    )
                    outs.append(
                        fn(u8_dev, i32_dev, mt_dev, ppe_tab, sp_dev)
                    )
                    self.dispatch_counts["packednib"] = (
                        self.dispatch_counts.get("packednib", 0) + 1
                    )
                    if calibrate:
                        for o in outs:
                            o.block_until_ready()
                        self._path_ctl.record(
                            path,
                            (time.perf_counter() - t0) / max(covered, 1),
                        )
                    return (outs, (spans, total))
                # raw packed fallback: uint8 shipping (2 B/base) + ONE
                # fused device gather through the 768-entry combined table
                # (_unpack_u8_ppe) before pair expansion
                u8buf = np.concatenate(
                    [read_u8.ravel(), qual_u8.ravel(), hap_u8.ravel()]
                )
                if (
                    fuse_sink is not None
                    and not calibrate
                    and len(sizes) == 1
                ):
                    # defer for fused dispatch (_dispatch_fused): k
                    # same-signature packed groups become ONE launch
                    fuse_sink.append((
                        "packed", (u8buf, i32buf), chunk_pairs[0],
                        sizes[0], spans, total,
                        (nr_pad, nh_pad, r_pad, c_pad), device,
                    ))
                    return None
                u8_dev, i32_dev, *pairs_devs = jax.device_put(
                    [u8buf, i32buf] + chunk_pairs, device
                )
                _base, _omq, _q3, ppe_tab = self._device_tables(device)
                if len(sizes) == 1:
                    # single chunk: unpack + expansion + kernel in ONE
                    # launch (the split pair below costs two)
                    fn = self._packed_callable(
                        nr_pad, nh_pad, r_pad, c_pad, sizes[0]
                    )
                    outs.append(fn(u8_dev, i32_dev, ppe_tab, pairs_devs[0]))
                    self.dispatch_counts["packed"] = (
                        self.dispatch_counts.get("packed", 0) + 1
                    )
                else:
                    # multi-chunk: prepare tables once, reuse per chunk
                    from .pairhmm_pallas import (
                        dispatch_pairs_ppe,
                        prepare_tables_ppe,
                    )

                    tables = prepare_tables_ppe(
                        u8_dev, i32_dev, ppe_tab,
                        nr_pad=nr_pad, nh_pad=nh_pad,
                        r_pad=r_pad, c_pad=c_pad,
                    )
                    for pairs_dev in pairs_devs:
                        outs.append(
                            dispatch_pairs_ppe(
                                *tables, pairs_dev, self.trans,
                                r_pad=r_pad, c_pad=c_pad,
                                ppe_rows=self.cfg.ppe_rows,
                                interpret=self.interpret,
                            )
                        )
                        self.dispatch_counts["packed-split"] = (
                            self.dispatch_counts.get("packed-split", 0) + 1
                        )
            else:
                # planes path: the HOST applies the 256-entry element
                # tables (numpy fancy-indexing, ~2ms/group) and ships ready
                # i32 planes in one buffer — the device does view-only
                # unpack + expansion + kernel
                buf = self._build_planes(
                    read_u8, qual_u8, hap_u8, read_lens, hap_lens,
                    hap_init_y, nr_pad, nh_pad, r_pad, c_pad,
                )
                if (
                    fuse_sink is not None
                    and not calibrate
                    and len(sizes) == 1
                ):
                    # defer for fused dispatch (_dispatch_fused)
                    fuse_sink.append((
                        "planes", buf, chunk_pairs[0], sizes[0], spans,
                        total, (nr_pad, nh_pad, r_pad, c_pad), device,
                    ))
                    return None
                buf_dev, *pairs_devs = jax.device_put(
                    [buf] + chunk_pairs, device
                )
                for pairs_dev, size in zip(pairs_devs, sizes):
                    fn = self._planes_callable(
                        nr_pad, nh_pad, r_pad, c_pad, size
                    )
                    outs.append(fn(buf_dev, pairs_dev))
                    self.dispatch_counts["planes"] = (
                        self.dispatch_counts.get("planes", 0) + 1
                    )
            if calibrate:
                # synchronous timing of this one group: everything from
                # host packing through kernel completion (the real cost a
                # submit adds to the stream on the current relay phase)
                for o in outs:
                    o.block_until_ready()
                self._path_ctl.record(
                    path, (time.perf_counter() - t0) / max(covered, 1)
                )
            return (outs, (spans, total))

        # striped / interpret fallback: packed uint8 shipping + device prep
        u8buf = np.concatenate(
            [read_u8.ravel(), qual_u8.ravel(), hap_u8.ravel()]
        )
        i32buf = np.concatenate(
            [read_lens, hap_lens, hap_init_y.view(np.int32)]
        )
        u8_dev, i32_dev, *pairs_devs = jax.device_put(
            [u8buf, i32buf] + chunk_pairs, device
        )
        base, omq, q3, _ppe_tab = self._device_tables(device)
        tables = prepare_tables_striped(
            u8_dev, i32_dev, base, omq, q3,
            nr_pad=nr_pad, nh_pad=nh_pad, r_pad=r_pad, c_pad=c_pad,
        )
        for pairs_dev in pairs_devs:
            outs.append(
                dispatch_pairs_striped(
                    *tables, pairs_dev, self.trans,
                    r_pad=r_pad, c_pad=c_pad,
                    stripe=min(self.cfg.stripe_height, r_pad),
                    interpret=self.interpret,
                )
            )
        return (outs, (spans, total))

    def _dispatch_fused(self, records) -> List:
        """Dispatch deferred single-chunk records (from _submit_group),
        fusing up to cfg.fuse_groups same-signature groups of the SAME
        shipping encoding into ONE device_put + ONE launch each.  Each
        fused entry's spans carry per-group offsets into the flattened
        (k*size,) output, so _finalize_group consumes it like any other
        group.  Results are bitwise identical to per-group dispatch
        (lax.map of the same jitted body).  Record layout:
        (path, payload, pairs, size, spans, total, sig, device) where
        payload is the i32 plane buffer (planes) or (u8buf, i32buf)
        (packed)."""
        if not records:
            return []
        import jax

        buckets: Dict = {}
        for rec in records:
            path, payload, _pairs, size, _spans, _total, sig, _dev = rec
            # nib records additionally key on the span-table bucket (the
            # fused program is specialized on it and np.stack needs equal
            # shapes)
            extra = payload[3].shape[0] if path == "packednib" else None
            buckets.setdefault((path, sig, size, extra), []).append(rec)
        entries = []
        _FUSE_LABEL = {"packed": "packedfused", "packednib": "packednibfused"}
        for (path, sig, size, extra), recs in buckets.items():
            nr_pad, nh_pad, r_pad, c_pad = sig
            for i in range(0, len(recs), self.cfg.fuse_groups):
                part = recs[i : i + self.cfg.fuse_groups]
                k = len(part)
                device = part[0][7]
                spans_totals = [(rec[4], rec[5]) for rec in part]
                label = (
                    path if k == 1
                    else _FUSE_LABEL.get(path, "fused") + str(k)
                )
                self.dispatch_counts[label] = (
                    self.dispatch_counts.get(label, 0) + 1
                )
                if path == "packednib":
                    _b, _o, _q, ppe_tab = self._device_tables(device)
                    if k == 1:
                        u8, i32, mt, sp = part[0][1]
                        u8_d, i32_d, mt_d, sp_d = jax.device_put(
                            [u8, i32, mt, sp], device
                        )
                        fn = self._packed_nib_callable(
                            nr_pad, nh_pad, r_pad, c_pad, size, extra
                        )
                        entries.append((
                            [fn(u8_d, i32_d, mt_d, ppe_tab, sp_d)],
                            spans_totals[0],
                        ))
                        continue
                    u8s = np.stack([r[1][0] for r in part])
                    i32s = np.stack([r[1][1] for r in part])
                    mts = np.stack([r[1][2] for r in part])
                    sps = np.stack([r[1][3] for r in part])
                    u8s_d, i32s_d, mts_d, sps_d = jax.device_put(
                        [u8s, i32s, mts, sps], device
                    )
                    fn = self._packed_nib_fused_callable(
                        k, nr_pad, nh_pad, r_pad, c_pad, size, extra
                    )
                    out = fn(u8s_d, i32s_d, mts_d, ppe_tab, sps_d)
                elif path == "packed":
                    _b, _o, _q, ppe_tab = self._device_tables(device)
                    if k == 1:
                        (u8buf, i32buf), pairs = part[0][1], part[0][2]
                        u8_dev, i32_dev, pairs_dev = jax.device_put(
                            [u8buf, i32buf, pairs], device
                        )
                        fn = self._packed_callable(
                            nr_pad, nh_pad, r_pad, c_pad, size
                        )
                        entries.append((
                            [fn(u8_dev, i32_dev, ppe_tab, pairs_dev)],
                            spans_totals[0],
                        ))
                        continue
                    u8s = np.stack([r[1][0] for r in part])
                    i32s = np.stack([r[1][1] for r in part])
                    prs = np.stack([r[2] for r in part])
                    u8s_dev, i32s_dev, prs_dev = jax.device_put(
                        [u8s, i32s, prs], device
                    )
                    fn = self._packed_fused_callable(
                        k, nr_pad, nh_pad, r_pad, c_pad, size
                    )
                    out = fn(u8s_dev, i32s_dev, ppe_tab, prs_dev)
                elif k == 1:
                    buf, pairs = part[0][1], part[0][2]
                    buf_dev, pairs_dev = jax.device_put([buf, pairs], device)
                    fn = self._planes_callable(
                        nr_pad, nh_pad, r_pad, c_pad, size
                    )
                    entries.append(
                        ([fn(buf_dev, pairs_dev)], spans_totals[0])
                    )
                    continue
                else:
                    bufs = np.stack([r[1] for r in part])
                    prs = np.stack([r[2] for r in part])
                    bufs_dev, prs_dev = jax.device_put([bufs, prs], device)
                    fn = self._fused_callable(
                        k, nr_pad, nh_pad, r_pad, c_pad, size
                    )
                    out = fn(bufs_dev, prs_dev)  # (k*size,) group-major
                merged = [
                    (g, j * size + start, nr, nh)
                    for j, (spans, _total) in enumerate(spans_totals)
                    for g, start, nr, nh in spans
                ]
                entries.append(([out], (merged, k * size)))
        return entries

    def _build_planes(self, read_u8, qual_u8, hap_u8, read_lens, hap_lens,
                      hap_init_y, nr_pad, nh_pad, r_pad, c_pad):
        """Host-side plane buffer for pairhmm_pallas_planes:
        [rlens | hlens | iy bits | read masks | omq bits | q3 bits | hap
        masks], all int32."""
        nrr = nr_pad * r_pad
        head = nr_pad + 2 * nh_pad
        buf = np.empty(head + 3 * nrr + nh_pad * c_pad, np.int32)
        buf[:nr_pad] = read_lens
        buf[nr_pad : nr_pad + nh_pad] = hap_lens
        buf[nr_pad + nh_pad : head] = hap_init_y.view(np.int32)
        np.take(self._mask_tab, read_u8, out=buf[head : head + nrr])
        np.take(self._omq_bits_tab, qual_u8, out=buf[head + nrr : head + 2 * nrr])
        np.take(self._q3_bits_tab, qual_u8, out=buf[head + 2 * nrr : head + 3 * nrr])
        np.take(self._mask_tab, hap_u8, out=buf[head + 3 * nrr :])
        return buf

    def _finalize_group(self, jobs, outs, spans_total) -> None:
        spans, total = spans_total
        probs = np.concatenate(outs)[:total]

        # scatter back + finalize with f64 rescue
        from .pairhmm_oracle import finalize_log10

        for g, start, nr, nh in spans:
            job = jobs[g]
            raw = probs[start : start + nr * nh]

            def rescue(indices, job=job, nh=nh):
                from .pairhmm_jax import _host_f64_rescue

                local_read = (indices // nh).astype(np.int64)
                local_hap = (indices % nh).astype(np.int64)
                return _host_f64_rescue(
                    self.cfg, list(job.reads), list(job.haps),
                    local_read, local_hap,
                )

            job.result = finalize_log10(
                raw, rescue, mode=self.cfg.f64_rescue
            ).reshape(nr, nh)



class JnpPairHMMRunner:
    """Batch runner over the pure-jnp forward kernel — what
    ``--pairhmm jax`` means in call_batched.  Same job interface as the
    other runners; runs anywhere JAX runs (the production device path is
    the Pallas runner, which this deliberately does NOT alias)."""

    def __init__(self, cfg: HCConfig):
        from .pairhmm_jax import jax_pairhmm_engine

        self.cfg = cfg
        self._engine = jax_pairhmm_engine(cfg)

    def run(self, jobs: Sequence[PairHMMJob]) -> None:
        for job in jobs:
            nr, nh = len(job.reads), len(job.haps)
            if nr * nh == 0:
                job.result = np.zeros((nr, nh))
                continue
            job.result = self._engine(job.reads, job.haps)


class _NativeFallbackRunner:
    """Drop-in submit/drain/run shim over the C++ engine, installed when
    the device backend never comes up (BackgroundRunner build timeout).
    Jobs complete synchronously at submit; drain is a no-op."""

    def __init__(self, cfg: HCConfig):
        self._inner = NativePairHMMRunner(cfg)
        self.device_fallbacks = 1

    def submit(self, jobs):
        self._inner.run(jobs)
        return None

    def drain(self, batches) -> None:
        pass

    def run(self, jobs) -> None:
        self._inner.run(jobs)

    def prewarm(self, *args, **kwargs):
        return None

    def stop_prewarm(self) -> None:
        pass


class BackgroundRunner:
    """Cold-start overlap: builds a PallasPairHMMRunner (jax import +
    backend init + AOT load) and starts its prewarm on a background thread
    so those seconds run concurrently with host parse/assembly.  The first
    submit/drain/run joins the build.  On a short input (chrM) the entire
    host phase hides behind the build instead of running after it."""

    def __init__(self, cfg: HCConfig):
        import threading

        self.cfg = cfg
        self._runner: Optional[PallasPairHMMRunner] = None
        self._exc: Optional[BaseException] = None
        self._stop_requested = False
        self._decide_lock = threading.Lock()

        def build():
            try:
                t0 = time.perf_counter()
                runner = PallasPairHMMRunner(cfg)
                runner.init_profile["build_start_at_age_s"] = round(
                    _process_age_s() - (time.perf_counter() - t0), 3
                )
                runner.init_profile["runner_ctor_s"] = round(
                    time.perf_counter() - t0, 3
                )
                with self._decide_lock:
                    # a timed-out _get() may already have installed the
                    # native fallback; a late-finishing build must not
                    # swap runners mid-run (tokens would cross runners)
                    if self._runner is None:
                        self._runner = runner
                    else:
                        self._stop_requested = True
                if self._stop_requested:
                    runner.stop_prewarm()
                else:
                    t1 = time.perf_counter()
                    runner.prewarm()
                    runner.init_profile["prewarm_kickoff_s"] = round(
                        time.perf_counter() - t1, 3
                    )
            except BaseException as exc:  # surfaced on first use
                self._exc = exc

        # daemon + bounded atexit join: backend init wedged in a dead
        # relay must not block process exit (same policy as the dispatch
        # worker and prewarm threads)
        self._build_abandoned = False
        self._thread = threading.Thread(target=build, daemon=True)
        self._thread.start()
        _register_exit_wait(
            lambda timeout: None
            if self._build_abandoned
            else self._thread.join(timeout)
        )

    def _get(self) -> PallasPairHMMRunner:
        # the build itself is covered by the wedge budget: a backend init
        # blocked in a dead relay fails over to the C++ engine instead of
        # hanging the first submit forever
        timeout = self.cfg.device_timeout_s or None
        self._thread.join(timeout)
        if self._thread.is_alive():
            with self._decide_lock:
                if self._runner is None:
                    import sys

                    print(
                        f"[gatk_hc_tpu] device backend init unresponsive "
                        f"for {timeout:.0f}s — failing over to the "
                        "bit-exact C++ PairHMM engine for this run",
                        file=sys.stderr, flush=True,
                    )
                    self._runner = _NativeFallbackRunner(self.cfg)
                    self._build_abandoned = True
                # else: runner built, only prewarm still in flight — usable
                return self._runner
        if self._exc is not None:
            raise self._exc
        return self._runner

    @property
    def device_fallbacks(self) -> int:
        """Wedge-failover count of the wrapped runner (0 before build)."""
        return self._runner.device_fallbacks if self._runner else 0

    def submit(self, jobs):
        return self._get().submit(jobs)

    def drain(self, batches):
        return self._get().drain(batches)

    def run(self, jobs):
        return self._get().run(jobs)

    def prewarm(self, *args, **kwargs):  # already warming in the builder
        return None

    def stop_prewarm(self) -> None:
        self._stop_requested = True
        if self._runner is not None:
            self._runner.stop_prewarm()


class NativePairHMMRunner:
    """CPU batch runner over the C++ PairHMM engine — same job interface and
    exact semantics (f32 + FTZ with f64 rescue below MIN_ACCEPTED) as the
    Pallas runner, for call_batched with cfg.pairhmm_engine == 'native'.

    Jobs fan out over a host thread pool (cfg.host_threads, 0 = one per
    CPU): the C++ compute releases the GIL, so this is the CPU-engine
    equivalent of the reference's OpenMP `parallel for` over testcases
    (intel_pairhmm.hpp:128-131).  Each job's result is written to its own
    slot, so scheduling cannot affect output."""

    def __init__(self, cfg: HCConfig):
        self.cfg = cfg

    def run(self, jobs: Sequence[PairHMMJob]) -> None:
        n_workers = (
            self.cfg.host_threads
            if self.cfg.host_threads > 0
            else (os.cpu_count() or 1)
        )
        if n_workers > 1 and len(jobs) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(n_workers) as pool:
                list(pool.map(self._run_one, jobs))
        else:
            for job in jobs:
                self._run_one(job)

    def _run_one(self, job: PairHMMJob) -> None:
        from .. import native
        from .pairhmm_oracle import finalize_log10

        gop, gcp = self.cfg.gop_char, self.cfg.gcp_char
        nr, nh = len(job.reads), len(job.haps)
        if nr * nh == 0:
            job.result = np.zeros((nr, nh))
            return
        r_stride = max(len(b) for b, _ in job.reads)
        rb = np.zeros((nr, r_stride), dtype=np.uint8)
        rq = np.zeros((nr, r_stride), dtype=np.uint8)
        rl = np.zeros(nr, dtype=np.int32)
        for i, (b, q) in enumerate(job.reads):
            rb[i, : len(b)] = b
            rq[i, : len(q)] = q
            rl[i] = len(b)
        h_stride = max(len(h) for h in job.haps)
        hb = np.zeros((nh, h_stride), dtype=np.uint8)
        hl = np.zeros(nh, dtype=np.int32)
        for i, h in enumerate(job.haps):
            hb[i, : len(h)] = h
            hl[i] = len(h)
        pr = np.repeat(np.arange(nr, dtype=np.int32), nh)
        ph = np.tile(np.arange(nh, dtype=np.int32), nr)
        raw = native.pairhmm_raw_native(rb, rq, rl, hb, hl, pr, ph, gop, gcp)

        def rescue(indices, pr=pr, ph=ph):
            return native.pairhmm_raw_native(
                rb, rq, rl, hb, hl,
                pr[indices], ph[indices], gop, gcp, dtype=np.float64,
            )

        job.result = finalize_log10(
            raw, rescue, mode=self.cfg.f64_rescue
        ).reshape(nr, nh)
