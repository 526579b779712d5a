"""Pre-compile the standard Pallas program set into the persistent cache.

The TPU AOT toolchain in this environment costs ~200s per program; this
compiles every (r_pad, c_pad) variant the production runner can emit so
later runs (bench, CLI, driver) start instantly.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache
enable_compile_cache()
from gatk_hc_tpu.config import DEFAULT_CONFIG
from gatk_hc_tpu.ops.runner import PairHMMJob, PallasPairHMMRunner

def main():
    runner = PallasPairHMMRunner(DEFAULT_CONFIG)
    rng = np.random.default_rng(0)
    for r_len, c_len in [(151, 415), (200, 415), (90, 250)]:
        reads = [(rng.integers(65, 85, r_len).astype(np.uint8),
                  np.full(r_len, 73, np.uint8)) for _ in range(2)]
        haps = [rng.integers(65, 85, c_len).astype(np.uint8) for _ in range(2)]
        job = PairHMMJob(reads, haps)
        t0 = time.time()
        runner.run([job])
        r_pad, c_pad = runner._pads_for_group([job], [0])
        print(f"({r_pad}, {c_pad}): {time.time()-t0:.1f}s", flush=True)

if __name__ == "__main__":
    main()
