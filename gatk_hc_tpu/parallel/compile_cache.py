"""Persistent XLA compilation cache.

The Pallas kernel compiles in ~1-5 minutes per program on the TPU toolchain;
the persistent cache makes subsequent processes start instantly.  Cache
entries key on program + compile env, so this is safe across runs.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    "GATK_HC_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/gatk_hc_tpu_xla")
)


def enable_compile_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: flag names differ; cache is best-effort
