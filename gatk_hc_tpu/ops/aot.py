"""AOT program cache: jax.export artifacts for the production dispatches.

Per-process jit tracing of the Pallas dispatch programs costs ~3s each —
the dominant cold-start term for small inputs (the XLA *executable* cache
is already persistent, but tracing/lowering reruns in every process).
``jax.export`` serializes the lowered StableHLO once (tools/warm_cache.py);
later processes deserialize in ~0ms and only pay executable-cache load +
chip program upload (~1.5s -> ~0.3s on later calls).

Artifacts are keyed by the full static signature AND a hash of the kernel
sources + jax version, so stale exports can never silently change
semantics — any source edit falls back to regular tracing.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence, Tuple

_CACHE_DIR = os.environ.get(
    "GATK_HC_TPU_AOT_DIR",
    os.path.expanduser("~/.cache/gatk_hc_tpu_aot"),
)

# sources whose semantics the exported programs bake in
_HASHED_SOURCES = ("pairhmm_pallas.py", "pairhmm_jax.py")


def _source_hash() -> str:
    h = hashlib.sha256()
    base = os.path.dirname(os.path.abspath(__file__))
    import jax

    h.update(jax.__version__.encode())
    for name in _HASHED_SOURCES:
        with open(os.path.join(base, name), "rb") as handle:
            h.update(handle.read())
    return h.hexdigest()[:16]


def planes_signature_key(
    platform: str,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    n_pairs: int,
    ppe_rows: int,
    trans: Tuple,
) -> str:
    trans_tag = hashlib.sha256(repr(tuple(trans)).encode()).hexdigest()[:8]
    return (
        f"planes-{platform}-{nr_pad}x{nh_pad}-{r_pad}x{c_pad}-B{n_pairs}"
        f"-ppe{ppe_rows}-t{trans_tag}-{_source_hash()}"
    )


def fused_signature_key(
    platform: str,
    k: int,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    n_pairs: int,
    ppe_rows: int,
    trans: Tuple,
) -> str:
    """Key for the k-group fused dispatch (pairhmm_pallas_planes_fused)."""
    trans_tag = hashlib.sha256(repr(tuple(trans)).encode()).hexdigest()[:8]
    return (
        f"fused{k}-{platform}-{nr_pad}x{nh_pad}-{r_pad}x{c_pad}-B{n_pairs}"
        f"-ppe{ppe_rows}-t{trans_tag}-{_source_hash()}"
    )


def packed_signature_key(
    platform: str,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    n_pairs: int,
    ppe_rows: int,
    trans: Tuple,
) -> str:
    """Key for the one-launch packed dispatch (pairhmm_pallas_packed)."""
    trans_tag = hashlib.sha256(repr(tuple(trans)).encode()).hexdigest()[:8]
    return (
        f"packed-{platform}-{nr_pad}x{nh_pad}-{r_pad}x{c_pad}-B{n_pairs}"
        f"-ppe{ppe_rows}-t{trans_tag}-{_source_hash()}"
    )


def packed_nib_signature_key(
    platform: str,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    n_pairs: int,
    n_spans: int,
    ppe_rows: int,
    trans: Tuple,
) -> str:
    """Key for the minimal-bytes packed dispatch
    (pairhmm_pallas_packed_nib)."""
    trans_tag = hashlib.sha256(repr(tuple(trans)).encode()).hexdigest()[:8]
    return (
        f"packednib-{platform}-{nr_pad}x{nh_pad}-{r_pad}x{c_pad}"
        f"-B{n_pairs}-S{n_spans}-ppe{ppe_rows}-t{trans_tag}-{_source_hash()}"
    )


def packed_fused_signature_key(
    platform: str,
    k: int,
    nr_pad: int,
    nh_pad: int,
    r_pad: int,
    c_pad: int,
    n_pairs: int,
    ppe_rows: int,
    trans: Tuple,
) -> str:
    """Key for the k-group fused packed dispatch
    (pairhmm_pallas_packed_fused)."""
    trans_tag = hashlib.sha256(repr(tuple(trans)).encode()).hexdigest()[:8]
    return (
        f"packedfused{k}-{platform}-{nr_pad}x{nh_pad}-{r_pad}x{c_pad}"
        f"-B{n_pairs}-ppe{ppe_rows}-t{trans_tag}-{_source_hash()}"
    )


def _path(key: str) -> str:
    return os.path.join(_CACHE_DIR, key + ".jaxexport")


def load(key: str):
    """Deserialized exported callable for `key`, or None."""
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        from jax import export

        with open(path, "rb") as handle:
            exp = export.deserialize(handle.read())
        import jax

        return jax.jit(exp.call)
    except Exception:
        return None  # stale/corrupt artifact: fall back to tracing


def save(key: str, fn, arg_shapes: Sequence) -> Optional[str]:
    """Trace + export `fn` at `arg_shapes` and persist it (slow: ~10s)."""
    import jax
    from jax import export

    os.makedirs(_CACHE_DIR, exist_ok=True)
    exp = export.export(jax.jit(fn))(*arg_shapes)
    blob = exp.serialize()
    path = _path(key)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as handle:
        handle.write(blob)
    os.replace(tmp, path)
    return path
