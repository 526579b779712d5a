"""Pre-load the standard Pallas program set into the caches.

Two caches exist: jax's persistent compilation cache (fast anyway — the
client-side compile is <1s) and the tunnel terminal's executable cache,
which charges ~60s the FIRST time a given program binary is executed and is
shared across processes.  This runs every program shape the production
runner can emit once, so later runs (bench, CLI, the driver) start fast.

Usage: python tools/warm_cache.py [--quick]
"""
import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from gatk_hc_tpu.parallel.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--quick", action="store_true",
        help="only the shapes bench.py and the chrM fixture need",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="warm ALL k-group fused dispatch programs (k in 2,4,8) for "
        "the bench shape; k=4 (the bench/production fused arm) is always "
        "warmed regardless",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gatk_hc_tpu.config import DEFAULT_CONFIG
    from gatk_hc_tpu.ops.pairhmm_jax import transition_constants
    from gatk_hc_tpu.ops.pairhmm_pallas import (
        pairhmm_pallas_planes, ppe_element_table,
    )
    from gatk_hc_tpu.ops.runner import PallasPairHMMRunner
    from gatk_hc_tpu.utils.quality import BASE_TABLE, PH2PR_F32

    cfg = DEFAULT_CONFIG
    trans = transition_constants(cfg.gop_char, cfg.gcp_char)
    base = jnp.asarray(BASE_TABLE.astype(np.int32))
    omq = jnp.asarray((1.0 - PH2PR_F32).astype(np.float32))
    q3 = jnp.asarray((PH2PR_F32 / np.float32(3.0)).astype(np.float32))
    ppe_tab = jnp.asarray(ppe_element_table(BASE_TABLE, PH2PR_F32))

    runner = PallasPairHMMRunner(cfg)  # for chunk defaults
    chunks = runner._chunks[:2] if args.quick else runner._chunks
    r_pads = (160,) if args.quick else cfg.read_pad_buckets
    # quick: the programs bench.py, chrM, and a standard short-read contig
    # hit first (also the runner.prewarm() default set)
    buckets = (
        ((1024, 128), (4096, 512)) if args.quick else
        tuple(itertools.product(
            PallasPairHMMRunner.READ_BUCKETS, PallasPairHMMRunner.HAP_BUCKETS
        ))
    )
    c_pads = (448,) if args.quick else cfg.hap_pad_buckets
    combos = list(itertools.product(buckets, r_pads, c_pads, chunks))
    from gatk_hc_tpu.ops import aot

    platform = jax.default_backend()
    rng = np.random.default_rng(0)
    for (nr, nh), r_pad, c_pad, chunk in combos:

        def f(buf, pairs, nr=nr, nh=nh, r_pad=r_pad, c_pad=c_pad):
            return pairhmm_pallas_planes(
                buf, pairs, trans,
                nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
                ppe_rows=cfg.ppe_rows,
            )

        key = aot.planes_signature_key(
            platform, nr, nh, r_pad, c_pad, chunk, cfg.ppe_rows, trans,
        )
        buf_len = nr + 2 * nh + 3 * nr * r_pad + nh * c_pad
        shapes = (
            jax.ShapeDtypeStruct((buf_len,), jnp.int32),
            jax.ShapeDtypeStruct((2, chunk), jnp.int32),
        )
        t0 = time.time()
        fn = aot.load(key)
        exported = "cached-export"
        if fn is None:
            aot.save(key, f, shapes)  # one-time trace+serialize
            fn = aot.load(key)
            exported = "exported"
        if fn is None:  # export unsupported on this backend: plain jit
            fn, exported = f, "jit"

        buf = np.ones(buf_len, np.int32)
        pairs = np.zeros((2, chunk), np.int32)
        pairs[0] = rng.integers(0, nr, chunk)
        pairs[1] = rng.integers(0, nh, chunk)
        out = fn(jnp.asarray(buf), jnp.asarray(pairs))
        np.asarray(out)
        print(
            f"nr={nr} nh={nh} r_pad={r_pad} c_pad={c_pad} chunk={chunk}: "
            f"{time.time()-t0:.1f}s ({exported})",
            flush=True,
        )

    # packed-path programs (adaptive dispatch calibration targets): warm
    # the terminal executable cache so a production run's first packed
    # calibration never pays a cold program load (15-80s)
    if not args.quick:
        from gatk_hc_tpu.ops.pairhmm_pallas import (
            dispatch_pairs_ppe, prepare_tables_ppe,
        )

        for (nr, nh), r_pad, c_pad, chunk in combos:
            t0 = time.time()
            u8buf = jnp.asarray(
                np.ones(2 * nr * r_pad + nh * c_pad, np.uint8)
            )
            i32buf = jnp.asarray(np.ones(nr + 2 * nh, np.int32))
            tables = prepare_tables_ppe(
                u8buf, i32buf, ppe_tab,
                nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
            )
            pairs = np.zeros((2, chunk), np.int32)
            pairs[0] = rng.integers(0, nr, chunk)
            pairs[1] = rng.integers(0, nh, chunk)
            out = dispatch_pairs_ppe(
                *tables, jnp.asarray(pairs), trans,
                r_pad=r_pad, c_pad=c_pad, ppe_rows=cfg.ppe_rows,
            )
            np.asarray(out)
            print(
                f"packed nr={nr} nh={nh} r_pad={r_pad} c_pad={c_pad} "
                f"chunk={chunk}: {time.time()-t0:.1f}s",
                flush=True,
            )

    # fused dispatch warm: k=4 always (bench.py's fused arm runs every
    # bench round); all of (2, 4, 8) with --fused or when production
    # fuses by default
    from gatk_hc_tpu.ops.pairhmm_pallas import pairhmm_pallas_planes_fused

    fused_ks = (2, 4, 8) if (args.fused or cfg.fuse_groups > 1) else (4,)
    nr, nh, r_pad, c_pad, chunk = 4096, 512, 160, 448, runner._chunks[0]
    buf_len = nr + 2 * nh + 3 * nr * r_pad + nh * c_pad
    for k in fused_ks:

        def ff(bufs, pairs, k=k):
            return pairhmm_pallas_planes_fused(
                bufs, pairs, trans,
                nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
                ppe_rows=cfg.ppe_rows,
            )

        key = aot.fused_signature_key(
            platform, k, nr, nh, r_pad, c_pad, chunk, cfg.ppe_rows,
            trans,
        )
        shapes = (
            jax.ShapeDtypeStruct((k, buf_len), jnp.int32),
            jax.ShapeDtypeStruct((k, 2, chunk), jnp.int32),
        )
        t0 = time.time()
        fn = aot.load(key)
        exported = "cached-export"
        if fn is None:
            aot.save(key, ff, shapes)
            fn = aot.load(key)
            exported = "exported"
        if fn is None:
            fn, exported = ff, "jit"
        bufs = np.ones((k, buf_len), np.int32)
        pairs = np.zeros((k, 2, chunk), np.int32)
        pairs[:, 0] = rng.integers(0, nr, (k, chunk))
        pairs[:, 1] = rng.integers(0, nh, (k, chunk))
        np.asarray(fn(jnp.asarray(bufs), jnp.asarray(pairs)))
        print(f"fused k={k} chunk={chunk}: {time.time()-t0:.1f}s "
              f"({exported})", flush=True)

    # packed one-launch + k-fused packed programs (the production default
    # dispatch is adaptive encoding x fuse_groups=4, so a run that
    # calibrates onto packed dispatches pairhmm_pallas_packed_fused)
    from gatk_hc_tpu.ops.pairhmm_pallas import (
        pairhmm_pallas_packed, pairhmm_pallas_packed_fused,
    )

    packed_ks = (1, 2, 4, 8) if args.fused else (1, 4)
    for (nr, nh), r_pad, c_pad, chunk in combos:
        u8_len = 2 * nr * r_pad + nh * c_pad
        i32_len = nr + 2 * nh
        for k in packed_ks:
            if k == 1:
                def fp(u8, i32, tab, pairs, nr=nr, nh=nh, r_pad=r_pad,
                       c_pad=c_pad):
                    return pairhmm_pallas_packed(
                        u8, i32, tab, pairs, trans,
                        nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
                        ppe_rows=cfg.ppe_rows,
                    )

                key = aot.packed_signature_key(
                    platform, nr, nh, r_pad, c_pad, chunk, cfg.ppe_rows,
                    trans,
                )
                shapes = (
                    jax.ShapeDtypeStruct((u8_len,), jnp.uint8),
                    jax.ShapeDtypeStruct((i32_len,), jnp.int32),
                    jax.ShapeDtypeStruct(ppe_tab.shape, ppe_tab.dtype),
                    jax.ShapeDtypeStruct((2, chunk), jnp.int32),
                )
                u8_np = np.ones((u8_len,), np.uint8)
                i32_np = np.ones((i32_len,), np.int32)
                pairs = np.zeros((2, chunk), np.int32)
                pairs[0] = rng.integers(0, nr, chunk)
                pairs[1] = rng.integers(0, nh, chunk)
                call_args = (jnp.asarray(u8_np), jnp.asarray(i32_np),
                             ppe_tab, jnp.asarray(pairs))
            else:
                def fp(u8s, i32s, tab, pairs, k=k, nr=nr, nh=nh,
                       r_pad=r_pad, c_pad=c_pad):
                    return pairhmm_pallas_packed_fused(
                        u8s, i32s, tab, pairs, trans,
                        nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
                        ppe_rows=cfg.ppe_rows,
                    )

                key = aot.packed_fused_signature_key(
                    platform, k, nr, nh, r_pad, c_pad, chunk,
                    cfg.ppe_rows, trans,
                )
                shapes = (
                    jax.ShapeDtypeStruct((k, u8_len), jnp.uint8),
                    jax.ShapeDtypeStruct((k, i32_len), jnp.int32),
                    jax.ShapeDtypeStruct(ppe_tab.shape, ppe_tab.dtype),
                    jax.ShapeDtypeStruct((k, 2, chunk), jnp.int32),
                )
                pairs = np.zeros((k, 2, chunk), np.int32)
                pairs[:, 0] = rng.integers(0, nr, (k, chunk))
                pairs[:, 1] = rng.integers(0, nh, (k, chunk))
                call_args = (
                    jnp.asarray(np.ones((k, u8_len), np.uint8)),
                    jnp.asarray(np.ones((k, i32_len), np.int32)),
                    ppe_tab, jnp.asarray(pairs),
                )
            t0 = time.time()
            fn = aot.load(key)
            exported = "cached-export"
            if fn is None:
                aot.save(key, fp, shapes)
                fn = aot.load(key)
                exported = "exported"
            if fn is None:
                fn, exported = fp, "jit"
            np.asarray(fn(*call_args))
            print(
                f"packed{'' if k == 1 else f'fused k={k}'} nr={nr} nh={nh} "
                f"r_pad={r_pad} c_pad={c_pad} chunk={chunk}: "
                f"{time.time()-t0:.1f}s ({exported})",
                flush=True,
            )

    # minimal-bytes packed programs (packed_nib, the production packed
    # encoding since r5): span buckets 8 (whole-group jobs, the bench
    # shape) and 64 (~40 small wgs-shaped jobs per group)
    from gatk_hc_tpu.ops.pairhmm_pallas import pairhmm_pallas_packed_nib

    for (nr, nh), r_pad, c_pad, chunk in combos:
        u8n_len = nr * r_pad + nh * c_pad
        i32_len = nr + 2 * nh
        for n_spans in (8, 64):

            def fnib(u8, i32, mt, tab, spans, nr=nr, nh=nh, r_pad=r_pad,
                     c_pad=c_pad, chunk=chunk):
                return pairhmm_pallas_packed_nib(
                    u8, i32, mt, tab, spans, trans, n_pairs=chunk,
                    nr_pad=nr, nh_pad=nh, r_pad=r_pad, c_pad=c_pad,
                    ppe_rows=cfg.ppe_rows,
                )

            key = aot.packed_nib_signature_key(
                platform, nr, nh, r_pad, c_pad, chunk, n_spans,
                cfg.ppe_rows, trans,
            )
            shapes = (
                jax.ShapeDtypeStruct((u8n_len,), jnp.uint8),
                jax.ShapeDtypeStruct((i32_len,), jnp.int32),
                jax.ShapeDtypeStruct((72,), jnp.int32),
                jax.ShapeDtypeStruct(ppe_tab.shape, ppe_tab.dtype),
                jax.ShapeDtypeStruct((n_spans, 4), jnp.int32),
            )
            spans_np = np.zeros((n_spans, 4), np.int32)
            spans_np[0] = (0, 0, nr, max(1, chunk // nr))
            t0 = time.time()
            fn = aot.load(key)
            exported = "cached-export"
            if fn is None:
                aot.save(key, fnib, shapes)
                fn = aot.load(key)
                exported = "exported"
            if fn is None:
                fn, exported = fnib, "jit"
            np.asarray(fn(
                jnp.asarray(np.ones((u8n_len,), np.uint8)),
                jnp.asarray(np.ones((i32_len,), np.int32)),
                jnp.asarray(np.zeros(72, np.int32)),
                ppe_tab, jnp.asarray(spans_np),
            ))
            print(
                f"packednib nr={nr} nh={nh} r_pad={r_pad} c_pad={c_pad} "
                f"chunk={chunk} S={n_spans}: {time.time()-t0:.1f}s "
                f"({exported})",
                flush=True,
            )

    # the driver's single-chip entry-point program
    import __graft_entry__ as g

    fn, eargs = g.entry()
    t0 = time.time()
    np.asarray(jax.jit(fn)(*eargs))
    print(f"__graft_entry__.entry(): {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
