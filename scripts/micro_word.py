#!/usr/bin/env python3
"""Microbenchmarks isolating the word-native decode kernel's costs:
bitcast conversions (XLA), strided sublane slicing + sampled-prefix
matmul fusion variants (Pallas).  Round-5 experiment log for PERF.md."""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import numpy as np


def timed(fn, sync, iters=4, chain=8):
    import bench
    return bench._timed_chain(fn, sync, iters, chain)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, R, ROW = 256, 2048, 128
    R4 = R // 4
    B = R * ROW
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    # --- E1: output-side bitcast i32 words -> u8 bytes (XLA) ---
    wrd = jax.device_put(jnp.asarray(
        rng.integers(-2**31, 2**31, (nb, R4, ROW), dtype=np.int64)
        .astype(np.int32)))

    @jax.jit
    def out_bitcast(w):
        return jax.lax.bitcast_convert_type(w, jnp.uint8).reshape(nb, B)

    r = out_bitcast(wrd)
    t = timed(lambda: out_bitcast(wrd), lambda r: np.asarray(r[0, :1]))
    print(f"E1 out bitcast i32->u8 + reshape: {t*1e3:8.2f} ms", file=sys.stderr)

    # --- E2: input-side bitcast u8 -> i32 words (XLA) ---
    byt = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (nb, B), dtype=np.int64).astype(np.uint8)))

    @jax.jit
    def in_bitcast(x):
        return jax.lax.bitcast_convert_type(
            x.reshape(nb, R4 * ROW, 4), jnp.int32).reshape(nb, R4, ROW)

    r = in_bitcast(byt)
    t = timed(lambda: in_bitcast(byt), lambda r: np.asarray(r[0, :1, :1]))
    print(f"E2 in bitcast u8->i32: {t*1e3:8.2f} ms", file=sys.stderr)

    # --- E3: Pallas variants of the sampled-prefix stage ---
    pv = jax.device_put(jnp.asarray(
        rng.integers(-4, 5, (nb, R, ROW), dtype=np.int64)
        .astype(np.float32).astype(jnp.bfloat16)))

    def mk(body):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(nb,),
            in_specs=[pl.BlockSpec((1, R, ROW), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((1, R4, ROW), lambda b: (b, 0, 0)))
        f = pl.pallas_call(
            body, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, R4, ROW), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        return jax.jit(lambda x: f(x))

    def consts():
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
        li = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
        lo = (lane128 & 31) * 4
        grp = jax.lax.shift_right_logical(lane128, 5)
        return lane128, li, lo, grp

    mdn = (((1,), (0,)), ((), ()))

    def body_smalls(x_ref, o_ref):
        painted = x_ref[0]
        lane128, li, lo, grp = consts()
        Ms = [[(((li >= lo) & (li <= lo + t) & (grp == j))
                .astype(jnp.bfloat16)) for j in range(4)] for t in range(4)]
        pj = [painted.reshape(R4, 4, ROW)[:, j, :] for j in range(4)]
        acc = None
        for t in range(4):
            for j in range(4):
                mm = jax.lax.dot_general(pj[j], Ms[t][j],
                                         dimension_numbers=mdn,
                                         preferred_element_type=jnp.float32)
                acc = mm if acc is None else acc + mm
        o_ref[0] = acc.astype(jnp.int32)

    def body_slice_only(x_ref, o_ref):
        painted = x_ref[0]
        pj = [painted.reshape(R4, 4, ROW)[:, j, :] for j in range(4)]
        o_ref[0] = sum(p.astype(jnp.float32) for p in pj).astype(jnp.int32)

    def body_slice_i32(x_ref, o_ref):
        painted = x_ref[0].astype(jnp.int32)
        pj = [painted.reshape(R4, 4, ROW)[:, j, :] for j in range(4)]
        o_ref[0] = sum(pj)

    def body_fused4(x_ref, o_ref):
        painted = x_ref[0]
        lane128, li, lo, grp = consts()
        acc = None
        pj = [painted.reshape(R4, 4, ROW)[:, j, :] for j in range(4)]
        for j in range(4):
            # [128, 512]: t-concat along output lanes
            cols = []
            for t in range(4):
                cols.append(((li >= lo) & (li <= lo + t) & (grp == j))
                            .astype(jnp.bfloat16))
            M = jnp.concatenate(cols, axis=1)
            mm = jax.lax.dot_general(pj[j], M, dimension_numbers=mdn,
                                     preferred_element_type=jnp.float32)
            acc = mm if acc is None else acc + mm
        o_ref[0] = (acc[:, :ROW] + acc[:, ROW:2 * ROW]
                    + acc[:, 2 * ROW:3 * ROW]
                    + acc[:, 3 * ROW:]).astype(jnp.int32)

    def body_big1(x_ref, o_ref):
        painted = x_ref[0]
        lane128, li, lo, grp = consts()
        pj = [painted.reshape(R4, 4, ROW)[:, j, :] for j in range(4)]
        X = jnp.concatenate(pj, axis=1)               # [R4, 512]
        blocks = []
        for j in range(4):
            cols = []
            for t in range(4):
                cols.append(((li >= lo) & (li <= lo + t) & (grp == j))
                            .astype(jnp.bfloat16))
            blocks.append(jnp.concatenate(cols, axis=1))   # [128, 512]
        M = jnp.concatenate(blocks, axis=0)           # [512, 512]
        mm = jax.lax.dot_general(X, M, dimension_numbers=mdn,
                                 preferred_element_type=jnp.float32)
        o_ref[0] = (mm[:, :ROW] + mm[:, ROW:2 * ROW]
                    + mm[:, 2 * ROW:3 * ROW] + mm[:, 3 * ROW:]
                    ).astype(jnp.int32)

    for name, body in (("slice-only(bf16->f32 sum)", body_slice_only),
                       ("slice-i32", body_slice_i32),
                       ("16 small matmuls", body_smalls),
                       ("4 fused [128,512]", body_fused4),
                       ("1 big [512,512]", body_big1)):
        try:
            f = mk(body)
            r = f(pv)
            _ = np.asarray(r[0, :1, :1])
            t = timed(lambda: f(pv), lambda r: np.asarray(r[0, :1, :1]))
            print(f"E3 {name:28s}: {t*1e3:8.2f} ms", file=sys.stderr)
        except Exception as e:
            print(f"E3 {name:28s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr)

    # --- E4: bucketing one-hot orientations (XLA) ---
    E, ns = 8192, 16
    s_i = jax.device_put(jnp.asarray(
        rng.integers(0, ns + 1, (nb, E), dtype=np.int64).astype(np.int32)))
    sb = jnp.arange(ns, dtype=jnp.int32)

    @jax.jit
    def cnt_a(s):   # lane-minor E
        return jnp.sum((s[:, None, :] == sb[None, :, None])
                       .astype(jnp.int32), axis=2)

    @jax.jit
    def cnt_b(s):   # ns minor (r4 formulation)
        return jnp.sum((s[:, :, None] == sb[None, None, :])
                       .astype(jnp.int32), axis=1)

    for name, f in (("lane-minor E", cnt_a), ("ns-minor", cnt_b)):
        r = f(s_i)
        t = timed(lambda: f(s_i), lambda r: np.asarray(r[0, :1]))
        print(f"E4 cnt {name:14s}: {t*1e3:8.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
