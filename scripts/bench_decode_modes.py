#!/usr/bin/env python3
"""Compare decode kernel launch shapes (block-grid vs supertile-grid) and
measure the XLA-prep vs Pallas split on the real chip.

Usage: python scripts/bench_decode_modes.py [--mib 32] [--block 65536]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--modes", default="block,sup")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_dataset
    from hypersonic_rle_kit_tpu.ops import decode_sup, planar
    from hypersonic_rle_kit_tpu.parallel import container
    from hypersonic_rle_kit_tpu.utils import native

    log(f"devices: {jax.devices()}")
    data = make_dataset(args.mib)
    n = data.size
    nb = n // args.block
    x = data[: nb * args.block].reshape(nb, args.block)
    lens = np.full(nb, args.block, np.int32)
    cap = planar.capacity_for(args.block, 6)
    cols = native.planar_from_bytes(x, lens, cap)
    blob = container.serialize_blocks(0, n, args.block, 6, *cols)
    info, pcols = container.deserialize_to_planar(blob)
    sym, count, lit_len, lits, n_cmds, n_lits, block_len = pcols
    used = int(n_cmds.max())
    cap_used = max(128, 1 << (used - 1).bit_length())
    sym, count, lit_len = (a[:, :cap_used] for a in (sym, count, lit_len))
    dev = [jax.device_put(jnp.asarray(v)) for v in
           (sym, count, lit_len, lits, n_cmds, n_lits, block_len)]
    _ = np.asarray(dev[0][:1, :1])
    log(f"uploaded: nb={nb} cap_used={cap_used}")

    mx = int(decode_sup.max_events_per_sup(dev[1], dev[2], dev[4],
                                           block_size=args.block))
    wr = decode_sup.pick_wr(mx)
    log(f"max events/sup {mx} -> wr {wr}")

    t0 = time.perf_counter()
    for _ in range(4):
        _ = np.asarray(dev[0][:1, :1])
    fetch = (time.perf_counter() - t0) / 4
    log(f"fetch overhead {fetch*1e3:.2f} ms")

    xd = jax.device_put(jnp.asarray(x))

    def timed(fn, sync):
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(args.chain):
                r = fn()
            sync(r)
            ts.append((time.perf_counter() - t0 - fetch) / args.chain)
        return float(np.median(ts))

    for spec in args.modes.split(","):
        mode, _, st = spec.partition(":")
        stage = int(st) if st else 3

        def dec():
            return decode_sup.decode_columns_device(
                *dev, block_size=args.block, wr=wr, grid_mode=mode,
                stage=stage)
        t0 = time.perf_counter()
        out = dec()
        _ = np.asarray(out[0, :1])
        log(f"[{spec}] compile+run {time.perf_counter()-t0:.1f}s")
        ok = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(out, xd)))
        t = timed(dec, lambda r: np.asarray(r[0, :1]))
        log(f"[{spec}] roundtrip={ok} {t*1e3:.2f} ms = {n/t/1e9:.2f} GB/s")

    # prep-only: event stream + tables (jit, no pallas)
    @jax.jit
    def prep(count, lit_len, n_cmds, n_lits, block_len):
        ev, pos, val = decode_sup._event_stream(
            dev[0], count, lit_len, n_cmds)
        es, carry, lit0 = decode_sup._sup_tables(
            pos, val, n_lits, block_len, block_size=args.block, sup=4096)
        return ev, es, carry, lit0

    r = prep(dev[1], dev[2], dev[4], dev[5], dev[6])
    _ = np.asarray(r[0][:1, :1])
    t = timed(lambda: prep(dev[1], dev[2], dev[4], dev[5], dev[6]),
              lambda r: np.asarray(r[0][:1, :1]))
    log(f"[prep-only] {t*1e3:.2f} ms = {n/t/1e9:.2f} GB/s of decoded size")


if __name__ == "__main__":
    main()
