#!/usr/bin/env python3
"""Stage-profile the flat decode kernel on the real chip
(--modes flat:0,flat:1,flat:2,flat:3 = prep/IO, +paint, +scan, full).

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


def run_config(args, block, jax, jnp, data):
    from hypersonic_rle_kit_tpu.ops import decode_sup, planar
    from hypersonic_rle_kit_tpu.parallel import container
    from hypersonic_rle_kit_tpu.utils import native

    n = data.size
    nb = n // block
    x = data[: nb * block].reshape(nb, block)
    lens = np.full(nb, block, np.int32)
    cap = planar.capacity_for(block, 6)
    cols = native.planar_from_bytes(x, lens, cap)
    blob = container.serialize_blocks(0, n, block, 6, *cols)
    info, pcols = container.deserialize_to_planar(blob)
    sym, count, lit_len, lits, n_cmds, n_lits, block_len = pcols
    used = int(n_cmds.max())
    cap_used = max(128, 1 << (used - 1).bit_length())
    sym, count, lit_len = (a[:, :cap_used] for a in (sym, count, lit_len))
    dev = [jax.device_put(jnp.asarray(v)) for v in
           (sym, count, lit_len, lits, n_cmds, n_lits, block_len)]
    _ = np.asarray(dev[0][:1, :1])
    log(f"B={block}: nb={nb} cap_used={cap_used}")

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
        _, _, st = spec.partition(":")
        stage = int(st) if st else 3

        def dec():
            return decode_sup.decode_columns_device(
                *dev, block_size=block, stage=stage)
        t0 = time.perf_counter()
        out = dec()
        _ = np.asarray(out[0, :1])
        log(f"[B={block} {spec}] compile+run {time.perf_counter()-t0:.1f}s")
        ok = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(out, xd)))
        t = timed(dec, lambda r: np.asarray(r[0, :1]))
        log(f"[B={block} {spec}] roundtrip={ok} {t*1e3:.2f} ms = "
            f"{n/t/1e9:.2f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=32)
    ap.add_argument("--blocks", default="65536")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=4)
    ap.add_argument("--modes", default="flat")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_dataset

    log(f"devices: {jax.devices()}")
    data = make_dataset(args.mib)
    for b in args.blocks.split(","):
        run_config(args, int(b), jax, jnp, data)


if __name__ == "__main__":
    main()
