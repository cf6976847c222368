#!/usr/bin/env python3
"""Stage-time profile of the flagship decode kernel on the bench dataset.

Runs decode_columns_device at stage 0 (prep/IO), 1 (+paint), 2 (+scan),
3 (full) with the paired-chain timing from bench.py and prints a stage table
(ms and GB/s of decoded bytes).  VERDICT r3 task #1.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=64)
    ap.add_argument("--block", type=int, default=1 << 17)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--stages", type=str, default="0,1,2,3")
    ap.add_argument("--dataset", choices=["dct", "bwt", "random"],
                    default="dct")
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp
    from hypersonic_rle_kit_tpu.ops import decode_sup, planar
    from hypersonic_rle_kit_tpu.parallel import container
    from hypersonic_rle_kit_tpu.utils import native

    maker = {"dct": bench.make_dataset, "bwt": bench.make_bwt_dataset,
             "random": bench.make_random_dataset}[args.dataset]
    data = maker(args.mib)
    block = args.block
    nb = data.size // block
    x = data[: nb * block].reshape(nb, block)
    n = nb * block
    lens = np.full(nb, block, np.int32)
    cap = planar.capacity_for(block, 6)
    cols = native.planar_from_bytes(x, lens, cap)
    blob = container.serialize_blocks(0, n, block, 6, *cols)
    info, pc = container.deserialize_to_planar(blob)
    used = int(pc[4].max())
    cap_used = max(128, 1 << (used - 1).bit_length())
    dev = [jax.device_put(jnp.asarray(v)) for v in
           (pc[0][:, :cap_used], pc[1][:, :cap_used], pc[2][:, :cap_used],
            decode_sup.lits_to_words(pc[3]), pc[4], pc[5], pc[6])]
    print(f"backend={jax.default_backend()} nb={nb} block={block} "
          f"cap={cap_used} ratio={len(blob)/n:.4f} "
          f"ncmds mean={pc[4].mean():.0f} max={used}", file=sys.stderr)

    xd = jax.device_put(jnp.asarray(np.ascontiguousarray(x).view(np.int32)))
    t0 = time.perf_counter()
    out = decode_sup.decode_columns_device(*dev, block_size=block,
                                           out_words=True)
    _ = np.asarray(out[0, :1])
    print(f"compile+first run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    ok = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(out, xd)))
    print(f"roundtrip={ok}", file=sys.stderr)

    prev = 0.0
    for st in [int(s) for s in args.stages.split(",")]:
        def run(st=st):
            return decode_sup.decode_columns_device(
                *dev, block_size=block, stage=st, out_words=True)
        r = run()
        _ = np.asarray(r[0, :1])    # compile
        t = bench._timed_chain(run, lambda r: np.asarray(r[0, :1]),
                               args.iters, args.chain)
        print(f"stage {st}: {t*1e3:8.2f} ms  delta {max(0,(t-prev))*1e3:8.2f} ms"
              f"   {n/t/1e9:7.2f} GB/s", file=sys.stderr)
        prev = t


if __name__ == "__main__":
    main()
