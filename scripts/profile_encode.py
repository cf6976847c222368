#!/usr/bin/env python3
"""Stage-time profile of the Pallas encode kernel (stages 1-4)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

import numpy as np


def main():
    import bench
    import jax
    import jax.numpy as jnp
    from hypersonic_rle_kit_tpu.ops import encode_sup, planar

    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    eb = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    stages = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else [1, 2, 3, 4])]
    data = bench.make_dataset(mib)
    nbe = data.size // eb
    xe = data[: nbe * eb].reshape(nbe, eb)
    lens = np.full(nbe, eb, np.int32)
    cap = planar.capacity_for(eb, 6)
    xed = jax.device_put(jnp.asarray(xe))
    ld = jnp.asarray(lens)
    n = nbe * eb
    prev = 0.0
    for st in stages:
        def run(st=st):
            return encode_sup.encode_blocks_kernel(
                xed, ld, capacity=cap, min_count=6, stage=st)
        r = run()
        _ = np.asarray(r[0][:1, :1])
        t = bench._timed_chain(run, lambda r: np.asarray(r[0][:1, :1]), 4, 6)
        print(f"stage {st}: {t*1e3:8.2f} ms  delta {max(0,(t-prev))*1e3:8.2f}"
              f" ms   {n/t/1e9:7.2f} GB/s", file=sys.stderr)
        prev = t


if __name__ == "__main__":
    main()
