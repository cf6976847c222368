#!/usr/bin/env python3
"""One-process G/W sweep of the decode paint stage (env read per call)."""
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
    from hypersonic_rle_kit_tpu.ops import decode_sup, planar
    from hypersonic_rle_kit_tpu.parallel import container
    from hypersonic_rle_kit_tpu.utils import native

    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    stage = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cfgs = sys.argv[3].split(";") if len(sys.argv) > 3 else [
        "4 128", "4 192", "8 256", "8 384", "16 512"]
    block = int(os.environ.get("HSRK_SWEEP_BLOCK", str(1 << 17)))
    data = bench.make_dataset(mib)
    nb = data.size // block
    x = data[: nb * block].reshape(nb, block)
    n = nb * block
    lens = np.full(nb, block, np.int32)
    cap = planar.capacity_for(block, 6)
    cols = native.planar_from_bytes(x, lens, cap)
    blob = container.serialize_blocks(0, n, block, 6, *cols)
    info, pc = container.deserialize_to_planar(blob)
    used = int(pc[4].max())
    cap_used = max(128, -(-used // 128) * 128)
    dev = [jax.device_put(jnp.asarray(v)) for v in
           (pc[0][:, :cap_used], pc[1][:, :cap_used], pc[2][:, :cap_used],
            pc[3], pc[4], pc[5], pc[6])]
    xd = jax.device_put(jnp.asarray(x))
    for cfg in cfgs:
        parts = cfg.split()
        g, w = parts[0], parts[1]
        os.environ["HSRK_PAINT_G"] = g
        os.environ["HSRK_PAINT_W"] = w
        os.environ["HSRK_PAINT_A"] = parts[2] if len(parts) > 2 else "8"

        def run(st=stage):
            return decode_sup.decode_columns_device(
                *dev, block_size=block, stage=st)
        out = decode_sup.decode_columns_device(*dev, block_size=block)
        ok = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(out, xd)))
        r = run()
        _ = np.asarray(r[0, :1])
        t = bench._timed_chain(run, lambda r: np.asarray(r[0, :1]), 4, 8)
        print(f"G={g:>3} W={w:>4} A={os.environ['HSRK_PAINT_A']:>3} stage={stage}: {t*1e3:8.2f} ms "
              f"{n/t/1e9:7.2f} GB/s  ok={ok}", flush=True)


if __name__ == "__main__":
    main()
