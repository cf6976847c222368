#!/usr/bin/env python3
"""Probe benchmark: end-to-end device decode (ops/decode_e2e.py) and device
encode (ops/device.py) on the real chip.  Used to guide optimization; the
official metric lives in bench.py."""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=16)
    ap.add_argument("--block", type=int, default=1 << 16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--what", default="decode",
                    choices=["decode", "encode", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import make_dataset
    from hypersonic_rle_kit_tpu.ops import decode_e2e, device, planar
    from hypersonic_rle_kit_tpu.utils import native

    log("backend:", jax.default_backend(), jax.devices())
    data = make_dataset(args.mib)
    B = args.block
    nb = data.size // B
    n = nb * B
    x = data[:n].reshape(nb, B)
    lens = np.full(nb, B, np.int32)
    cap = planar.capacity_for(B, 6)

    t0 = time.perf_counter()
    cols = native.planar_from_bytes(x, lens, cap)
    log(f"host encode: {n / (time.perf_counter() - t0) / 1e9:.2f} GB/s")
    sym, count, lit_len, lits, n_cmds, n_lits = cols
    # trim the command capacity to the actual max (static shape per dataset)
    used = int(n_cmds.max())
    used = (used + 127) // 128 * 128
    sym, count, lit_len = sym[:, :used], count[:, :used], lit_len[:, :used]
    max_lits = (int(n_lits.max()) + 127) // 128 * 128
    lits_t = np.ascontiguousarray(lits[:, :max_lits])
    comp_bytes = (used * 9 + max_lits) * nb
    log(f"cmd capacity {used}, lits {max_lits}; device input "
        f"{comp_bytes / n:.2f} B per output byte")

    if args.what in ("decode", "both"):
        dev = [jax.device_put(jnp.asarray(v))
               for v in (sym, count, lit_len, lits_t, n_cmds, lens)]
        t0 = time.perf_counter()
        y = decode_e2e.decode_planar_device(*dev, block_size=B, min_count=6)
        _ = np.asarray(y[0, :1])
        log(f"decode compile+run: {time.perf_counter() - t0:.1f}s")
        ok = bool(np.asarray(jax.jit(jnp.array_equal)(y, jax.device_put(
            jnp.asarray(x)))))
        log(f"decode roundtrip ok: {ok}")
        # fetch-calibrated chained timing (tunnel-safe)
        t0 = time.perf_counter()
        for _ in range(4):
            _ = np.asarray(y[0, :1])
        fetch = (time.perf_counter() - t0) / 4
        chain = 4
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(chain):
                y = decode_e2e.decode_planar_device(
                    *dev, block_size=B, min_count=6)
            _ = np.asarray(y[0, :1])
            times.append((time.perf_counter() - t0 - fetch) / chain)
        dt = float(np.median(times))
        log(f"DECODE e2e: {dt * 1e3:.2f} ms = {n / dt / 1e9:.2f} GB/s "
            f"(output bytes), ok={ok}")

    if args.what in ("encode", "both"):
        xd = jax.device_put(jnp.asarray(x))
        ld = jax.device_put(jnp.asarray(lens))
        t0 = time.perf_counter()
        pb = device.encode_blocks(xd, ld, capacity=cap, min_count=6)
        _ = np.asarray(pb.n_cmds[:1])
        log(f"encode compile+run: {time.perf_counter() - t0:.1f}s")
        same = (np.asarray(pb.n_cmds) == n_cmds).all()
        log(f"encode matches host n_cmds: {same}")
        t0 = time.perf_counter()
        for _ in range(4):
            _ = np.asarray(pb.n_cmds[:1])
        fetch = (time.perf_counter() - t0) / 4
        chain = 2
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            for _ in range(chain):
                pb = device.encode_blocks(xd, ld, capacity=cap, min_count=6)
            _ = np.asarray(pb.n_cmds[:1])
            times.append((time.perf_counter() - t0 - fetch) / chain)
        dt = float(np.median(times))
        log(f"ENCODE device: {dt * 1e3:.2f} ms = {n / dt / 1e9:.2f} GB/s")


if __name__ == "__main__":
    main()
