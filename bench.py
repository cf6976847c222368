#!/usr/bin/env python3
"""Benchmark harness: one JSON line on stdout with the headline metric.

Headline: 8-bit RLE decode throughput, HRT1 payload sections (HBM) ->
decoded bytes (HBM), on one chip, in one jit: on-device bit-unpack of the
command columns (ops/unpack_device.py) + event decode (ops/decode_sup.py).
The device reads O(compressed) input only, so compression ratio buys real
HBM bandwidth, like the reference decoder that touches only compressed
bytes (rle8_extreme_cpu.h:1825-1913) and its OpenCL path that uploads the
payload only (rle8_ocl.c:335-348).
Baseline: the reference's published single-thread x86 number on
video_frame.raw (25,830.4 MiB/s decode, README.md:28 => 27.086 GB/s).

Also reported in the same JSON object (and as stderr lines):
  encode_kernel_gbps   device bytes (HBM) -> planar commands (Pallas encode)
  host_unpack_gbps     blob -> planar columns (C++ threaded unpack)
  host_pack_gbps       blob -> padded payload sections (memcpy-only slicing)
  h2d_payload_gbps     device_put of the payload sections (O(compressed))
  decode_columns_gbps  pre-unpacked planar columns (HBM) -> bytes (HBM)
  decode_e2e_gbps      blob on host -> decoded bytes in HBM (pack+H2D+device)
  encode_host_gbps     C++ AVX2 host encoder (bytes -> planar)
  ratio                HRT1 compressed ratio on the synthetic dataset

The dataset is synthesized to match the reference dataset's statistics
(quantized video-frame DCTs); the real file is not redistributable.

Timing notes: this environment reaches its TPU through a tunnel whose
`block_until_ready` does not reliably block and whose device-to-host path
can wedge; every timed sample therefore chains dispatches and forces
completion by fetching a 1-element slice, the fetch overhead is calibrated
out, and the device phase runs in a fresh subprocess under a watchdog.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hsrk_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")

BASELINE_DECODE_GBPS = 27.086   # 25830.4 MiB/s, README.md:28
BASELINE_ENCODE_GBPS = 3.481    # 3319.6 MiB/s, README.md:28


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_dataset(mib: int, seed: int = 42) -> np.ndarray:
    """DCT-like 64-byte blocks: a short nonzero coefficient prefix, zeros
    after; a few dense "detail" blocks.  Calibrated so the 8-bit reference
    codec lands at ~19.3% -- the ratio it achieves on the real file."""
    n = mib << 20
    rng = np.random.default_rng(seed)
    nblk = n // 64
    k = np.minimum(rng.geometric(1.0 / 7.0, nblk), 40)
    dense = rng.random(nblk) < 0.055
    k = np.where(dense, rng.integers(40, 64, nblk), k)
    vals = rng.integers(-9, 10, (nblk, 64)).astype(np.int8).astype(np.uint8)
    mask = np.arange(64)[None, :] < k[:, None]
    return np.where(mask, vals, 0).astype(np.uint8).reshape(-1)


def make_bwt_dataset(mib: int, seed: int = 7) -> np.ndarray:
    """enwik-bwt-like row: BWT output is bursty — Zipf-length runs of
    skewed symbols broken by literal stretches.  Calibrated so the 8-bit
    codec lands near the reference's 48.8% on enwik9.bwt (README.md:115)."""
    n = mib << 20
    rng = np.random.default_rng(seed)
    m = n // 4
    lens = np.minimum(rng.zipf(1.7, m), 1000).astype(np.int64)
    lit = rng.random(m) < 0.65
    lens = np.where(lit, np.minimum(lens, 80), lens)
    syms = rng.integers(0, 256, m).astype(np.uint8)
    out = np.repeat(syms, lens)[:n]
    litmask = np.repeat(lit, lens)[:n]
    noise = rng.integers(0, 256, n, dtype=np.uint8)
    return np.where(litmask, noise, out).astype(np.uint8)


def make_sh_dataset(mib: int, seed: int = 21) -> np.ndarray:
    """Recency-regime row: long zero runs + literals drawn from a rolling
    3-symbol recency process -- the regime where the reference's SH coder
    posts its best real-file ratio (12.51% vs 19.34% base, README.md:59,
    rle_sh.c:98-267).  HRT1's per-block literal dictionary wins when the
    literal distribution is skewed per block but cannot follow a rolling
    recency chain; this row prices that concession."""
    n = mib << 20
    rng = np.random.default_rng(seed)
    out = np.zeros(n, np.uint8)
    pos = 0
    recent = [1, 2, 3]
    while pos < n:
        pos += int(rng.geometric(1 / 24.0))
        lit = min(int(rng.geometric(1 / 6.0)), 40)
        for i in range(lit):
            if pos + i >= n:
                break
            r = rng.random()
            if r < 0.55:
                v = recent[0]
            elif r < 0.75:
                v = recent[1]
            elif r < 0.85:
                v = recent[2]
            else:
                v = int(rng.integers(1, 256))
            if v != recent[0]:
                recent = [v, recent[0], recent[1]]
            out[pos + i] = v
        pos += lit
    return out


def make_random_dataset(mib: int, seed: int = 9) -> np.ndarray:
    """Incompressible control row (the memcpy-adjacent worst case)."""
    return np.random.default_rng(seed).integers(
        0, 256, mib << 20, dtype=np.uint8)


def emit(value_gbps: float, extra: dict | None = None, note: str = ""):
    if note:
        log(f"NOTE: {note}")
    out = {
        "metric": "rle8_device_decode_compressed_input",
        "value": round(value_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(value_gbps / BASELINE_DECODE_GBPS, 4),
    }
    for k, v in (extra or {}).items():
        out[k] = round(v, 4) if isinstance(v, float) else v
    print(json.dumps(out))


def host_fallback_gbps(data: np.ndarray, block: int = 1 << 16) -> float:
    """Native C++ threaded block decoder throughput (planar commands ->
    bytes, csrc decode_planar_batch) -- the host runtime's decode path."""
    from hypersonic_rle_kit_tpu.ops import planar
    from hypersonic_rle_kit_tpu.utils import native
    if native.lib() is None:
        return 0.0
    nb = data.size // block
    x = data[: nb * block].reshape(nb, block)
    lens = np.full(nb, block, np.int32)
    cols = native.planar_from_bytes(x, lens, planar.capacity_for(block, 6))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = native.decode_planar(cols[0], cols[1], cols[2], cols[3],
                                   cols[4], lens)
        best = max(best, x.size / (time.perf_counter() - t0) / 1e9)
    assert (out == x).all()
    return best


def _timed_chain(dispatch, sync, iters, chain, fetch=None):
    """Paired-chain differencing: the tunnel's fetch/sync overhead varies
    too much (25-260 ms observed) to calibrate out as a constant; timing a
    short and a long dispatch chain back-to-back cancels it exactly.
    When the op is faster than the noise floor (sub-ms medians can even
    come out negative), the chain is lengthened and remeasured."""
    def run(ch):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            for _ in range(2):
                r = dispatch()
            sync(r)
            t1 = time.perf_counter()
            for _ in range(ch + 2):
                r = dispatch()
            sync(r)
            t2 = time.perf_counter()
            times.append(((t2 - t1) - (t1 - t0)) / ch)
        return float(np.median(times))

    t = run(chain)
    if t < 1e-3:
        t = run(chain * 10)
    return max(t, 1e-6)


def device_bench(data: np.ndarray, block: int, iters: int, results: dict):
    import jax
    import jax.numpy as jnp
    from hypersonic_rle_kit_tpu import api
    from hypersonic_rle_kit_tpu.ops import decode_sup, encode_sup, planar
    from hypersonic_rle_kit_tpu.parallel import container
    from hypersonic_rle_kit_tpu.utils import native

    n = data.size
    nb = n // block
    x = data[: nb * block].reshape(nb, block)
    n = nb * block
    lens = np.full(nb, block, np.int32)
    cap = planar.capacity_for(block, 6)
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- host encode (C++) + container, measured ---
    t0 = time.perf_counter()
    cols = native.planar_from_bytes(x, lens, cap)
    enc_host = n / (time.perf_counter() - t0) / 1e9
    results["encode_host_gbps"] = enc_host
    log(f"host planar encode (C++): {enc_host:.2f} GB/s")
    blob = container.serialize_blocks(0, n, block, 6, *cols)
    results["ratio"] = len(blob) / n
    log(f"HRT1 ratio: {100 * results['ratio']:.2f}% "
        f"(reference 8-bit on the real video_frame.raw: 19.34%)")

    # --- host unpack (C++), measured: blob -> planar columns ---
    t0 = time.perf_counter()
    info, pcols = container.deserialize_to_planar(blob)
    unpack = n / (time.perf_counter() - t0) / 1e9
    results["host_unpack_gbps"] = unpack
    log(f"host container unpack (C++): {unpack:.2f} GB/s")
    sym, count, lit_len, lits, n_cmds, n_lits, block_len = pcols

    # --- host section pack (memcpy-only), measured: blob -> sections ---
    from hypersonic_rle_kit_tpu.ops import unpack_device
    t0 = time.perf_counter()
    pk = container.pack_for_device(blob)
    pack_t = time.perf_counter() - t0
    results["host_pack_gbps"] = n / pack_t / 1e9
    payload_bytes = sum(pk[k].nbytes for k in unpack_device.SECTION_KEYS
                        if k in pk and isinstance(pk[k], np.ndarray))
    log(f"host section pack (memcpy only): {results['host_pack_gbps']:.2f} "
        f"GB/s of decoded size ({payload_bytes >> 20} MiB shipped)")

    # --- H2D, measured on the O(compressed) payload sections: two
    # concatenated buffers + on-device slicing (unpack_device.ship_packed)
    t0 = time.perf_counter()
    dpk = unpack_device.ship_packed(pk)
    _ = np.asarray(dpk["lits"][:1, :1])
    h2d_t = time.perf_counter() - t0
    results["h2d_gbps"] = n / h2d_t / 1e9
    results["h2d_payload_gbps"] = payload_bytes / h2d_t / 1e9
    log(f"H2D (payload sections, {payload_bytes >> 20} MiB, one buffer "
        f"per dtype): {results['h2d_payload_gbps']:.2f} GB/s of payload = "
        f"{results['h2d_gbps']:.2f} GB/s of decoded size")

    # --- headline: payload sections (HBM) -> bytes (HBM), one jit
    #     (on-device bit-unpack + event decode, O(compressed) input) ---
    def dec():
        # words out: the byte view of the int32 output is free on the host
        return unpack_device.dispatch_packed(pk, dpk, out_words=True)

    t0 = time.perf_counter()
    out = dec()
    _ = np.asarray(out[0, :1])
    log(f"decode kernel compile+first run: {time.perf_counter() - t0:.1f}s")
    xw = np.ascontiguousarray(x).view(np.int32)
    xd = jax.device_put(jnp.asarray(xw))
    ok = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(out, xd)))
    log(f"device decode roundtrip: {ok}")
    results["ok"] = ok

    t0 = time.perf_counter()
    for _ in range(4):
        _ = np.asarray(out[0, :1])
    fetch = (time.perf_counter() - t0) / 4
    log(f"fetch overhead: {fetch * 1e3:.2f} ms")

    chain = 8
    dec_t = _timed_chain(dec, lambda r: np.asarray(r[0, :1]), iters, chain,
                         fetch)
    results["gbps"] = n / dec_t / 1e9
    log(f"decode (payload HBM -> bytes HBM, incl device unpack): "
        f"{dec_t * 1e3:.2f} ms = {results['gbps']:.2f} GB/s  "
        f"(reference x86: {BASELINE_DECODE_GBPS} GB/s)")

    # --- flat-layout headline pair: price depth vs speed (VERDICT r4 #6)
    try:
        blob_f = container.serialize_blocks(0, n, block, 6, *cols,
                                            deep=False)
        results["ratio_flat"] = len(blob_f) / n
        pkf = container.pack_for_device(blob_f)
        dpkf = unpack_device.ship_packed(pkf)

        def dec_f():
            return unpack_device.dispatch_packed(pkf, dpkf, out_words=True)
        outf = dec_f()
        okf = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(outf,
                                                                    xd)))
        tf = _timed_chain(dec_f, lambda r: np.asarray(r[0, :1]),
                          max(3, iters // 2), chain, fetch)
        results["decode_flat_gbps"] = n / tf / 1e9 if okf else 0.0
        log(f"decode flat layout: {results['decode_flat_gbps']:.2f} GB/s "
            f"(ratio {100 * results['ratio_flat']:.2f}%) roundtrip={okf}; "
            f"deep layout pays its resolver on the headline row")
    except Exception as exc:
        log(f"flat headline pair failed: {exc!r}")

    used = int(n_cmds.max())
    cap_used = max(128, -(-used // 128) * 128)
    dev_cols_for_stages = [jax.device_put(jnp.asarray(v)) for v in
                           (sym[:, :cap_used], count[:, :cap_used],
                            lit_len[:, :cap_used],
                            decode_sup.lits_to_words(lits), n_cmds, n_lits,
                            block_len)]

    # --- kernel stage-time table (decode_sup stage knob: 0=prep/IO,
    #     1=+route+paint, 2=+carries, 3=full), VERDICT r3 #1 ---
    try:
        stage_ms = {}
        for st in (0, 1, 2, 3):
            def dec_st(st=st):
                return decode_sup.decode_columns_device(
                    *dev_cols_for_stages, block_size=block, stage=st,
                    out_words=True)
            r = dec_st()
            _ = np.asarray(r[0, :1])
            t = _timed_chain(dec_st, lambda r: np.asarray(r[0, :1]), 3, 6)
            stage_ms[st] = t * 1e3
        results["stage_ms"] = [round(stage_ms[i], 2) for i in range(4)]
        log("decode stage table (ms): prep/IO %.2f, +route/paint %.2f, "
            "+carries %.2f, full %.2f" % tuple(stage_ms[i] for i in range(4)))
    except Exception as exc:
        log(f"stage table failed: {exc!r}")

    # --- secondary: pre-unpacked columns (HBM) -> bytes (HBM) ---
    dev = dev_cols_for_stages

    def dec_cols():
        return decode_sup.decode_columns_device(*dev, block_size=block,
                                                out_words=True)
    outc = dec_cols()
    okc = bool(np.asarray(jax.jit(lambda a, b: jnp.all(a == b))(outc, xd)))
    col_t = _timed_chain(dec_cols, lambda r: np.asarray(r[0, :1]),
                         max(3, iters // 2), chain, fetch)
    results["decode_columns_gbps"] = n / col_t / 1e9 if okc else 0.0
    log(f"decode (planar columns HBM -> bytes HBM): "
        f"{results['decode_columns_gbps']:.2f} GB/s roundtrip={okc}")

    # --- e2e: blob on host -> bytes in HBM (pack + H2D + device decode) ---
    t0 = time.perf_counter()
    pk2 = container.pack_for_device(blob)
    dpk2 = unpack_device.ship_packed(pk2)
    out2 = unpack_device.dispatch_packed(pk2, dpk2, out_words=True)
    _ = np.asarray(out2[0, :1])
    e2e = n / (time.perf_counter() - t0 - fetch) / 1e9
    results["decode_e2e_gbps"] = e2e
    log(f"decode e2e (blob -> HBM bytes incl. pack+H2D+unpack): "
        f"{e2e:.2f} GB/s")

    # --- encode kernel: bytes (HBM) -> planar commands ---
    # encode prefers smaller blocks than decode (its log-shift compaction
    # network is log(B) deep: 16 KiB measured 3.31 GB/s vs 64 KiB 3.11)
    eb = 1 << 14
    try:
        nbe = n // eb
        xe = data[: nbe * eb].reshape(nbe, eb)
        lens_e = np.full(nbe, eb, np.int32)
        cap_e = planar.capacity_for(eb, 6)
        cols_e = native.planar_from_bytes(xe, lens_e, cap_e)
        xed = jax.device_put(jnp.asarray(xe))

        def enc():
            return encode_sup.encode_blocks_kernel(
                xed, jnp.asarray(lens_e), capacity=cap_e, min_count=6)

        t0 = time.perf_counter()
        e = enc()
        _ = np.asarray(e[0][:1, :1])
        log(f"encode kernel compile+first run: {time.perf_counter()-t0:.1f}s")
        eok = all(np.array_equal(np.asarray(e[i]), cols_e[i])
                  for i in (0, 1, 2, 4, 5))
        log(f"device encode matches host encoder: {eok}")
        enc_t = _timed_chain(enc, lambda r: np.asarray(r[0][:1, :1]), iters,
                             4, fetch)
        results["encode_kernel_gbps"] = nbe * eb / enc_t / 1e9 if eok else 0.0
        log(f"encode (bytes HBM -> commands, {eb >> 10} KiB blocks): "
            f"{enc_t * 1e3:.2f} ms = "
            f"{results['encode_kernel_gbps']:.2f} GB/s  (reference x86: "
            f"{BASELINE_ENCODE_GBPS} GB/s)")
    except Exception as exc:  # encode metric is reported, never fatal
        log(f"encode kernel phase failed: {exc!r}")
        results["encode_kernel_gbps"] = 0.0

    # --- secondary dataset rows: incompressible + enwik-bwt-like ---------
    # (the reference's README tables cover multiple datasets; these two pin
    # the worst case and the ~49%-ratio text case, README.md:63,115)
    for tag, maker in (("random", make_random_dataset),
                       ("bwt", make_bwt_dataset),
                       ("sh", make_sh_dataset)):
        try:
            dd = maker(min(16, max(1, n >> 20)))
            nb2 = dd.size // block
            x2 = dd[: nb2 * block].reshape(nb2, block)
            l2 = np.full(nb2, block, np.int32)
            c2 = native.planar_from_bytes(x2, l2, cap)
            blob2 = container.serialize_blocks(0, nb2 * block, block, 6, *c2)
            results[f"ratio_{tag}"] = len(blob2) / (nb2 * block)
            _, pc = container.deserialize_to_planar(blob2)
            used2 = int(pc[4].max())
            cu2 = max(128, -(-used2 // 128) * 128)
            d3 = [jax.device_put(jnp.asarray(v)) for v in
                  (pc[0][:, :cu2], pc[1][:, :cu2], pc[2][:, :cu2],
                   decode_sup.lits_to_words(pc[3]), pc[4], pc[5], pc[6])]

            def dec2(d3=d3):
                return decode_sup.decode_columns_device(*d3,
                                                        block_size=block,
                                                        out_words=True)
            out2b = dec2()
            x2w = np.ascontiguousarray(x2).view(np.int32)
            ok2 = bool(np.asarray(jax.jit(
                lambda a, b: jnp.all(a == b))(out2b,
                                              jax.device_put(jnp.asarray(x2w)))))
            t2 = _timed_chain(dec2, lambda r: np.asarray(r[0, :1]),
                              max(3, iters // 2), 4, fetch)
            results[f"decode_{tag}_gbps"] = (nb2 * block) / t2 / 1e9 if ok2 \
                else 0.0
            log(f"[{tag}] ratio {100*results[f'ratio_{tag}']:.1f}%  decode "
                f"{results[f'decode_{tag}_gbps']:.2f} GB/s roundtrip={ok2}")
        except Exception as exc:
            log(f"secondary dataset {tag} failed: {exc!r}")

    # --- wide-codec row: 64-bit packed, decode + on-device re-interleave
    # (reference: 26.4 GB/s x86 on 48/64-bit Packed (Byte), README.md:49) ---
    try:
        wname = "64 Bit Packed (Byte)"
        wblob = api.compress(data[: n], wname)   # auto backend (native)
        results["ratio_w64"] = len(wblob) / n
        t2 = None
        pkw = container.pack_for_device(wblob)
        if pkw is not None:
            from hypersonic_rle_kit_tpu import api as api_mod
            info_w = pkw["info"]
            Bw = info_w.block_size
            nbw = info_w.n_blocks
            tlen = pkw["block_len"]
            dw = unpack_device.ship_packed(pkw)

            def dec_w():
                # words out + word-domain re-interleave: no byte bitcast,
                # no per-call retrace (the r4 row rebuilt a jit per call)
                yd = unpack_device.dispatch_packed(pkw, dw, out_words=True)
                return decode_sup.interleave_words(yd, w=8)
            yw = dec_w()
            okw = (decode_sup.words_to_bytes(np.asarray(yw))
                   .reshape(-1)[: n].tobytes() == data[: n].tobytes())
            t2 = _timed_chain(dec_w, lambda r: np.asarray(r[0, :1]),
                              max(3, iters // 2), 4, fetch)
            results["decode_w64_gbps"] = n / t2 / 1e9 if okw else 0.0
            log(f"[{wname}] ratio {100 * results['ratio_w64']:.1f}%  device "
                f"decode+interleave {results['decode_w64_gbps']:.2f} GB/s "
                f"roundtrip={okw}")
    except Exception as exc:
        log(f"wide codec row failed: {exc!r}")

    # --- reference-stream ingest row: C-format blob -> planar columns via
    # the native grammar walker (rleX_extreme_cpu_decode.h:27-164) ---
    try:
        from hypersonic_rle_kit_tpu.formats import rle8 as rle8_fmt
        from hypersonic_rle_kit_tpu.ops import ref_device
        rblob = rle8_fmt.rle8_compress(data[: min(n, 32 << 20)].tobytes())
        rn = min(n, 32 << 20)
        t0 = time.perf_counter()
        res = native.ref_parse_planar(rblob, 0, 8, 0, 0, rn, 1 << 16)
        tparse = time.perf_counter() - t0
        if res is not None:
            results["ref_ingest_gbps"] = rn / tparse / 1e9
            out_r = ref_device.decompress_ref_device(rblob, "8 Bit")
            okr = out_r == data[: rn].tobytes()
            log(f"[ref-stream] native walk {results['ref_ingest_gbps']:.2f} "
                f"GB/s of decoded size; device decode roundtrip={okr}")
            if not okr:
                results["ref_ingest_gbps"] = 0.0
    except Exception as exc:
        log(f"ref ingest row failed: {exc!r}")

    results["done"] = True


def run_device_phase(data: np.ndarray, args) -> dict:
    """One device-phase attempt inside this process, under a watchdog
    thread (the tunnel can wedge inside a fetch, which is not
    interruptible)."""
    results: dict = {"done": False, "ok": False, "gbps": 0.0}
    t = threading.Thread(target=device_bench,
                         args=(data, args.block, args.iters, results),
                         daemon=True)
    t.start()
    t.join(args.timeout)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mib", type=int, default=64)
    ap.add_argument("--block", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--attempts", type=int, default=2,
                    help="device-phase attempts (fresh subprocess each)")
    ap.add_argument("--timeout", type=float, default=420.0,
                    help="per-attempt device-phase watchdog (s)")
    ap.add_argument("--device-phase", metavar="OUT_JSON",
                    help="internal: run one device attempt, dump results")
    args = ap.parse_args()
    if args.quick:
        args.mib, args.iters, args.timeout = 8, 3, 240.0

    data = make_dataset(args.mib)
    from hypersonic_rle_kit_tpu.utils import native
    native.lib()          # build the native runtime outside the timed region

    if args.device_phase:
        results = run_device_phase(data, args)
        with open(args.device_phase, "w") as f:
            json.dump(results, f)
        os._exit(0)       # worker thread may be stuck in a device fetch

    # The TPU tunnel in this environment wedges transiently; each attempt
    # runs in a fresh subprocess so a dead JAX runtime can't poison retries.
    import subprocess
    import tempfile
    results = {"done": False, "ok": False, "gbps": 0.0}
    for attempt in range(args.attempts):
        with tempfile.NamedTemporaryFile(suffix=".json") as tf:
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--device-phase", tf.name,
                   "--mib", str(args.mib), "--block", str(args.block),
                   "--iters", str(args.iters),
                   "--timeout", str(args.timeout)]
            try:
                subprocess.run(cmd, timeout=args.timeout + 120)
                got = json.load(open(tf.name))
            except Exception as e:
                log(f"device attempt {attempt + 1} failed: {e!r}")
                got = None
        if got:
            results = got
            if results.get("done") and results.get("ok"):
                break
        log(f"device attempt {attempt + 1}/{args.attempts}: "
            f"done={results.get('done')} ok={results.get('ok')}")

    extra_keys = ("encode_kernel_gbps", "host_unpack_gbps", "h2d_gbps",
                  "h2d_payload_gbps", "host_pack_gbps",
                  "decode_columns_gbps", "decode_e2e_gbps",
                  "encode_host_gbps", "ratio",
                  "ratio_flat", "decode_flat_gbps",
                  "ratio_random", "decode_random_gbps",
                  "ratio_bwt", "decode_bwt_gbps",
                  "ratio_sh", "decode_sh_gbps",
                  "ratio_w64", "decode_w64_gbps", "ref_ingest_gbps",
                  "stage_ms")
    if results.get("done") and results.get("ok"):
        emit(results["gbps"],
             {k: results[k] for k in extra_keys if k in results})
        return
    note = ("device phase unavailable (TPU tunnel unreachable); reporting "
            "the native threaded host block decoder instead"
            if not results.get("done")
            else "device roundtrip FAILED; reporting 0")
    gbps = host_fallback_gbps(data[: 32 << 20]) if not results.get("done") \
        else 0.0
    emit(gbps, {"fallback": "host"}, note)


if __name__ == "__main__":
    main()
