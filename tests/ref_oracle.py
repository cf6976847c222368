"""Access to the reference C library as a golden-vector oracle.

The reference sources (read-only at /root/reference) are compiled OUT OF TREE
into /tmp/hsrk_ref_oracle; no reference code enters this repository.  Every
``ref_compress`` result is also persisted into a content-addressed cache
committed under tests/goldens/ (one pack file per codec, records keyed by the
sha256 of the input), so parity tests *execute* — not skip — on machines
where the reference tree is unavailable.  A cache miss without the reference
raises, which is the correct failure mode: silent skips would evaporate the
byte-exactness guarantee.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import struct
import subprocess
import tempfile
import zlib

REF_SRC = pathlib.Path("/root/reference/src")
BUILD_DIR = pathlib.Path("/tmp/hsrk_ref_oracle")
GOLDGEN = BUILD_DIR / "goldgen"
GOLDENS = pathlib.Path(__file__).resolve().parent / "goldens"

_MAIN_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include "rle.h"
#include "simd_platform.h"
#define IN
#define OUT
#include "codec_funcs.h"

int main(int argc, char **argv) {
  int dec = 0, argi = 1;
  if (argc > 1 && strcmp(argv[1], "-d") == 0) { dec = 1; argi = 2; }
  int codec = atoi(argv[argi]);
  FILE *f = fopen(argv[argi+1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END); long sz = ftell(f); fseek(f, 0, SEEK_SET);
  uint8_t *in = calloc(1, sz + 1024);
  if (fread(in, 1, sz, f) != (size_t)sz) return 2;
  fclose(f);
  uint32_t cap = dec ? (uint32_t)atoll(argv[argi+3]) + 1024
                     : rle_compress_bounds((uint32_t)sz) + 1024;
  uint8_t *out = calloc(1, cap);
  uint32_t r;
  if (dec) r = codecCallbacks[codec].decompress_func(in, (uint32_t)sz, out, cap);
  else     r = codecCallbacks[codec].compress_func(in, (uint32_t)sz, out, cap);
  if (r == 0) { fprintf(stderr, "codec %d failed\n", codec); return 3; }
  FILE *o = fopen(argv[argi+2], "wb");
  fwrite(out, 1, r, o); fclose(o);
  printf("%u\n", r);
  return 0;
}
"""

_SOURCES = [
    "rle8_extreme_cpu.c", "rleX_extreme_cpu.c", "rle24_extreme_cpu.c",
    "rle48_extreme_cpu.c", "rle128_extreme_cpu.c", "rleX_Xsl.c",
    "rleX_Xsl_short.c", "rle8_low_entropy_cpu.c", "rle8_low_entropy_short_cpu.c",
    "rle8_mmtf.c", "rle_sh.c", "mmtf.c", "bit_mmtf.c", "simd_platform.c",
]


def _goldens_present() -> bool:
    return GOLDENS.is_dir() and any(GOLDENS.glob("*.pack"))


def _forced_offline() -> bool:
    """HSRK_FORCE_GOLDENS=1 simulates a machine without /root/reference:
    only the committed golden cache may serve parity answers."""
    return bool(os.environ.get("HSRK_FORCE_GOLDENS"))


def available() -> bool:
    if _forced_offline():
        return _goldens_present()
    return REF_SRC.is_dir() or GOLDGEN.exists() or _goldens_present()


# ---------------------------------------------------------------------------
# committed golden-vector cache (tests/goldens/{codec:03d}.pack)
#
# Pack record: [16B sha256-prefix of input][u32 compressed-record length]
# [zlib(reference compressed output)], repeated.  Append-only; the suite
# populates it whenever the real oracle runs, so committing tests/goldens/
# after a green run pins the parity gates for reference-less machines.
# ---------------------------------------------------------------------------

_gold_cache: dict[int, dict[bytes, bytes]] = {}
_REC_HEAD = struct.Struct("<16sI")


def _pack_path(codec_index: int) -> pathlib.Path:
    return GOLDENS / f"{codec_index:03d}.pack"


def _load_pack(codec_index: int) -> dict[bytes, bytes]:
    got = _gold_cache.get(codec_index)
    if got is not None:
        return got
    recs: dict[bytes, bytes] = {}
    path = _pack_path(codec_index)
    if path.exists():
        raw = path.read_bytes()
        off = 0
        while off + _REC_HEAD.size <= len(raw):
            digest, zlen = _REC_HEAD.unpack_from(raw, off)
            off += _REC_HEAD.size
            if off + zlen > len(raw):      # truncated trailing record
                break
            recs[digest] = zlib.decompress(raw[off:off + zlen])
            off += zlen
    _gold_cache[codec_index] = recs
    return recs


def _gold_put(codec_index: int, digest: bytes, out: bytes) -> None:
    if os.environ.get("HSRK_NO_GOLDEN_WRITE"):
        return
    GOLDENS.mkdir(exist_ok=True)
    z = zlib.compress(out, 6)
    with open(_pack_path(codec_index), "ab") as f:
        f.write(_REC_HEAD.pack(digest, len(z)) + z)
    _load_pack(codec_index)[digest] = out


def _ensure_built() -> bool:
    if _forced_offline():
        return False
    if GOLDGEN.exists():
        return True
    if not REF_SRC.is_dir():
        return False
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    main_c = BUILD_DIR / "goldgen.c"
    main_c.write_text(_MAIN_C)
    cmd = [
        "gcc", "-O2", "-mavx2", "-mssse3", "-msse4.1",
        f"-I{REF_SRC}", "-o", str(GOLDGEN), str(main_c),
    ] + [str(REF_SRC / s) for s in _SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return GOLDGEN.exists()


def _run(args: list[str], payload: bytes, out_size_hint: int | None) -> bytes:
    with tempfile.TemporaryDirectory(dir="/tmp") as td:
        inf = os.path.join(td, "in.bin")
        outf = os.path.join(td, "out.bin")
        with open(inf, "wb") as f:
            f.write(payload)
        full = [str(GOLDGEN)] + args + [inf, outf]
        if out_size_hint is not None:
            full.append(str(out_size_hint))
        r = subprocess.run(full, capture_output=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"reference oracle failed ({r.returncode}): {r.stderr.decode()}")
        with open(outf, "rb") as f:
            return f.read()


def ref_compress(codec_index: int, data: bytes) -> bytes:
    digest = hashlib.sha256(data).digest()[:16]
    cached = _load_pack(codec_index).get(digest)
    if cached is not None:
        return cached
    if not _ensure_built():
        raise RuntimeError(
            f"reference oracle unavailable and no golden vector for codec "
            f"{codec_index} / input {digest.hex()} — regenerate tests/goldens/ "
            f"on a machine with /root/reference mounted")
    out = _run([str(codec_index)], data, None)
    _gold_put(codec_index, digest, out)
    return out


def ref_decompress(codec_index: int, data: bytes, uncompressed_size: int) -> bytes:
    assert _ensure_built(), "reference oracle unavailable"
    return _run(["-d", str(codec_index)], data, uncompressed_size)
