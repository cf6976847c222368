"""Access to the reference C library as a golden-vector oracle.

The reference sources (read-only at /root/reference) are compiled OUT OF TREE
into /tmp/hsrk_ref_oracle; no reference code enters this repository.  When the
reference tree is unavailable, parity tests fall back to the pre-generated
golden vectors committed under tests/goldens/.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import tempfile

REF_SRC = pathlib.Path("/root/reference/src")
BUILD_DIR = pathlib.Path("/tmp/hsrk_ref_oracle")
GOLDGEN = BUILD_DIR / "goldgen"

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


def available() -> bool:
    return REF_SRC.is_dir() or GOLDGEN.exists()


def _ensure_built() -> bool:
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
    assert _ensure_built(), "reference oracle unavailable"
    return _run([str(codec_index)], data, None)


def ref_decompress(codec_index: int, data: bytes, uncompressed_size: int) -> bytes:
    assert _ensure_built(), "reference oracle unavailable"
    return _run(["-d", str(codec_index)], data, uncompressed_size)
