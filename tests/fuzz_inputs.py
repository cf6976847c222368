"""Structured fuzz-input generator.

Mirrors the reference fuzzer's design (rle_fuzz.c:319-438): inputs are
concatenations of sections that are either random bytes or a repeated symbol
(1..16 bytes long, optionally misaligned repetition), with section lengths
swept across every codec's header-format boundary values: around 1..280
(u8/7-bit count escapes), 768..8192, and the u16 boundary 65528..65560
(rle_fuzz.c:30-44).
"""

from __future__ import annotations

import numpy as np

BOUNDARY_LENGTHS = (
    list(range(1, 64))
    + list(range(120, 136))
    + list(range(250, 282))
    + [511, 512, 513, 767, 768, 769, 1023, 1024, 4095, 4096, 8191, 8192]
    + list(range(65528, 65561))
)


def make_input(rng: np.ndarray | np.random.Generator, n_sections: int = 6,
               max_symbol_len: int = 16) -> bytes:
    """One fuzz input: random-byte and repeated-symbol sections interleaved."""
    if not isinstance(rng, np.random.Generator):
        rng = np.random.default_rng(rng)
    parts = []
    for _ in range(n_sections):
        length = int(rng.choice(BOUNDARY_LENGTHS))
        if rng.random() < 0.5:
            parts.append(rng.integers(0, 256, size=length, dtype=np.uint8))
        else:
            sym_len = int(rng.integers(1, max_symbol_len + 1))
            sym = rng.integers(0, 256, size=sym_len, dtype=np.uint8)
            reps = length // sym_len + 2
            run = np.tile(sym, reps)[:length]
            parts.append(run)
    return np.concatenate(parts).tobytes()


def corpus(seed: int = 0x5EED, count: int = 40, **kw) -> list[bytes]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(count):
        out.append(make_input(rng, **kw))
    # fixed adversarial extras: tiny inputs, all-same, all-distinct
    out += [
        b"\x00", b"\xFF", b"ab", b"\x00" * 7, b"\x00" * 300,
        bytes(range(256)), b"\x41" * 70000,
        (b"\x00" * 6 + b"\x01") * 500,       # runs exactly at min threshold
        (b"\x00" * 5 + b"\x01") * 500,       # runs just below
        bytes(np.random.default_rng(7).integers(0, 2, 4096, dtype=np.uint8)),
    ]
    return out
