"""Per-family compression-depth gates (VERDICT r3 task #3).

HRT1's deep layout (two-tier escape columns + block symbol dictionary,
parallel/container.py) must compress at least as well as the reference
format of each major family on the bench corpus.  r3 measured HRT1 losing
exactly where the reference's clever formats live (Packed 18.84% vs
17.63%, Low Entropy 18.85% vs 18.19%); these gates pin the fix.

Reference ratios come from our byte-exact format encoders (parity-tested
against the C library in test_*_format.py), so the comparison is honest
on any corpus.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hypersonic_rle_kit_tpu import api
from hypersonic_rle_kit_tpu.formats import registry

import bench

FAMILIES = ["8 Bit", "8 Bit Packed", "8 Bit 3LUT", "8 Bit 3LUT Short",
            "Low Entropy"]


def _corpus():
    return {
        "dct": bench.make_dataset(2).tobytes(),
        "bwt": bench.make_bwt_dataset(2).tobytes(),
        "random": bench.make_random_dataset(1).tobytes(),
    }


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.mark.parametrize("name", FAMILIES)
@pytest.mark.parametrize("tag", ["dct", "bwt", "random"])
def test_hrt1_ratio_beats_reference_family(corpus, name, tag):
    payload = corpus[tag]
    hrt1 = len(api.compress(payload, name))
    ref = len(registry.compress(payload, name))
    # on incompressible data both formats pass bytes through; HRT1 pays a
    # 16-byte table entry per block where the reference pays one flat
    # header, so allow 0.05% there -- everywhere the families' techniques
    # actually bite, HRT1 must win outright
    slack = max(64, int(0.0005 * len(payload))) if tag == "random" else 0
    assert hrt1 <= ref + slack, (
        f"HRT1[{name}] on {tag}: {hrt1} bytes > reference format {ref}")


def test_deep_roundtrips_all_backends(corpus):
    payload = corpus["dct"]
    blob = api.compress(payload, "8 Bit")
    from hypersonic_rle_kit_tpu.parallel import container
    assert container.parse(blob)[0].deep
    for backend in ("device", "host", "kernel"):
        assert api.decompress(blob, backend=backend) == payload


def test_incompressible_keeps_flat_layout(corpus):
    blob = api.compress(corpus["random"], "8 Bit")
    from hypersonic_rle_kit_tpu.parallel import container
    info = container.parse(blob)[0]
    assert not info.deep          # deep="auto" picks the smaller container
    assert api.decompress(blob) == corpus["random"]
