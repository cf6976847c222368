"""Device compute path: XLA/Pallas kernels for encode/decode.

The reference's SIMD kernel layer (rleX_extreme_common.h, bitpack.h) maps here:
hand-written x86 intrinsics become VPU-wide vector programs over 8x128 lanes,
and the scalar command loops become prefix-sum / segmented-scan formulations
that XLA can tile.
"""
