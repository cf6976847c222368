"""Block container + multi-chip distribution.

Generalizes the reference's `rle8m` subsection container
(rle8_low_entropy_cpu.c:126-250) and its OpenCL one-work-group-per-subsection
decoder (rle8_ocl.c) into: fixed-size uncompressed blocks, a per-block size
table, shard_map over a jax Mesh, and ordered variable-length reassembly via
size all-gather + exclusive prefix sums.
"""
