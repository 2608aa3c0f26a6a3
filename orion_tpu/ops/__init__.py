"""Compute ops: intersection (brute-force oracle, BVH, Pallas kernels) and shading."""
