"""Wavefront ray reordering: coherence keys + sort for packet traversal.

The TPU block-traversal kernels (ops/pallas_bvh.py and the megakernel
family) advance one node pointer per ray block, so a block's cost is the
UNION of its lanes' traversal paths. Primary rays arrive coherent
(scanline order); bounce and NEE rays do not — the round-2 record shows
an 8.9x coherent/incoherent gap (BENCHMARKS.md "Kernel-level"). The
TPU-idiomatic fix is to make the DATA coherent instead of making the
control flow finer: sort the wavefront between bounces so each block's
rays share a direction octant and a spatial cell, shrinking the union
back toward a single path.

This plays the role GPU wavefront tracers give to ray-stream compaction
and sorting passes; the reference (one recursive walk per CPU ray,
/root/reference/orion/avx/sbvh.cpp:36-83) never needs it because a
single ray IS perfectly coherent.

Key layout (uint32, compared as int32 — top bit stays 0):
  [dead flag (1)] [direction octant (3)] [origin morton (3*bits)]
Dead rays sort last, so alive-masked kernels see fully-dead tail blocks
and retire them in one while-step each.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 3*6 = 18 morton bits + 3 octant bits + dead flag = 22 bits < 31
MORTON_BITS = 6


def direction_octant(dirs: jax.Array) -> jax.Array:
    """3-bit direction octant per ray [N] (packet-coherence sort key)."""
    return ((dirs[:, 0] >= 0).astype(jnp.int32)
            + 2 * (dirs[:, 1] >= 0).astype(jnp.int32)
            + 4 * (dirs[:, 2] >= 0).astype(jnp.int32))


def _part_bits(x: jax.Array, bits: int) -> jax.Array:
    """Spread the low `bits` bits of x so consecutive bits land 3 apart."""
    out = jnp.zeros_like(x)
    for i in range(bits):
        out = out | (((x >> i) & 1) << (3 * i))
    return out


def morton3(q: jax.Array, bits: int = MORTON_BITS) -> jax.Array:
    """Interleave [N,3] int32 cell coords (each < 2**bits) into a morton
    code [N]. z gets the high bit of each triple (x fastest-varying)."""
    return (_part_bits(q[:, 0], bits)
            | (_part_bits(q[:, 1], bits) << 1)
            | (_part_bits(q[:, 2], bits) << 2))


def coherence_key(orig: jax.Array, dirs: jax.Array, alive: jax.Array,
                  lo: jax.Array, hi: jax.Array, *,
                  bits: int = MORTON_BITS) -> jax.Array:
    """[N] int32 sort key: dead-last, then octant, then origin morton.

    lo/hi: scene AABB corners [3] — origins are quantized inside it.
    """
    span = jnp.maximum(hi - lo, 1e-20)
    q = ((orig - lo) / span * (1 << bits)).astype(jnp.int32)
    q = jnp.clip(q, 0, (1 << bits) - 1)
    key = (direction_octant(dirs) << (3 * bits)) | morton3(q, bits)
    return jnp.where(alive, key, jnp.int32(1) << (3 * bits + 3))


def scene_bounds(scene) -> tuple[jax.Array, jax.Array]:
    """Tight AABB over the scene's valid triangles ([3] lo, [3] hi)."""
    v0, e1, e2 = scene.tri_v0, scene.tri_e1, scene.tri_e2
    v1, v2 = v0 + e1, v0 + e2
    valid = scene.tri_valid[:, None]
    big = jnp.float32(3e38)
    los = jnp.where(valid, jnp.minimum(jnp.minimum(v0, v1), v2), big)
    his = jnp.where(valid, jnp.maximum(jnp.maximum(v0, v1), v2), -big)
    return jnp.min(los, axis=0), jnp.max(his, axis=0)


def sort_permutation(key: jax.Array) -> jax.Array:
    """Stable ascending permutation of an int32 key vector."""
    return jnp.argsort(key, stable=True)
