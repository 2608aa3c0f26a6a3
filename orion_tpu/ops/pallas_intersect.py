"""Pallas TPU kernel: fused brute-force Möller-Trumbore nearest-hit sweep.

The TPU-native analogue of the reference's 8-wide AVX packet intersector
(/root/reference/orion/avx/geometry.hpp:86-142): where the reference packs
8 triangles into AVX lanes against one ray, this kernel evaluates an
[RB, TC] register plane — RB rays on sublanes x TC triangles on lanes —
per chunk, sweeping all chunks with an improve-only (t, id) state held in
registers, so the O(rays x triangles) intermediate planes never touch HBM
(the jnp fallback in ops/intersect.py materializes them ~25x per call).

Memory design (chosen against Mosaic's alignment rules — lane slices must
be 128-aligned and *statically provable*):
  - rays arrive as ONE [N, 8] row-per-ray array (ox oy oz dx dy dz 0 0);
    a [RB, 8] block yields [RB, 1] components as *static* column slices —
    no transposes, no strided XLA-level slices (a per-grid-step [3,RB]
    transpose variant measured 2x slower end-to-end);
  - triangle data is ONE [16, T_pad] array (component rows v0|e1|e2 in
    rows 0..8) resident in VMEM; the chunk loop is unrolled in Python so
    every chunk slice [:, c*TC:(c+1)*TC] is static. Residency costs
    64 B/triangle of VMEM — good to ~10^5 triangles, far beyond every
    bundled scene; larger scenes belong to the BVH backend anyway.
    (A DMA-streaming variant was measured 30x slower on the cornell box:
    per-grid-step DMA waits dominate when the sweep itself is ~1 chunk.)

Contract matches ops.intersect.mt_test: two-sided MT, eps=1e-6 on the
determinant, nearest non-negative t wins, padding triangles are degenerate
(e1 = e2 = 0 => det 0 => miss). Returns the same Hit(t, tri_id) record.

The kernel is intentionally forward-only (hit ids are discrete);
`hit_attributes` recomputes (t, u, v) differentiably at the fixed id.
Gradients through the wrapper are blocked with stop_gradient.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.ops.intersect import MT_EPS, Hit
from orion_tpu.scene import Scene

# triangles per statically-unrolled chunk (lane dimension of the plane)
TRI_CHUNK = 512
# rays per grid block (sublane dimension of the plane)
RAY_BLOCK = 256
# resident-VMEM ceiling: [16, T_pad] f32 = 64 B/tri; 8 MB ~ 128k triangles
RESIDENT_MAX_TRIS = 128 * 1024

_BIG = np.float32(3.0e38)


def mt_plane(o, d, v0, e1, e2):
    """Branchless MT on broadcast component planes -> masked t (_BIG=miss).

    Orientation-agnostic: pass o/d comps [RB,1] and tri comps [1,TC] for a
    [RB,TC] plane (brute sweep / BVH leaves), or the transpose for [TC,RB].
    """
    ox, oy, oz = o
    dx, dy, dz = d
    v0x, v0y, v0z = v0
    e1x, e1y, e1z = e1
    e2x, e2y, e2z = e2

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / det
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (jnp.abs(det) > MT_EPS) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0) & (t >= 0.0)
    return jnp.where(ok, t, _BIG)


def ray_comps(r_ref):
    """[RB,8] ray block -> ([RB,1] o comps, [RB,1] d comps), static slices."""
    o = (r_ref[:, 0:1], r_ref[:, 1:2], r_ref[:, 2:3])
    d = (r_ref[:, 3:4], r_ref[:, 4:5], r_ref[:, 5:6])
    return o, d


def pack_rays8(orig, dirs, n_pad: int):
    """[N,3]x2 -> [N_pad, 8] rows (ox oy oz dx dy dz 0 0); padding rows get
    dir=(1,1,1) so padded lanes do harmless work."""
    N = orig.shape[0]
    data = jnp.zeros((n_pad, 8), jnp.float32)
    data = data.at[:N, 0:3].set(orig)
    data = data.at[:N, 3:6].set(dirs)
    data = data.at[N:, 3:6].set(1.0)
    return data


def tri_comps_rows(block):
    """Split a [16, TC] block into ((v0),(e1),(e2)) [1,TC] comps."""
    v0 = (block[0:1, :], block[1:2, :], block[2:3, :])
    e1 = (block[3:4, :], block[4:5, :], block[5:6, :])
    e2 = (block[6:7, :], block[7:8, :], block[8:9, :])
    return v0, e1, e2


def _brute_kernel(r_ref, tri_ref, t_out, id_out):
    """One grid step: RAY_BLOCK rays vs ALL triangle chunks (unrolled)."""
    T_pad = tri_ref.shape[1]
    tc = min(T_pad, TRI_CHUNK)
    n_chunks = T_pad // tc
    rb = r_ref.shape[0]

    o, d = ray_comps(r_ref)

    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)

    t_best = jnp.full((rb, 1), _BIG, jnp.float32)
    id_best = jnp.full((rb, 1), -1, jnp.int32)

    for c in range(n_chunks):  # static unroll: all slices lane-aligned
        v0, e1, e2 = tri_comps_rows(tri_ref[:, c * tc:(c + 1) * tc])
        t = mt_plane(o, d, v0, e1, e2)                   # [RB,TC]

        t_min = jnp.min(t, axis=1, keepdims=True)        # [RB,1]
        # argmin-by-value: smallest column achieving t_min
        col = jnp.min(jnp.where(t == t_min, col_idx, jnp.int32(2**30)),
                      axis=1, keepdims=True)
        idx = col + c * tc

        better = t_min < t_best
        id_best = jnp.where(better & (t_min < _BIG), idx, id_best)
        t_best = jnp.where(better, t_min, t_best)

    t_out[:, :] = jnp.where(id_best >= 0, t_best, jnp.inf)
    id_out[:, :] = id_best


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_tri_rows(tri_v0, tri_e1, tri_e2, chunk: int):
    """[T,3]x3 -> [16, T_pad] component rows (v0|e1|e2 in rows 0..8),
    padding columns degenerate."""
    T = tri_v0.shape[0]
    T_pad = _round_up(max(T, chunk), chunk)
    data = jnp.zeros((16, T_pad), jnp.float32)
    data = data.at[0:3, :T].set(tri_v0.T)
    data = data.at[3:6, :T].set(tri_e1.T)
    data = data.at[6:9, :T].set(tri_e2.T)
    return data


@partial(jax.jit, static_argnames=("ray_block", "interpret"))
def _intersect_pallas_impl(tri_data, orig, dirs,
                           ray_block: int = RAY_BLOCK,
                           interpret: bool = False):
    N = orig.shape[0]
    N_pad = _round_up(max(N, ray_block), ray_block)

    rays8 = pack_rays8(orig, dirs, N_pad)

    grid = (N_pad // ray_block,)
    ray_spec = pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((ray_block, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # resident all steps

    t, tri_id = pl.pallas_call(
        _brute_kernel,
        grid=grid,
        in_specs=[ray_spec, tri_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((N_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N_pad, 1), jnp.int32)),
        interpret=interpret,
    )(rays8, tri_data)
    return t[:N, 0], tri_id[:N, 0]


def _auto_chunk(T: int) -> int:
    """Small scenes: one lane-tile chunk; large: TRI_CHUNK granularity."""
    return min(_round_up(max(T, 128), 128), TRI_CHUNK)


def intersect_brute_pallas(scene: Scene, orig: jax.Array, dirs: jax.Array,
                           ray_block: int = RAY_BLOCK,
                           interpret: bool | None = None) -> Hit:
    """Drop-in Pallas replacement for intersect_brute (same Hit contract).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    Scenes beyond RESIDENT_MAX_TRIS should use the BVH backend (the engine
    already routes anything >1k triangles there).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = scene.tri_v0.shape[0]
    if T > RESIDENT_MAX_TRIS:
        raise ValueError(
            f"{T} triangles exceed the resident-VMEM brute sweep budget "
            f"({RESIDENT_MAX_TRIS}); use the BVH backend")
    tc = _auto_chunk(T)
    tri_data = pack_tri_rows(jax.lax.stop_gradient(scene.tri_v0),
                             jax.lax.stop_gradient(scene.tri_e1),
                             jax.lax.stop_gradient(scene.tri_e2), tc)
    t, tri_id = _intersect_pallas_impl(
        tri_data,
        jax.lax.stop_gradient(orig),
        jax.lax.stop_gradient(dirs),
        ray_block=ray_block, interpret=interpret)
    # ids beyond the true (unpadded) triangle count are padding => miss
    valid = tri_id < scene.num_triangles
    return Hit(t=jnp.where(valid, t, jnp.inf),
               tri_id=jnp.where(valid, tri_id, -1))
