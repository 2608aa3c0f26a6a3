"""Pallas TPU kernel: fused brute-force nearest-hit sweep (Woop planes).

The TPU-native analogue of the reference's 8-wide AVX packet intersector
(/root/reference/orion/avx/geometry.hpp:86-142): where the reference packs
8 triangles into AVX lanes against one ray, this kernel evaluates a
[TC, RB] register plane — TC triangles on sublanes x RB rays on lanes —
per chunk, sweeping all chunks with an improve-only (t, id) state held
on-chip, so the O(rays x triangles) intermediate planes never touch HBM
(the jnp fallback in ops/intersect.py materializes them ~25x per call).
The per-pair test is the shared Woop unit-triangle transform
(ops/woop.py — measured 3.5x the Möller-Trumbore plane this replaced,
same predicate semantics).

Memory design (chosen against Mosaic's layout rules after measuring the
alternatives on hardware — see git history for the DMA-streamed and
transposed variants this replaced):
  - rays arrive as ONE [8, N] component-row array (ox oy oz dx dy dz 0 0);
    an [8, RB] block yields [1, RB] components as *static* row slices;
  - triangle data is ONE [T_pad, 16] row-per-triangle array (the 13
    Woop transform floats in cols 0..12) resident in VMEM; chunks are
    *static* row ranges (the chunk loop unrolls in Python), components
    are *static* column slices -> [TC, 1]. Sublane granularity means a
    36-triangle cornell box pads to TC=40, not 128. Residency costs
    512 B/triangle of padded VMEM — good to ~16k triangles; larger
    scenes belong to the BVH backend anyway;
  - zero transposes, zero dynamic slices; outputs are [1, N] lane-major.

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

from orion_tpu.ops.intersect import Hit
from orion_tpu.ops.woop import woop_rows, woop_t
from orion_tpu.scene import Scene

# max triangles per statically-unrolled chunk (sublane dim of the plane)
TRI_CHUNK = 512
# VMEM budget for the [TC, RB] compute plane (~25 live f32 temps)
PLANE_BUDGET = 96 * 1024
# resident ceiling for [T_pad, 16] (128-lane padded => 512 B/triangle)
RESIDENT_MAX_TRIS = 16 * 1024

_BIG = np.float32(3.0e38)


def ray_rows(r_ref):
    """[8,RB] ray block -> ([1,RB] o comps, [1,RB] d comps), static slices."""
    o = (r_ref[0:1, :], r_ref[1:2, :], r_ref[2:3, :])
    d = (r_ref[3:4, :], r_ref[4:5, :], r_ref[5:6, :])
    return o, d


def pack_ray_rows(orig, dirs, n_pad: int, alive=None):
    """[N,3]x2 -> [8, N_pad] component rows (row 6 = alive flag); padding
    lanes are dead and get dir=(1,1,1) so the math stays finite."""
    N = orig.shape[0]
    data = jnp.ones((8, n_pad), jnp.float32)
    data = data.at[0:3, :N].set(orig.T)
    data = data.at[3:6, :N].set(dirs.T)
    data = data.at[0:3, N:].set(0.0)
    data = data.at[6, N:].set(0.0)
    if alive is not None:
        data = data.at[6, :N].set(alive.astype(jnp.float32))
    return data


def tri_cols(block):
    """[TC,16] triangle rows -> 13 Woop comps as [TC,1] static slices."""
    return tuple(block[:, i:i + 1] for i in range(13))


def _brute_kernel(r_ref, tri_ref, t_out, id_out):
    """One grid step: RB rays (lanes) vs ALL triangle chunks (unrolled).

    Blocks whose lanes are all dead (row 6 of the ray block is the alive
    flag) skip the whole sweep via lax.cond — bounce wavefronts retire
    spatially-coherent regions, so later depths mostly hit this path."""
    T_pad = tri_ref.shape[0]
    tc = min(T_pad, TRI_CHUNK)
    n_chunks = T_pad // tc

    o, d = ray_rows(r_ref)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)

    t_init = jnp.full(t_out.shape, _BIG, jnp.float32)   # [1,RB]
    id_init = jnp.full(id_out.shape, -1, jnp.int32)

    def sweep(state):
        t_best, id_best = state
        for c in range(n_chunks):  # static unroll: all slices static
            w = tri_cols(tri_ref[c * tc:(c + 1) * tc, :])
            t = woop_t(o, d, w)                          # [TC,RB]

            t_min = jnp.min(t, axis=0, keepdims=True)    # [1,RB]
            # argmin-by-value: smallest row achieving t_min
            row = jnp.min(jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                          axis=0, keepdims=True)
            idx = row + c * tc

            better = t_min < t_best
            id_best = jnp.where(better & (t_min < _BIG), idx, id_best)
            t_best = jnp.where(better, t_min, t_best)
        return t_best, id_best

    any_alive = jnp.any(r_ref[6:7, :] > 0.0)
    t_best, id_best = jax.lax.cond(any_alive, sweep, lambda s: s,
                                   (t_init, id_init))

    alive = r_ref[6:7, :] > 0.0
    id_best = jnp.where(alive, id_best, -1)
    t_out[:, :] = jnp.where(id_best >= 0, t_best, jnp.inf)
    id_out[:, :] = id_best


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_tri_rows16(tri_v0, tri_e1, tri_e2, chunk: int):
    """[T,3]x3 -> [T_pad, 16] triangle rows (the 13 Woop transform
    floats in cols 0..12), padding rows always-miss."""
    T = tri_v0.shape[0]
    T_pad = _round_up(max(T, chunk), chunk)
    data = jnp.zeros((T_pad, 16), jnp.float32)
    data = data.at[:T, 0:13].set(woop_rows(tri_v0, tri_e1, tri_e2))
    # padding rows: all-zero M with c_w = 1 => d'_w = 0 => eps-miss
    data = data.at[T:, 11].set(1.0)
    return data


def auto_blocks(T: int):
    """(chunk_rows, ray_block): sublane-granular chunk, lane block sized to
    keep the [TC, RB] temps inside the VMEM plane budget."""
    tc = min(_round_up(max(T, 8), 8), TRI_CHUNK)
    rb = max(256, min(4096, _round_up(PLANE_BUDGET // tc, 128)))
    return tc, rb


@partial(jax.jit, static_argnames=("ray_block", "interpret"))
def _intersect_pallas_impl(tri_data, orig, dirs, alive=None, *,
                           ray_block: int, interpret: bool = False):
    N = orig.shape[0]
    N_pad = _round_up(max(N, ray_block), ray_block)

    rays = pack_ray_rows(orig, dirs, N_pad, alive)

    grid = (N_pad // ray_block,)
    ray_spec = pl.BlockSpec((8, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # resident all steps

    t, tri_id = pl.pallas_call(
        _brute_kernel,
        grid=grid,
        in_specs=[ray_spec, tri_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((1, N_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, N_pad), jnp.int32)),
        interpret=interpret,
    )(rays, tri_data)
    return t[0, :N], tri_id[0, :N]


def intersect_brute_pallas(scene: Scene, orig: jax.Array, dirs: jax.Array,
                           ray_block: int | None = None,
                           interpret: bool | None = None, *,
                           alive=None) -> Hit:
    """Drop-in Pallas replacement for intersect_brute (same Hit contract).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests).
    Scenes beyond RESIDENT_MAX_TRIS should use the BVH backend (the engine
    already routes anything >1k triangles there).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    T = scene.tri_v0.shape[0]
    if T > RESIDENT_MAX_TRIS and not interpret:
        raise ValueError(
            f"{T} triangles exceed the resident-VMEM brute sweep budget "
            f"({RESIDENT_MAX_TRIS}); use the BVH backend")
    tc, rb = auto_blocks(T)
    if ray_block is not None:
        rb = ray_block
    tri_data = pack_tri_rows16(jax.lax.stop_gradient(scene.tri_v0),
                               jax.lax.stop_gradient(scene.tri_e1),
                               jax.lax.stop_gradient(scene.tri_e2), tc)
    t, tri_id = _intersect_pallas_impl(
        tri_data,
        jax.lax.stop_gradient(orig),
        jax.lax.stop_gradient(dirs),
        alive,
        ray_block=rb, interpret=interpret)
    # ids beyond the true (unpadded) triangle count are padding => miss
    valid = tri_id < scene.num_triangles
    return Hit(t=jnp.where(valid, t, jnp.inf),
               tri_id=jnp.where(valid, tri_id, -1))
