"""Pallas TPU kernel: fused brute-force Möller-Trumbore nearest-hit sweep.

The TPU-native analogue of the reference's 8-wide AVX packet intersector
(/root/reference/orion/avx/geometry.hpp:86-142): where the reference packs
8 triangles into AVX lanes against one ray, this kernel puts a chunk of
triangles on VPU *sublanes* and a block of rays on *lanes*, so one
[TC, RB] register plane evaluates TC triangles x RB rays at once, sweeping
all triangle chunks with an improve-only (t, id) state — entirely in
VMEM, so the O(rays x triangles) intermediate planes never touch HBM (the
jnp fallback in ops/intersect.py materializes them ~25x per call).

Layout notes (the whole point of this kernel):
  - rays arrive as [3, N] component rows (sublanes=3of8, lanes=rays) —
    no strided [:, i] slices of an [N, 3] array, which cost a relayout;
  - triangle components are [TC, n_chunks] (sublanes=triangles, lanes=
    chunk columns), so chunk c is the natural [TC, 1] lane slice;
  - the per-chunk result is [TC, RB]; min/argmin reduce over sublanes.

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

# max triangles per chunk (sublane dimension of the compute plane)
TRI_CHUNK = 512
# target elements per [TC, RB] compute plane: ~25 live f32 temps of this size
# must fit comfortably in 16 MB VMEM alongside block double-buffers
PLANE_BUDGET = 64 * 1024

_BIG = np.float32(3.0e38)


def _mt_plane(o, d, v0, e1, e2):
    """MT for [1,RB] ray comps against [TC,1] triangle comps -> t [TC,RB]."""
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


def _brute_kernel(o_ref, d_ref,
                  v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
                  t_out, id_out):
    """One grid step: RAY_BLOCK rays (lanes) against ALL triangle chunks."""
    tc, n_chunks = v0x.shape

    o = (o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :])   # [1,RB]
    d = (d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :])

    # triangle row index within a chunk (global id = c*tc + row)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (tc, 1), 0)

    def body(c, state):
        t_best, id_best = state  # [1,RB] f32, [1,RB] i32
        sl = pl.ds(c, 1)
        v0 = (v0x[:, sl], v0y[:, sl], v0z[:, sl])       # [TC,1]
        e1 = (e1x[:, sl], e1y[:, sl], e1z[:, sl])
        e2 = (e2x[:, sl], e2y[:, sl], e2z[:, sl])
        t = _mt_plane(o, d, v0, e1, e2)                  # [TC,RB]

        t_min = jnp.min(t, axis=0, keepdims=True)        # [1,RB]
        # argmin-by-value: smallest row achieving t_min
        row = jnp.min(jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                      axis=0, keepdims=True)
        idx = row + c * tc

        better = t_min < t_best
        t_new = jnp.where(better, t_min, t_best)
        id_new = jnp.where(better & (t_min < _BIG), idx, id_best)
        return t_new, id_new

    t0 = jnp.full(t_out.shape, _BIG, jnp.float32)
    i0 = jnp.full(id_out.shape, -1, jnp.int32)
    t_best, id_best = jax.lax.fori_loop(0, n_chunks, body, (t0, i0))
    t_out[:, :] = jnp.where(id_best >= 0, t_best, jnp.inf)
    id_out[:, :] = id_best


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("ray_block",))
def _intersect_pallas_impl(tri_v0, tri_e1, tri_e2, orig, dirs,
                           ray_block: int | None = None):
    T = tri_v0.shape[0]
    N = orig.shape[0]
    # chunk height: sublane multiple, capped
    tc = min(_round_up(max(T, 8), 8), TRI_CHUNK)
    T_pad = _round_up(T, tc)
    n_chunks = T_pad // tc
    if ray_block is None:
        # lane width per block, sized so the [TC, RB] temps fit VMEM
        ray_block = max(128, min(1024, _round_up(PLANE_BUDGET // tc, 128)))
    N_pad = _round_up(max(N, ray_block), ray_block)

    def tri_comp(arr, i):
        c = jnp.pad(arr[:, i], (0, T_pad - T))
        # [T_pad] -> [TC, n_chunks]: triangle g lives at [g % tc, g // tc]
        return c.reshape(n_chunks, tc).T

    tris = [tri_comp(a, i) for a in (tri_v0, tri_e1, tri_e2)
            for i in range(3)]

    # rays as [3, N] component rows
    o3 = jnp.pad(orig.T, ((0, 0), (0, N_pad - N)))
    d3 = jnp.pad(dirs.T, ((0, 0), (0, N_pad - N)), constant_values=1.0)

    grid = (N_pad // ray_block,)
    ray_spec = pl.BlockSpec((3, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ray_block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    t, tri_id = pl.pallas_call(
        _brute_kernel,
        grid=grid,
        in_specs=[ray_spec] * 2 + [tri_spec] * 9,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((1, N_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, N_pad), jnp.int32)),
    )(o3, d3, *tris)
    return t[0, :N], tri_id[0, :N]


def intersect_brute_pallas(scene: Scene, orig: jax.Array, dirs: jax.Array,
                           ray_block: int | None = None) -> Hit:
    """Drop-in Pallas replacement for intersect_brute (same Hit contract)."""
    t, tri_id = _intersect_pallas_impl(
        jax.lax.stop_gradient(scene.tri_v0),
        jax.lax.stop_gradient(scene.tri_e1),
        jax.lax.stop_gradient(scene.tri_e2),
        jax.lax.stop_gradient(orig),
        jax.lax.stop_gradient(dirs),
        ray_block=ray_block)
    # ids beyond the true (unpadded) triangle count are padding => miss
    valid = tri_id < scene.num_triangles
    return Hit(t=jnp.where(valid, t, jnp.inf),
               tri_id=jnp.where(valid, tri_id, -1))
