"""Pallas TPU kernel: packet BVH traversal (block-uniform skip-pointer walk).

The TPU analogue of packet ray tracing: a block of RB rays walks the
flattened BVH *together*. The node pointer is block-uniform scalar state;
a node's subtree is entered iff ANY live lane hits its AABB (with per-ray
t-entry pruning), and leaf bundles are tested as dense [128, RB] Woop
unit-triangle planes via the shared ops/woop.py (3.5x the MT planes of
rounds past, same predicate).

vs the reference (SBVH::innerIntersect, /root/reference/orion/avx/sbvh.cpp:
36-83): the reference recurses per ray and tests 8 triangles per AVX step;
here each leaf visit tests 128 x RB ray-triangle pairs and the block
amortizes node decisions across RB rays. Coherent packets (primary,
shadow) visit near-minimal node sets — the camera-octant child ordering
baked by accel/bvh.py keeps them front-to-back; incoherent bounce packets
visit the union of their lanes' paths, the classic divergence trade.

Layout (fourth measured design generation; the round-2 sweep —
experiments/exp_bvh_sweep.py — showed the round-1 [RB, 8] row-per-ray
layout spent most of its time in [RB, 1]-shaped slab tests that occupy
ONE lane of each (8, 128) register tile, wasting 127/128 of the VPU):
  - rays ride as ONE [8, N] component-row array (ox oy oz dx dy dz alive
    pad), blocked to [8, RB]; components are *static row slices* ->
    [1, RB] lane-major vectors, so the per-node slab chain runs at full
    VPU width. This is the same layout the brute kernel settled on.
  - bundled leaf triangles stay resident in VMEM as a compact [16, B_pad]
    component-row array (64 B per bundled triangle); a leaf is a dynamic
    *lane* slice at pl.multiple_of(start, 128) — hence leaf_width is
    pinned to 128. The [16, 128] leaf block is transposed once per visit
    to [128, 16], giving [128, 1] per-triangle component columns that
    broadcast against the [1, RB] ray components into a [128, RB] plane
    (tris on sublanes x rays on lanes — both reductions land lane-major).
  - outputs are [1, N] lane-major (the (N, 1) layout of rounds past gets
    a 128x-padded VMEM tiling).
  - RB must be a multiple of 128 (lane-dim blocking). 256 measured best
    on both coherent and shuffled nanosuit batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.accel.bvh import BVH
from orion_tpu.ops.intersect import Hit
from orion_tpu.ops.pallas_intersect import pack_ray_rows
from orion_tpu.ops.woop import woop_rows, woop_t

RAY_BLOCK = 256
LEAF_WIDTH = 128  # pinned: leaf lane offsets must be 128-aligned
# compact [16, B_pad] residency: 64 B per bundled triangle of VMEM
RESIDENT_MAX_BUNDLED = 120 * 1024

_BIG = np.float32(3.0e38)


def _make_kernel(M: int, W: int, any_hit: bool = False):
    """any_hit=True builds the occlusion variant: a lane retires the moment
    it finds ANY intersection (its t_best drops to -_BIG so it stops voting
    for subtree descent), and the whole block exits once every lane has
    hit. Matches the Whitted shadow quirk — any hit at any t blocks
    (raytracer.cpp:196-201) — where nearest-hit order is irrelevant."""
    assert W == LEAF_WIDTH

    def kernel(n_lox, n_loy, n_loz, n_hix, n_hiy, n_hiz, n_skip, n_start,
               r_ref, tri_ref, t_out, id_out):
        o = (r_ref[0:1, :], r_ref[1:2, :], r_ref[2:3, :])   # [1,RB]
        d = (r_ref[3:4, :], r_ref[4:5, :], r_ref[5:6, :])
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        lane_alive = r_ref[6:7, :] > 0.0                    # [1,RB]

        row_idx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)

        def body(carry):
            ptr, t_best, col_best = carry
            lo = (n_lox[ptr], n_loy[ptr], n_loz[ptr])
            hi = (n_hix[ptr], n_hiy[ptr], n_hiz[ptr])

            # slab test vs scalar bounds; flat boxes hit (>=, PARITY #6);
            # every operand is [1, RB] lane-major -> full VPU width
            tx0 = (lo[0] - o[0]) * inv[0]
            tx1 = (hi[0] - o[0]) * inv[0]
            ty0 = (lo[1] - o[1]) * inv[1]
            ty1 = (hi[1] - o[1]) * inv[1]
            tz0 = (lo[2] - o[2]) * inv[2]
            tz1 = (hi[2] - o[2]) * inv[2]
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            lane_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_best)
            any_lane_hit = jnp.any(lane_hit)

            start = n_start[ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_best, col_best = state
                off = pl.multiple_of(jnp.maximum(start, 0), LEAF_WIDTH)
                blk = tri_ref[:, pl.ds(off, W)]             # [16,W]
                blk_t = blk.T                               # [W,16]
                w = tuple(blk_t[:, i:i + 1] for i in range(13))
                t = woop_t(o, d, w)                         # [W,RB]
                t_min = jnp.min(t, axis=0, keepdims=True)   # [1,RB]
                row = jnp.min(jnp.where(t == t_min, row_idx,
                                        jnp.int32(2**30)),
                              axis=0, keepdims=True) + start
                better = (t_min < t_best) & (t_min < _BIG)
                if any_hit:
                    return (jnp.where(better, -_BIG, t_best),
                            jnp.where(better, row, col_best))
                return (jnp.where(better, t_min, t_best),
                        jnp.where(better, row, col_best))

            t_best, col_best = jax.lax.cond(
                any_lane_hit & is_leaf, leaf_case, lambda s: s,
                (t_best, col_best))

            descend = any_lane_hit & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, n_skip[ptr])
            return ptr, t_best, col_best

        def cond(carry):
            if any_hit:
                # a lane is settled when it has hit (col >= 0) or was
                # dead on entry (t_best < 0 with no hit recorded)
                settled = (carry[2] >= 0) | (carry[1] < 0.0)
                return (carry[0] < M) & jnp.logical_not(jnp.all(settled))
            return carry[0] < M

        rb = r_ref.shape[1]
        # dead lanes start retired (t_best = -_BIG fails every tmin <
        # t_best vote): a fully-dead block leaves the root immediately
        # via its skip pointer and the while_loop ends in one step
        t0 = jnp.where(lane_alive, _BIG, -_BIG)
        i0 = jnp.full((1, rb), -1, jnp.int32)
        _, t_best, col_best = jax.lax.while_loop(cond, body,
                                                 (jnp.int32(0), t0, i0))
        if any_hit:
            # occlusion-only record: t carries no geometric meaning
            t_out[:, :] = jnp.where(col_best >= 0, 1.0, jnp.inf)
        else:
            t_out[:, :] = jnp.where(col_best >= 0, t_best, jnp.inf)
        id_out[:, :] = col_best

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_tri_comps16(tri_v0, tri_e1, tri_e2, lane_mult: int = 128):
    """[B,3]x3 -> compact [16, B_pad] component rows (the 13 Woop
    transform floats in rows 0..12), padding columns always-miss;
    64 B per bundled triangle. Bundled geometry is host NumPy (the BVH
    build reordered it), so the transform precompute runs in float64."""
    B = tri_v0.shape[0]
    B_pad = _round_up(max(B, lane_mult), lane_mult)
    data = np.zeros((16, B_pad), np.float32)
    data[0:13, :B] = woop_rows(np.asarray(tri_v0), np.asarray(tri_e1),
                               np.asarray(tri_e2), xp=np).T
    data[11, B:] = 1.0   # padding: c_w = 1, d'_w = 0 => eps-miss
    return jnp.asarray(data)


@partial(jax.jit, static_argnames=("leaf_width", "num_nodes", "ray_block",
                                   "interpret", "any_hit"))
def _traverse_pallas_impl(node_scalars, tri_data, orig, dirs, alive=None, *,
                          leaf_width: int, num_nodes: int,
                          ray_block: int = RAY_BLOCK,
                          interpret: bool = False,
                          any_hit: bool = False):
    N = orig.shape[0]
    N_pad = _round_up(max(N, ray_block), ray_block)

    rays = pack_ray_rows(orig, dirs, N_pad, alive)

    grid = (N_pad // ray_block,)
    kernel = _make_kernel(num_nodes, leaf_width, any_hit=any_hit)

    ray_spec = pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # resident bundles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(node_scalars),
        grid=grid,
        in_specs=[ray_spec, tri_spec],
        out_specs=(out_spec, out_spec),
    )

    t, row = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, N_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, N_pad), jnp.int32)),
        interpret=interpret,
    )(*node_scalars, rays, tri_data)
    return t[0, :N], row[0, :N]


def _bvh_device_layout(bvh: BVH):
    """Kernel-ready layouts: node scalar vectors + [16, B_pad] tri rows."""
    node_scalars = tuple(
        [bvh.node_lo[:, i] for i in range(3)]
        + [bvh.node_hi[:, i] for i in range(3)]
        + [bvh.node_skip, bvh.node_start])
    tri_data = pack_tri_comps16(bvh.tri_v0, bvh.tri_e1, bvh.tri_e2)
    return node_scalars, tri_data


def make_bvh_intersect_pallas(bvh: BVH, scene, *, ray_block: int = RAY_BLOCK,
                              interpret: bool | None = None,
                              any_hit: bool = False, layout=None):
    """IntersectFn closure: Pallas packet traversal over a flattened BVH.

    Requires bvh.leaf_width == 128 (the engine builds TPU trees that way);
    ray_block must be a multiple of 128 (lane-dim grid blocking). Maps
    bundled rows to global scene triangle ids (tri_orig), matching the
    other backends' Hit contract.

    any_hit=True returns occlusion-only Hits (mask/tri_id of SOME hit,
    t=1.0 — not the nearest): lanes retire on first intersection and
    blocks exit early. Only valid where callers use hit.mask alone
    (Whitted shadow rays, render.py `shadow_intersect`).

    layout: a `_bvh_device_layout(bvh)` result to share node/triangle
    device buffers between variants built from the same tree (the
    closest-hit and any-hit closures otherwise each hold a copy).
    """
    if bvh.leaf_width != LEAF_WIDTH:
        raise ValueError(
            f"Pallas BVH traversal needs leaf_width={LEAF_WIDTH}, "
            f"got {bvh.leaf_width}")
    if ray_block % 128 != 0:
        raise ValueError(f"ray_block must be a multiple of 128, "
                         f"got {ray_block}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and bvh.num_bundled > RESIDENT_MAX_BUNDLED:
        raise ValueError(
            f"{bvh.num_bundled} bundled triangles exceed the VMEM residency "
            f"cap ({RESIDENT_MAX_BUNDLED}); use the jnp traversal backend")
    node_scalars, tri_data = (layout if layout is not None
                              else _bvh_device_layout(bvh))
    tri_orig = bvh.tri_orig
    num_triangles = scene.num_triangles
    leaf_width, num_nodes = bvh.leaf_width, bvh.num_nodes  # don't close
    # over the whole BVH object just for two static ints

    def intersect(scene, orig, dirs, *, alive=None) -> Hit:
        t, row = _traverse_pallas_impl(
            node_scalars, tri_data,
            jax.lax.stop_gradient(orig), jax.lax.stop_gradient(dirs),
            alive,
            leaf_width=leaf_width, num_nodes=num_nodes,
            ray_block=ray_block, interpret=interpret, any_hit=any_hit)
        tri_id = jnp.where(row >= 0, tri_orig[jnp.maximum(row, 0)], -1)
        tri_id = jnp.where(tri_id < num_triangles, tri_id, -1)
        return Hit(t=jnp.where(tri_id >= 0, t, jnp.inf), tri_id=tri_id)

    return intersect
