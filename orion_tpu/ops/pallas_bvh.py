"""Pallas TPU kernel: packet BVH traversal (block-uniform skip-pointer walk).

The TPU analogue of packet ray tracing: a block of RB rays (VPU lanes)
walks the flattened BVH *together*. The node pointer is block-uniform
scalar state; a node's subtree is entered iff ANY live lane hits its AABB
(with per-lane t-entry pruning), and leaf bundles are tested as dense
[W, RB] Möller-Trumbore planes — the leaf's W bundled triangles on
sublanes, rays on lanes — via the shared mt_plane of
ops/pallas_intersect.py, but only for the leaves this block reaches.

vs the reference (SBVH::innerIntersect, /root/reference/orion/avx/sbvh.cpp:
36-83): the reference recurses per ray and tests 8 triangles per AVX step;
here each leaf visit tests W x RB ray-triangle pairs and the block
amortizes node decisions across hundreds of rays. Coherent packets
(primary, shadow) visit near-minimal node sets; incoherent bounce packets
visit the union of their lanes' paths — the classic divergence trade,
priced at block granularity.

Layout rules this kernel lives by (measured, not theoretical):
  - every per-ray value is [1, RB] — lanes full. A [RB, 1] orientation
    puts one value per (8,128) register tile and wastes 127/128 of the
    VPU (a prior revision did exactly that and was 4x slower);
  - node scalars (bounds, skip, leaf start) ride in SMEM via scalar
    prefetch — they feed scalar control flow;
  - bundled leaf triangles are resident in VMEM as [B_pad, 16] rows
    (v0|e1|e2 in cols 0..8): a leaf is a dynamic *sublane* row range
    (pl.multiple_of(start, W), W a multiple of 8) and components are
    static column slices -> [W, 1]. Lane padding makes this 512 B per
    bundled triangle — the engine caps bundles at RESIDENT_MAX_BUNDLED
    and larger scenes fall back to the jnp traversal.
  - rays arrive as one [8, N] component-row array, blocked to [8, RB].
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
from orion_tpu.ops.pallas_intersect import (mt_plane, pack_ray_rows,
                                            pack_tri_rows16, ray_rows,
                                            tri_cols)

RAY_BLOCK = 1024
# [B_pad, 16] resident rows pad to 128 lanes => 512 B per bundled triangle
RESIDENT_MAX_BUNDLED = 24 * 1024

_BIG = np.float32(3.0e38)


def _make_kernel(M: int, W: int):
    def kernel(n_lox, n_loy, n_loz, n_hix, n_hiy, n_hiz, n_skip, n_start,
               r_ref, tri_ref,
               t_out, id_out):
        o, d = ray_rows(r_ref)                           # [1,RB] comps
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])

        row_idx = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)

        def body(carry):
            ptr, t_best, col_best = carry
            lo = (n_lox[ptr], n_loy[ptr], n_loz[ptr])
            hi = (n_hix[ptr], n_hiy[ptr], n_hiz[ptr])

            # slab test, [1,RB] vs scalar bounds; flat boxes hit (>=)
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
            any_hit = jnp.any(lane_hit)

            start = n_start[ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_best, col_best = state
                off = pl.multiple_of(jnp.maximum(start, 0), W)
                v0, e1, e2 = tri_cols(tri_ref[pl.ds(off, W), :])  # [W,1]
                t = mt_plane(o, d, v0, e1, e2)              # [W,RB]
                t_min = jnp.min(t, axis=0, keepdims=True)   # [1,RB]
                row = jnp.min(jnp.where(t == t_min, row_idx,
                                        jnp.int32(2**30)),
                              axis=0, keepdims=True) + start
                better = (t_min < t_best) & (t_min < _BIG)
                return (jnp.where(better, t_min, t_best),
                        jnp.where(better, row, col_best))

            do_leaf = any_hit & is_leaf
            t_best, col_best = jax.lax.cond(
                do_leaf, leaf_case, lambda s: s, (t_best, col_best))

            descend = any_hit & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, n_skip[ptr])
            return ptr, t_best, col_best

        def cond(carry):
            return carry[0] < M

        t0 = jnp.full(t_out.shape, _BIG, jnp.float32)    # [1,RB]
        i0 = jnp.full(id_out.shape, -1, jnp.int32)
        ptr0 = jnp.int32(0)
        _, t_best, col_best = jax.lax.while_loop(cond, body, (ptr0, t0, i0))
        t_out[:, :] = jnp.where(col_best >= 0, t_best, jnp.inf)
        id_out[:, :] = col_best

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("leaf_width", "num_nodes", "ray_block",
                                   "interpret"))
def _traverse_pallas_impl(node_scalars, tri_data, orig, dirs, *,
                          leaf_width: int, num_nodes: int,
                          ray_block: int = RAY_BLOCK,
                          interpret: bool = False):
    N = orig.shape[0]
    N_pad = _round_up(max(N, ray_block), ray_block)

    rays = pack_ray_rows(orig, dirs, N_pad)

    grid = (N_pad // ray_block,)
    kernel = _make_kernel(num_nodes, leaf_width)

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
    """Kernel-ready layouts: node scalar vectors + [B_pad,16] tri rows."""
    node_scalars = tuple(
        [bvh.node_lo[:, i] for i in range(3)]
        + [bvh.node_hi[:, i] for i in range(3)]
        + [bvh.node_skip, bvh.node_start])
    tri_data = pack_tri_rows16(bvh.tri_v0, bvh.tri_e1, bvh.tri_e2,
                               bvh.leaf_width)
    return node_scalars, tri_data


def make_bvh_intersect_pallas(bvh: BVH, scene, *, ray_block: int = RAY_BLOCK,
                              interpret: bool | None = None):
    """IntersectFn closure: Pallas packet traversal over a flattened BVH.

    Maps bundled rows to global scene triangle ids (tri_orig), matching
    the other backends' Hit contract. Requires leaf_width % 8 == 0 and
    (on hardware) bundles within the VMEM residency cap.
    """
    if bvh.leaf_width % 8 != 0:
        raise ValueError("leaf_width must be a sublane multiple (8)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and bvh.num_bundled > RESIDENT_MAX_BUNDLED:
        raise ValueError(
            f"{bvh.num_bundled} bundled triangles exceed the VMEM residency "
            f"cap ({RESIDENT_MAX_BUNDLED}); use the jnp traversal backend")
    node_scalars, tri_data = _bvh_device_layout(bvh)
    tri_orig = bvh.tri_orig
    num_triangles = scene.num_triangles

    def intersect(scene, orig, dirs) -> Hit:
        t, row = _traverse_pallas_impl(
            node_scalars, tri_data,
            jax.lax.stop_gradient(orig), jax.lax.stop_gradient(dirs),
            leaf_width=bvh.leaf_width, num_nodes=bvh.num_nodes,
            ray_block=ray_block, interpret=interpret)
        tri_id = jnp.where(row >= 0, tri_orig[jnp.maximum(row, 0)], -1)
        tri_id = jnp.where(tri_id < num_triangles, tri_id, -1)
        return Hit(t=jnp.where(tri_id >= 0, t, jnp.inf), tri_id=tri_id)

    return intersect
