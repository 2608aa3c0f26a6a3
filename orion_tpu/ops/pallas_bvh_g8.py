"""Pallas TPU kernel: grouped-pointer packet BVH traversal (G8).

Round-3 redesign of the block-uniform walk (ops/pallas_bvh.py). That
kernel advances ONE node pointer per 256-ray block, so a block's cost is
the UNION of its lanes' traversal paths — measured 8.9x slower on
incoherent (bounce) rays than on coherent primaries, the single weakest
axis of the round-2 record. A numpy replay of the walk on REAL bounce
rays from the enclosed 35k-tri cornell (experiments/exp_union_sim.py)
showed the fix is granularity + plane width, not smarter ordering:

  per ALIVE depth-2 bounce ray (morton-sorted wavefront)
    block=256, 1 pointer:  1.71 while-iters, leaf planes [128, 256]
    block=1024, 8 pointers: 0.39 while-iters, leaf planes [128, 128]
  => ~2.7-5x fewer vector-ops per ray.

Design: a block is 8 GROUPS x 128 lanes = 1024 rays. Each group has its
own scalar node pointer; the 8 pointers' AABBs are assembled into [8, 1]
columns (8 scalar SMEM loads per component) and ONE [8, 128] slab chain
tests all groups at full VPU density — the round-2 kernel's [1, RB]
slab shapes occupied 1 of 8 sublanes. Groups descend independently;
a leaf visit tests a [128 tris, 128 rays] Woop plane for just its group
(static row, unrolled python loop). The while loop runs until every
group's pointer falls off the tree (iterations = MAX over groups, not
the union), and groups whose rays are all dead retire at the root.

Rays enter sorted by the wavefront's coherence key (ops/reorder.py):
consecutive 128-ray groups then share a direction octant and an origin
cell, which is what makes per-group unions small. The 128-wide leaf
bundles, Woop transform, and Hit contract are shared with
ops/pallas_bvh.py (same pack_tri_comps16 layout, same skip-pointer
trees from accel/bvh.py).

vs the reference: same role as SBVH::innerIntersect
(/root/reference/orion/avx/sbvh.cpp:36-83) — the reference walks one
recursive descent per CPU ray with 8-wide AVX leaves; here 8 concurrent
group descents share a VPU, each testing 128-wide leaves over 128 rays.
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
from orion_tpu.ops.pallas_bvh import (LEAF_WIDTH, RESIDENT_MAX_BUNDLED,
                                      _bvh_device_layout)
from orion_tpu.ops.pallas_intersect import pack_ray_rows
from orion_tpu.ops.woop import woop_t

GROUPS = 8
GROUP_LANES = 128
RAY_BLOCK = GROUPS * GROUP_LANES   # 1024 rays per grid step

_BIG = np.float32(3.0e38)


def _make_kernel(M: int, any_hit: bool = False):
    """Grouped-pointer walk. Carry: 8 scalar pointers + t_best/col_best
    [8, 128] (row g = group g's lanes).

    any_hit=True: a lane retires on ANY intersection (t_best -> -_BIG),
    and a group whose lanes are all settled jumps its pointer to M."""

    def kernel(n_lox, n_loy, n_loz, n_hix, n_hiy, n_hiz, n_skip, n_start,
               r_ref, tri_ref, t_out, id_out):
        # r_ref block: [1, 64, 128]; rows c*8+g = component c of group g
        def comp(c):
            return r_ref[0, c * 8:(c + 1) * 8, :]        # [8, 128]

        o = (comp(0), comp(1), comp(2))
        d = (comp(3), comp(4), comp(5))
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        lane_alive = comp(6) > 0.0                       # [8, 128]

        row_idx = jax.lax.broadcasted_iota(jnp.int32, (GROUP_LANES, 1), 0)
        sub_idx = jax.lax.broadcasted_iota(jnp.int32,
                                           (GROUPS, GROUP_LANES), 0)

        def assemble(arr, ptrs):
            """8 scalar SMEM loads -> one [8, 1] column."""
            return jnp.concatenate(
                [jnp.full((1, 1), arr[p], jnp.float32) for p in ptrs],
                axis=0)

        def body(carry):
            ptrs = carry[:GROUPS]
            t_best, col_best = carry[GROUPS], carry[GROUPS + 1]
            safe = tuple(jnp.minimum(p, M - 1) for p in ptrs)

            lo = (assemble(n_lox, safe), assemble(n_loy, safe),
                  assemble(n_loz, safe))
            hi = (assemble(n_hix, safe), assemble(n_hiy, safe),
                  assemble(n_hiz, safe))

            # ONE dense [8, 128] slab chain for all 8 groups; flat boxes
            # hit (>=, PARITY #6)
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

            new_ptrs = []
            for g in range(GROUPS):
                active_g = ptrs[g] < M
                any_g = jnp.any(lane_hit[g:g + 1, :]) & active_g
                start_g = n_start[safe[g]]
                is_leaf_g = start_g >= 0

                def leaf_case(state, g=g, start_g=start_g):
                    t_b, c_b = state
                    off = pl.multiple_of(jnp.maximum(start_g, 0),
                                         LEAF_WIDTH)
                    blk_t = tri_ref[:, pl.ds(off, LEAF_WIDTH)].T  # [W,16]
                    w = tuple(blk_t[:, i:i + 1] for i in range(13))
                    og = tuple(x[g:g + 1, :] for x in o)   # [1, 128]
                    dg = tuple(x[g:g + 1, :] for x in d)
                    t = woop_t(og, dg, w)                  # [W, 128]
                    t_min = jnp.min(t, axis=0, keepdims=True)
                    row = jnp.min(jnp.where(t == t_min, row_idx,
                                            jnp.int32(2**30)),
                                  axis=0, keepdims=True) + start_g
                    tb_g = t_b[g:g + 1, :]
                    cb_g = c_b[g:g + 1, :]
                    better = (t_min < tb_g) & (t_min < _BIG)
                    if any_hit:
                        new_t = jnp.where(better, -_BIG, tb_g)
                    else:
                        new_t = jnp.where(better, t_min, tb_g)
                    new_c = jnp.where(better, row, cb_g)
                    # write back row g via sublane mask (Mosaic has no
                    # dynamic_update_slice; [1,128] broadcasts over rows)
                    is_g = sub_idx == g
                    t_b = jnp.where(is_g, new_t, t_b)
                    c_b = jnp.where(is_g, new_c, c_b)
                    return t_b, c_b

                t_best, col_best = jax.lax.cond(
                    any_g & is_leaf_g, leaf_case, lambda s: s,
                    (t_best, col_best))

                descend_g = any_g & jnp.logical_not(is_leaf_g)
                nxt = jnp.where(descend_g, ptrs[g] + 1,
                                jnp.where(active_g, n_skip[safe[g]], M))
                if any_hit:
                    # group retires once every live lane has hit
                    settled = jnp.all((col_best[g:g + 1, :] >= 0)
                                      | (t_best[g:g + 1, :] < 0.0))
                    nxt = jnp.where(settled, jnp.int32(M), nxt)
                new_ptrs.append(nxt)

            return tuple(new_ptrs) + (t_best, col_best)

        def cond(carry):
            live = carry[0] < M
            for g in range(1, GROUPS):
                live = live | (carry[g] < M)
            return live

        # dead lanes start retired (t_best = -_BIG); a fully-dead group
        # leaves the root via its skip pointer in one step
        t0 = jnp.where(lane_alive, _BIG, -_BIG)
        i0 = jnp.full((GROUPS, GROUP_LANES), -1, jnp.int32)
        ptrs0 = tuple(jnp.int32(0) for _ in range(GROUPS))
        out = jax.lax.while_loop(cond, body, ptrs0 + (t0, i0))
        t_best, col_best = out[GROUPS], out[GROUPS + 1]
        if any_hit:
            t_out[0, :, :] = jnp.where(col_best >= 0, 1.0, jnp.inf)
        else:
            t_out[0, :, :] = jnp.where(col_best >= 0, t_best, jnp.inf)
        id_out[0, :, :] = col_best

    return kernel


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_groups(rays: jax.Array, n_pad: int) -> jax.Array:
    """[8, N_pad] component rows -> [NB, 64, 128] blocks (NB = N_pad/1024);
    block row c*8+g holds component c of the block's group g."""
    nb = n_pad // RAY_BLOCK
    return (rays.reshape(8, nb, GROUPS, GROUP_LANES)
            .transpose(1, 0, 2, 3).reshape(nb, 64, GROUP_LANES))


@partial(jax.jit, static_argnames=("num_nodes", "interpret", "any_hit"))
def _traverse_g8_impl(node_scalars, tri_data, orig, dirs, alive=None, *,
                      num_nodes: int, interpret: bool = False,
                      any_hit: bool = False):
    N = orig.shape[0]
    n_pad = _round_up(max(N, RAY_BLOCK), RAY_BLOCK)
    rays = _pack_groups(pack_ray_rows(orig, dirs, n_pad, alive), n_pad)
    nb = n_pad // RAY_BLOCK

    kernel = _make_kernel(num_nodes, any_hit=any_hit)
    ray_spec = pl.BlockSpec((1, 64, GROUP_LANES), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, GROUPS, GROUP_LANES),
                            lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(node_scalars),
        grid=(nb,),
        in_specs=[ray_spec, tri_spec],
        out_specs=(out_spec, out_spec),
    )
    t, row = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nb, GROUPS, GROUP_LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nb, GROUPS, GROUP_LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(*node_scalars, rays, tri_data)
    return t.reshape(n_pad)[:N], row.reshape(n_pad)[:N]


def make_bvh_intersect_g8(bvh: BVH, scene, *,
                          interpret: bool | None = None,
                          any_hit: bool = False, layout=None):
    """IntersectFn closure: grouped-pointer Pallas traversal (G8).

    Same contract, tree layout, and caps as
    pallas_bvh.make_bvh_intersect_pallas — drop-in swap. `layout` shares
    the node/tri device buffers with other variants of the same tree.
    """
    if bvh.leaf_width != LEAF_WIDTH:
        raise ValueError(
            f"G8 traversal needs leaf_width={LEAF_WIDTH}, "
            f"got {bvh.leaf_width}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not interpret and bvh.num_bundled > RESIDENT_MAX_BUNDLED:
        raise ValueError(
            f"{bvh.num_bundled} bundled triangles exceed the VMEM "
            f"residency cap ({RESIDENT_MAX_BUNDLED})")
    node_scalars, tri_data = (layout if layout is not None
                              else _bvh_device_layout(bvh))
    tri_orig = bvh.tri_orig
    num_triangles = scene.num_triangles
    num_nodes = bvh.num_nodes

    def intersect(scene, orig, dirs, *, alive=None) -> Hit:
        t, row = _traverse_g8_impl(
            node_scalars, tri_data,
            jax.lax.stop_gradient(orig), jax.lax.stop_gradient(dirs),
            alive, num_nodes=num_nodes, interpret=interpret,
            any_hit=any_hit)
        tri_id = jnp.where(row >= 0, tri_orig[jnp.maximum(row, 0)], -1)
        tri_id = jnp.where(tri_id < num_triangles, tri_id, -1)
        return Hit(t=jnp.where(tri_id >= 0, t, jnp.inf), tri_id=tri_id)

    return intersect
