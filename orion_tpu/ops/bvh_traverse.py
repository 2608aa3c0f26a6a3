"""Batched stackless BVH traversal in pure JAX (lax.while_loop).

The recursion in the reference (SBVH::innerIntersect, /root/reference/orion/
avx/sbvh.cpp:36-83) becomes a batched skip-pointer walk: every ray carries a
node pointer; one `lax.while_loop` step advances all rays one node —
descend into [ptr+1, ...) on an AABB hit, jump to node_skip[ptr] on a miss
or after a leaf bundle test. The loop runs until every ray's pointer falls
off the end, i.e. wall-clock follows the *longest* individual path
(batch-level divergence); the Pallas packet kernel is the TPU performance
path, this is the portable/oracle backend.

Improvements over the reference traversal, validated by the
intersection-count tests (tests/test_bvh.py, mirroring the methodology of
/root/reference/benchmarks.md:16-32):
  - t-max pruning: a node whose AABB entry distance exceeds the ray's
    current best hit is skipped (the reference's slab test never prunes,
    AABB.hpp:79-99);
  - leaves are tested as dense [N, W] vectorized MT bundles rather than
    scalar loops (avx/sbvh.cpp:50-59).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from orion_tpu.accel.bvh import BVH
from orion_tpu.ops.intersect import Hit
from orion_tpu.ops.woop import _BIG, woop_rows, woop_tuv


class TraversalStats(NamedTuple):
    """Work counters, the BVH-quality metric of benchmarks.md:22-32."""

    box_tests: jax.Array  # [] int64-ish f32 sums
    tri_tests: jax.Array
    steps: jax.Array


def _slab(orig, inv_dir, lo, hi):
    """Slab test; hit iff tmax >= tmin && tmax > 0.

    The reference uses a strict tmax > tmin (AABB.hpp:79-99), which rejects
    perfectly flat boxes — e.g. an axis-aligned quad's leaf AABB (cornell
    walls, view_test planes) has lo == hi on one axis and tmin == tmax for
    any ray through it. We use >= (documented deviation, PARITY.md).
    Returns (hit, tmin); t is in |dir| units like the rest of the pipeline.
    """
    t0 = (lo - orig) * inv_dir
    t1 = (hi - orig) * inv_dir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (tmax >= tmin) & (tmax > 0.0), tmin


def _woop_bundle(orig, dirs, w13):
    """Woop test for each ray against its own [W] triangle bundle.

    orig/dirs: [N,3]; w13: [N,W,13] gathered transform rows. Returns
    t [N,W] (+inf on miss).
    """
    o = tuple(orig[:, None, i] for i in range(3))
    d = tuple(dirs[:, None, i] for i in range(3))
    w = tuple(w13[:, :, i] for i in range(13))
    t, _, _ = woop_tuv(o, d, w)
    return jnp.where(t < _BIG, t, jnp.inf)


@partial(jax.jit, static_argnames=("with_stats",))
def traverse(bvh: BVH, orig: jax.Array, dirs: jax.Array,
             with_stats: bool = False
             ) -> Tuple[jax.Array, jax.Array, Optional[TraversalStats]]:
    """Nearest hit of N rays against the BVH.

    Returns (t [N], bundled_row [N] int32 with -1 = miss, stats|None).
    """
    N = orig.shape[0]
    M = bvh.num_nodes
    W = bvh.leaf_width
    inv_dir = 1.0 / dirs
    # bundled Woop rows (loop-invariant: XLA hoists this out of the walk)
    w_rows = woop_rows(bvh.tri_v0, bvh.tri_e1, bvh.tri_e2)

    ptr0 = jnp.zeros((N,), jnp.int32)
    t0 = jnp.full((N,), jnp.inf, jnp.float32)
    row0 = jnp.full((N,), -1, jnp.int32)
    z = jnp.zeros((), jnp.float32)
    stats0 = (z, z, z)

    def cond(c):
        return jnp.any(c[0] < M)

    def step(c):
        ptr, t_best, row_best, st = c
        active = ptr < M
        p = jnp.minimum(ptr, M - 1)

        lo = bvh.node_lo[p]          # [N,3]
        hi = bvh.node_hi[p]
        hit_box, tmin = _slab(orig, inv_dir, lo, hi)
        hit_box = hit_box & (tmin < t_best) & active

        start = bvh.node_start[p]
        is_leaf = start >= 0

        # dense leaf bundle test (garbage rows where not at a hit leaf)
        do_leaf = hit_box & is_leaf
        rows = jnp.where(do_leaf, start, 0)[:, None] + jnp.arange(W)[None, :]
        t_tri = _woop_bundle(orig, dirs, w_rows[rows])    # [N,W]
        t_leaf = jnp.min(t_tri, axis=1)
        arg = jnp.argmin(t_tri, axis=1)
        leaf_row = rows[jnp.arange(N), arg]

        upd = do_leaf & (t_leaf < t_best)
        t_best = jnp.where(upd, t_leaf, t_best)
        row_best = jnp.where(upd, leaf_row.astype(jnp.int32), row_best)

        descend = hit_box & ~is_leaf
        new_ptr = jnp.where(descend, p + 1, bvh.node_skip[p])
        ptr = jnp.where(active, new_ptr, M)

        if with_stats:
            st = (st[0] + jnp.sum(active.astype(jnp.float32)),
                  st[1] + jnp.sum(do_leaf.astype(jnp.float32)) * W,
                  st[2] + 1.0)
        return ptr, t_best, row_best, st

    _, t_best, row_best, st = jax.lax.while_loop(
        cond, step, (ptr0, t0, row0, stats0))
    stats = TraversalStats(*st) if with_stats else None
    return t_best, row_best, stats


def make_bvh_intersect(bvh: BVH):
    """Build an IntersectFn closure over a flattened BVH.

    The returned fn maps bundled rows back to *global scene triangle ids*
    via tri_orig, so Hit is interchangeable with the brute-force backends
    (same ids into scene SoA tables for hit_attributes).
    """

    def intersect(scene, orig, dirs, *, alive=None) -> Hit:
        del scene  # geometry lives in the bvh's bundled copies
        del alive  # protocol arg; the batched jnp walk is dense anyway
        t, row, _ = traverse(bvh,
                             jax.lax.stop_gradient(orig),
                             jax.lax.stop_gradient(dirs))
        tri_id = jnp.where(row >= 0, bvh.tri_orig[jnp.maximum(row, 0)], -1)
        return Hit(t=jnp.where(tri_id >= 0, t, jnp.inf), tri_id=tri_id)

    return intersect
