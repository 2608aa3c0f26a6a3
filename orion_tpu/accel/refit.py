"""Fixed-topology BVH refit: per-step tree updates for moving geometry.

Vertex optimization (optim.fit over tri_v0/e1/e2) needs the acceleration
structure to track the moving vertices, but a full rebuild changes node
counts and leaf layouts — a new jit compile every optimizer step. A
REFIT keeps the round-1 topology (node structure, leaf membership,
bundled row order — all static shapes) and recomputes only the VALUES:
node AABBs (bottom-up through the skip-pointer flatten) and the leaf
bundles' Woop rows. The jitted loss takes these as runtime arguments, so
the whole fit loop compiles once.

This mirrors production ray tracers' refit-vs-rebuild split (fixed
topology between rebuilds); the reference never needs it — its scenes
are static (/root/reference/orion/avx/sbvh.cpp builds once in the
TracedMesh ctor, mesh.hpp:62-85). Tree quality degrades as vertices
drift far from the build positions; callers can rebuild (a new plan +
one recompile) every K steps if the fit moves geometry wholesale.
"""

from __future__ import annotations

import numpy as np

from orion_tpu.accel.bvh import BVH


class RefitPlan:
    """Static topology of a built tree + vectorized refit.

    refit(v0, e1, e2) -> (node_scalars, tri_data) in exactly
    ops/pallas_bvh._bvh_device_layout's format, computed from the
    CURRENT vertex arrays (host NumPy in, jnp out).
    """

    def __init__(self, bvh: BVH):
        self.n = int(bvh.num_nodes)
        self.leaf_width = int(bvh.leaf_width)
        self.skip = np.asarray(bvh.node_skip)
        self.start = np.asarray(bvh.node_start)
        self.count = np.asarray(bvh.node_count)
        row_orig = np.asarray(bvh.tri_orig)
        self.B = row_orig.shape[0]
        self.pad_rows = row_orig < 0
        self.safe = np.where(self.pad_rows, 0, row_orig)
        # per-node traversal order: children of internal i are (i+1) and
        # skip[i+1] (when inside i's subtree). Computed once.
        end = np.where(self.skip >= 0, self.skip, self.n)
        self.is_leaf = self.start >= 0
        left = np.arange(self.n) + 1
        right = np.where(left < self.n, end[np.minimum(left, self.n - 1)],
                         self.n)
        self.left = left
        self.right_valid = (~self.is_leaf) & (right < end)
        self.right = np.where(self.right_valid, right, 0)

    def refit(self, tri_v0, tri_e1, tri_e2):
        """New (node_scalars, tri_data) from the current vertex arrays."""
        import jax.numpy as jnp

        from orion_tpu.ops.pallas_bvh import pack_tri_comps16

        v0 = np.asarray(tri_v0, np.float64)
        e1 = np.asarray(tri_e1, np.float64)
        e2 = np.asarray(tri_e2, np.float64)
        b_v0 = v0[self.safe]
        b_e1 = np.where(self.pad_rows[:, None], 0.0, e1[self.safe])
        b_e2 = np.where(self.pad_rows[:, None], 0.0, e2[self.safe])

        # per-row AABB (+-inf on padding so slice-reduction ignores it)
        p1 = b_v0 + b_e1
        p2 = b_v0 + b_e2
        row_lo = np.minimum(np.minimum(b_v0, p1), p2)
        row_hi = np.maximum(np.maximum(b_v0, p1), p2)
        row_lo[self.pad_rows] = np.inf
        row_hi[self.pad_rows] = -np.inf

        lo = np.empty((self.n, 3), np.float64)
        hi = np.empty((self.n, 3), np.float64)
        for i in range(self.n - 1, -1, -1):
            if self.is_leaf[i]:
                r0 = self.start[i]
                r1 = r0 + self.count[i]
                lo[i] = row_lo[r0:r1].min(axis=0)
                hi[i] = row_hi[r0:r1].max(axis=0)
            else:
                l = self.left[i]
                if self.right_valid[i]:
                    r = self.right[i]
                    lo[i] = np.minimum(lo[l], lo[r])
                    hi[i] = np.maximum(hi[l], hi[r])
                else:
                    lo[i] = lo[l]
                    hi[i] = hi[l]

        lo32 = lo.astype(np.float32)
        hi32 = hi.astype(np.float32)
        node_scalars = tuple(
            [jnp.asarray(lo32[:, i]) for i in range(3)]
            + [jnp.asarray(hi32[:, i]) for i in range(3)]
            + [jnp.asarray(self.skip), jnp.asarray(self.start)])
        tri_data = pack_tri_comps16(b_v0.astype(np.float32),
                                    b_e1.astype(np.float32),
                                    b_e2.astype(np.float32))
        return node_scalars, tri_data
