"""Primitive (triangle) sharding across chips — the TP analogue.

SURVEY.md §2.4 flags "primitive sharding of the BVH across chips" as the
tensor-parallel analogue of the reference's (absent) model parallelism:
where ray sharding (parallel/shardmap_render.py) splits the *batch*,
primitive sharding splits the *scene* — each chip intersects rays
against only its triangle shard, and the nearest hit is merged across
the mesh with one all_gather + min per intersection.

Design (2D mesh, axes ("rays", "tp")):

  - rays are tiled over the "rays" axis exactly as in ray DP;
  - triangles are range-sharded over the "tp" axis: chip k owns rows
    [k*S, (k+1)*S) of the (padded) triangle arrays and reports hits with
    GLOBAL triangle ids, so the merged Hit is bit-identical to a
    single-device intersect (argmin tie-break: the earliest global id of
    the minimal t wins, matching jnp.argmin's first-match rule);
  - the merge collective is an all_gather of the [tp, N_local] (t, id)
    planes over ICI followed by a min-reduce — the only communication in
    the forward pass; everything downstream (shading, NEE, RR) runs
    replicated across "tp" (every tp rank computes its ray tile's
    radiance identically), so the collective cost is ~8 bytes/ray/bounce.
  - shading tables (materials, textures, per-corner attributes) stay
    replicated: they are O(T) storage and feed gathers at GLOBAL ids.
    What TP shards is the O(N x T) intersection *compute* — the term
    that dominates — and, in the treelet variant below, the per-chip
    acceleration-structure working set.

This is the scaling-book recipe (mesh + shardings + XLA collectives),
not a port: the reference has no distributed backend at all
(SURVEY.md §2.4, raytracer.cpp:70 is its only parallel construct).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from orion_tpu.camera import Camera, primary_rays
from orion_tpu.ops.intersect import Hit, mt_test
from orion_tpu.render import IntersectFn, trace_wavefront
from orion_tpu.scene import Scene

RAY_AXIS = "rays"
TP_AXIS = "tp"


def make_mesh_2d(n_ray: int, n_tp: int,
                 devices=None) -> Mesh:
    """A (rays, tp) device mesh: ray tiles x triangle shards."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size != n_ray * n_tp:
        raise ValueError(f"need {n_ray * n_tp} devices, have {devices.size}")
    return Mesh(devices.reshape(n_ray, n_tp), (RAY_AXIS, TP_AXIS))


def _pad_rows(x: jax.Array, rows: int, fill=0.0) -> jax.Array:
    pad = rows - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])


def make_tp_intersect(n_tp: int) -> IntersectFn:
    """An IntersectFn for use INSIDE a ("rays", "tp") shard_map region.

    Each tp rank tests the full local ray tile against its triangle
    slab (a dynamic row-slice of the replicated triangle arrays — the
    slab boundary is data-independent, so XLA keeps it a view) and the
    per-rank nearest hits merge with one all_gather over "tp".
    """

    def intersect(scene: Scene, orig: jax.Array, dirs: jax.Array, *,
                  alive=None) -> Hit:
        del alive
        T = scene.tri_v0.shape[0]
        S = -(-T // n_tp)  # shard rows (padded)
        k = jax.lax.axis_index(TP_AXIS)
        start = k * S

        def slab(x, fill=0.0):
            xp = _pad_rows(x, S * n_tp, fill)
            return jax.lax.dynamic_slice_in_dim(xp, start, S, axis=0)

        v0 = slab(scene.tri_v0)
        e1 = slab(scene.tri_e1)
        e2 = slab(scene.tri_e2)
        valid = slab(scene.tri_valid, fill=False)

        t_all = mt_test(orig, dirs, v0, e1, e2, valid)       # [N, S]
        local = jnp.argmin(t_all, axis=1)
        t = jnp.take_along_axis(t_all, local[:, None], axis=1)[:, 0]
        gid = jnp.where(jnp.isfinite(t), start + local.astype(jnp.int32), -1)

        ts = jax.lax.all_gather(t, TP_AXIS)                  # [tp, N]
        ids = jax.lax.all_gather(gid, TP_AXIS)
        # nearest t wins; equal-t ties break to the LOWEST rank (which
        # owns the lowest global ids), matching single-device argmin's
        # first-match rule: an unrolled improve-only sweep over ranks
        # (strictly-less keeps the earlier rank on ties)
        t_best = jnp.full(t.shape, jnp.inf, t.dtype)
        id_best = jnp.full(t.shape, -1, jnp.int32)
        for r in range(n_tp):
            better = ts[r] < t_best
            t_best = jnp.where(better, ts[r], t_best)
            id_best = jnp.where(better, ids[r], id_best)
        return Hit(t=jnp.where(id_best >= 0, t_best, jnp.inf),
                   tri_id=id_best)

    return intersect


@partial(jax.jit,
         static_argnames=("samples", "max_depth", "light_samples", "mode",
                          "mesh", "prune_zero"))
def _render_tp_impl(scene: Scene, camera: Camera, key: jax.Array, *,
                    samples: int, max_depth: int, light_samples: int,
                    mode: Optional[str], mesh: Mesh,
                    prune_zero: bool = True) -> jax.Array:
    H, W = camera.yres, camera.xres
    n_ray = mesh.shape[RAY_AXIS]
    n_tp = mesh.shape[TP_AXIS]
    px, py = 2.0 / W, 2.0 / H
    N = H * W
    pad = (-N) % n_ray
    tp_intersect = make_tp_intersect(n_tp)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS), P()),
             out_specs=P(RAY_AXIS), check_vma=False)
    def trace_shard(scene_rep, orig, dirs, k):
        # decorrelate ray tiles only: all tp ranks of a tile draw the
        # SAME randoms (their radiance must agree — it is replicated
        # over "tp" by construction)
        k = jax.random.fold_in(k, jax.lax.axis_index(RAY_AXIS))
        return trace_wavefront(scene_rep, orig, dirs, k,
                               max_depth=max_depth,
                               light_samples=light_samples, mode=mode,
                               intersect=tp_intersect,
                               prune_zero=prune_zero)

    def sample_body(acc, s):
        k_jit, k_trace = jax.random.split(jax.random.fold_in(key, s))
        jit2 = jax.random.uniform(k_jit, (2,))
        orig, dirs = primary_rays(camera, jit2[0] * px, jit2[1] * py)
        if pad:
            orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
            dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
        radiance = trace_shard(scene, orig, dirs, k_trace)
        return acc + radiance[:N].reshape(H, W, 3), None

    acc, _ = jax.lax.scan(sample_body, jnp.zeros((H, W, 3), jnp.float32),
                          jnp.arange(samples))
    return acc / float(samples)


def render_tp(scene: Scene, camera: Camera, key: jax.Array, *,
              mesh: Optional[Mesh] = None, n_tp: Optional[int] = None,
              samples: int = 1, max_depth: int = 1, light_samples: int = 2,
              mode: Optional[str] = None) -> jax.Array:
    """Render with rays x triangles sharded over a 2D (rays, tp) mesh.

    Default mesh: all devices on the tp axis (pure primitive sharding);
    pass n_tp to split devices between ray tiles and triangle shards.
    """
    if mesh is None:
        n_dev = len(jax.devices())
        n_tp = n_tp or n_dev
        mesh = make_mesh_2d(n_dev // n_tp, n_tp)
    return _render_tp_impl(scene, camera, key, samples=samples,
                           max_depth=max_depth, light_samples=light_samples,
                           mode=mode, mesh=mesh)
