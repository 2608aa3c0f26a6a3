"""Ray-triangle intersection: batched Möller-Trumbore + hit attribute recompute.

TPU-first replacement for the reference's scalar/AVX Möller-Trumbore
(/root/reference/orion/geometry.hpp:80-136, orion/avx/geometry.hpp:86-142):
instead of 1 ray x 8 triangles in AVX lanes, we evaluate rays x triangles as
dense branchless vector ops the VPU eats whole, and reduce with argmin.

Semantics match the reference test exactly:
  - two-sided (no backface culling), eps = 1e-6 on the determinant
  - u in [0,1], v >= 0, u+v <= 1
  - t >= 0 and improve-only (nearest hit wins)

Differentiability contract: traversal/selection returns an integer `tri_id`
(non-differentiable); `hit_attributes` recomputes (t, u, v) and shading
attributes differentiably at that fixed id — the standard detach trick
(SURVEY.md §7 "Gradients through discrete structure"). This makes every
intersection backend (brute force, BVH, Pallas) differentiable for free.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from orion_tpu.scene import Scene

MT_EPS = 1e-6
F_INF = jnp.inf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Hit:
    """Per-ray nearest-hit record. tri_id == -1 on miss; t == +inf on miss."""

    t: jax.Array       # [N] float32
    tri_id: jax.Array  # [N] int32

    @property
    def mask(self) -> jax.Array:
        return self.tri_id >= 0


def _cross(a, b):
    return jnp.cross(a, b)


def mt_test(orig, dirs, v0, e1, e2, valid):
    """Dense Möller-Trumbore: rays [N,3] against triangles [T,3].

    Returns t_masked [N,T] with +inf where no (valid) intersection.
    All ops are elementwise over an [N,T,3] broadcast — XLA fuses the chain
    into VPU code without materializing intermediates where it can.
    """
    o = orig[:, None, :]
    d = dirs[:, None, :]
    v0 = v0[None, :, :]
    e1 = e1[None, :, :]
    e2 = e2[None, :, :]

    pvec = _cross(d, e2)                      # [N,T,3]
    det = jnp.sum(e1 * pvec, axis=-1)         # [N,T]
    inv_det = 1.0 / det
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = _cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[..., 0:3] * qvec, axis=-1) * inv_det

    ok = (jnp.abs(det) > MT_EPS) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0) & (t >= 0.0) & valid[None, :]
    return jnp.where(ok, t, F_INF)


def _intersect_chunk(orig, dirs, v0, e1, e2, valid):
    t_all = mt_test(orig, dirs, v0, e1, e2, valid)   # [C,T]
    best = jnp.argmin(t_all, axis=1)
    t_best = jnp.take_along_axis(t_all, best[:, None], axis=1)[:, 0]
    tri_id = jnp.where(jnp.isfinite(t_best), best.astype(jnp.int32), -1)
    return t_best, tri_id


@partial(jax.jit, static_argnames=("chunk",))
def intersect_brute(scene: Scene, orig: jax.Array, dirs: jax.Array,
                    chunk: int = 4096) -> Hit:
    """Brute-force nearest intersection of N rays against ALL scene triangles.

    The oracle for every other backend (and the production path for small
    scenes like the Cornell box, where T <= a few hundred). Rays are processed
    in chunks of `chunk` to bound the [chunk, T] working set.
    """
    N = orig.shape[0]
    v0, e1, e2, valid = scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_valid
    if N <= chunk:
        t, tri_id = _intersect_chunk(orig, dirs, v0, e1, e2, valid)
        return Hit(t=t, tri_id=tri_id)
    # pad N to a multiple of chunk, scan over chunks
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    orig_p = jnp.pad(orig, ((0, pad), (0, 0)))
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    orig_c = orig_p.reshape(n_chunks, chunk, 3)
    dirs_c = dirs_p.reshape(n_chunks, chunk, 3)

    def body(_, oc_dc):
        oc, dc = oc_dc
        return None, _intersect_chunk(oc, dc, v0, e1, e2, valid)

    _, (t, tri_id) = jax.lax.scan(body, None, (orig_c, dirs_c))
    return Hit(t=t.reshape(-1)[:N], tri_id=tri_id.reshape(-1)[:N])


@dataclasses.dataclass(frozen=True)
class HitAttrs:
    """Differentiable per-ray hit attributes (garbage where hit.mask is False)."""

    t: jax.Array        # [N]
    u: jax.Array        # [N]
    v: jax.Array        # [N]
    point: jax.Array    # [N,3] origin + t*dir
    g_normal: jax.Array  # [N,3] geometric normal cross(e1,e2), normalized
    s_normal: jax.Array  # [N,3] smooth interpolated vertex normal, normalized
    uv: jax.Array       # [N,2] interpolated texture coordinates
    mat_id: jax.Array   # [N] int32 (0 where miss — callers mask via hit.mask)
    mesh_id: jax.Array  # [N] int32


def hit_attributes(scene: Scene, orig: jax.Array, dirs: jax.Array,
                   hit: Hit) -> HitAttrs:
    """Recompute (t,u,v) + shading attributes differentiably at fixed tri ids.

    Gradient flows from these outputs to scene.tri_v0/e1/e2 and (through the
    interpolants) to the ray — with the discrete tri_id held fixed.
    """
    idx = jnp.maximum(hit.tri_id, 0)
    v0 = scene.tri_v0[idx]
    e1 = scene.tri_e1[idx]
    e2 = scene.tri_e2[idx]

    pvec = _cross(dirs, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    safe_det = jnp.where(jnp.abs(det) > MT_EPS, det, 1.0)
    inv_det = 1.0 / safe_det
    tvec = orig - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = _cross(tvec, e1)
    v = jnp.sum(dirs * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det

    point = orig + t[:, None] * dirs
    g_n = _cross(e1, e2)
    g_n = g_n / jnp.maximum(jnp.linalg.norm(g_n, axis=-1, keepdims=True), 1e-20)
    w = (1.0 - u - v)[:, None]
    s_n = w * scene.n0[idx] + u[:, None] * scene.n1[idx] + v[:, None] * scene.n2[idx]
    s_n = s_n / jnp.maximum(jnp.linalg.norm(s_n, axis=-1, keepdims=True), 1e-20)
    uv = w * scene.uv0[idx] + u[:, None] * scene.uv1[idx] + v[:, None] * scene.uv2[idx]

    return HitAttrs(t=t, u=u, v=v, point=point, g_normal=g_n, s_normal=s_n,
                    uv=uv, mat_id=scene.tri_mat[idx],
                    mesh_id=scene.tri_mat[idx])
