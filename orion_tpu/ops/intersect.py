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

    TPU layout note: every intermediate is an [N, T] plane built from [N, 1]
    ray components and [1, T] triangle components — the lane dimension stays
    on triangles (T is padded to 128) and the 3-vector structure is unrolled
    into scalar component planes. An [N, T, 3] formulation would put the
    3-wide axis on the 128-lane dimension (42x padding waste); this SoA form
    is the TPU analogue of the reference's AVX SoA packets
    (avx/geometry.hpp:86-142), with XLA fusing the whole chain into one
    VPU pass over [N, T].
    """
    ox, oy, oz = (orig[:, i, None] for i in range(3))
    dx, dy, dz = (dirs[:, i, None] for i in range(3))
    v0x, v0y, v0z = (v0[None, :, i] for i in range(3))
    e1x, e1y, e1z = (e1[None, :, i] for i in range(3))
    e2x, e2y, e2z = (e2[None, :, i] for i in range(3))

    # pvec = cross(d, e2)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz          # [N,T]
    inv_det = 1.0 / det
    # tvec = o - v0
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    # qvec = cross(tvec, e1)
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (jnp.abs(det) > MT_EPS) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
        & (u + v <= 1.0) & (t >= 0.0) & valid[None, :]
    return jnp.where(ok, t, F_INF)


def _intersect_chunk(orig, dirs, w13):
    """Nearest hit of [C,3] rays against a [T,13] Woop-row table."""
    from orion_tpu.ops.woop import _BIG, woop_tuv

    o = tuple(orig[:, i, None] for i in range(3))
    d = tuple(dirs[:, i, None] for i in range(3))
    w = tuple(w13[None, :, i] for i in range(13))
    t_all, _, _ = woop_tuv(o, d, w)                  # [C,T], _BIG = miss
    best = jnp.argmin(t_all, axis=1)
    t_best = jnp.take_along_axis(t_all, best[:, None], axis=1)[:, 0]
    hit = t_best < _BIG
    tri_id = jnp.where(hit, best.astype(jnp.int32), -1)
    return jnp.where(hit, t_best, F_INF), tri_id


@partial(jax.jit, static_argnames=("chunk",))
def intersect_brute(scene: Scene, orig: jax.Array, dirs: jax.Array,
                    chunk: int = 4096, *, alive=None) -> Hit:
    """Brute-force nearest intersection of N rays against ALL scene triangles.

    The oracle for every other backend (and the production path for small
    scenes like the Cornell box, where T <= a few hundred). Rays are processed
    in chunks of `chunk` to bound the [chunk, T] working set.

    alive: optional [N] bool — part of the IntersectFn protocol (the Pallas
    kernels skip dead blocks); the dense jnp sweep computes everything
    regardless, so it is accepted and ignored.

    The sweep tests via the shared Woop unit-triangle transform
    (ops/woop.py — 3.5x the Möller-Trumbore plane on TPU, identical
    predicate semantics); `mt_test` above is kept as the independent
    formulation the unit tests cross-check against.
    """
    del alive
    from orion_tpu.ops.woop import woop_rows

    N = orig.shape[0]
    w13 = woop_rows(scene.tri_v0, scene.tri_e1, scene.tri_e2,
                    scene.tri_valid)
    if N <= chunk:
        t, tri_id = _intersect_chunk(orig, dirs, w13)
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
        return None, _intersect_chunk(oc, dc, w13)

    _, (t, tri_id) = jax.lax.scan(body, None, (orig_c, dirs_c))
    return Hit(t=t.reshape(-1)[:N], tri_id=tri_id.reshape(-1)[:N])


# Largest table height for which row lookup is done as a one-hot matmul on
# the MXU instead of a gather. TPU gathers of [N] rows are HBM-latency bound
# (~5 GB/s effective measured); a [N,T]x[T,C] one-hot matmul runs at MXU
# speed and XLA fuses the one-hot construction into the dot.
ONE_HOT_MAX_ROWS = 2048


def take_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] for a [T, C] (or [T]) table and [N] int32 indices.

    Uses a one-hot MXU matmul for small tables (differentiable w.r.t. table,
    like the gather it replaces — the transpose matmul scatters cotangents),
    falling back to a plain gather for tall tables.
    """
    squeeze = table.ndim == 1
    tab2 = table[:, None] if squeeze else table
    T = tab2.shape[0]
    if T <= ONE_HOT_MAX_ROWS and jnp.issubdtype(tab2.dtype, jnp.floating):
        one_hot = jax.nn.one_hot(idx, T, dtype=tab2.dtype)
        # HIGHEST precision is load-bearing, not a nicety: the TPU default
        # (bf16 multiplies) truncates the table values themselves — a
        # one-hot row-select must reproduce rows EXACTLY. Round-1 shipped
        # without this and the recomputed hit points moved by ~0.3% of
        # scene scale (> the 1e-3 shadow bias), self-occluding every NEE
        # shadow ray on near-coplanar geometry: black ceilings on TPU
        # that no CPU test could see (CPU matmuls are f32).
        out = jnp.dot(one_hot, tab2, preferred_element_type=tab2.dtype,
                      precision=jax.lax.Precision.HIGHEST)
    else:
        out = tab2[idx]
    return out[:, 0] if squeeze else out


@jax.tree_util.register_dataclass
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
    # one fused row lookup over every per-triangle attribute (one-hot matmul
    # on the MXU for small scenes; gather for tall tables) — see take_rows
    table = jnp.concatenate(
        [scene.tri_v0, scene.tri_e1, scene.tri_e2,
         scene.n0, scene.n1, scene.n2,
         scene.uv0, scene.uv1, scene.uv2,
         scene.tri_mat.astype(jnp.float32)[:, None]], axis=1)
    rows = take_rows(table, idx)
    v0, e1, e2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    rn0, rn1, rn2 = rows[:, 9:12], rows[:, 12:15], rows[:, 15:18]
    ruv0, ruv1, ruv2 = rows[:, 18:20], rows[:, 20:22], rows[:, 22:24]
    mat_id = rows[:, 24].astype(jnp.int32)

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
    s_n = w * rn0 + u[:, None] * rn1 + v[:, None] * rn2
    s_n = s_n / jnp.maximum(jnp.linalg.norm(s_n, axis=-1, keepdims=True), 1e-20)
    uv = w * ruv0 + u[:, None] * ruv1 + v[:, None] * ruv2

    return HitAttrs(t=t, u=u, v=v, point=point, g_normal=g_n, s_normal=s_n,
                    uv=uv, mat_id=mat_id, mesh_id=mat_id)


def tangent_frame(scene: Scene, hit: Hit):
    """Per-hit UV-space tangent/bitangent for normal mapping.

    Standard derivation from edge vectors and UV deltas:
      T = (e1*dv2 - e2*dv1) / det,  B = (e2*du1 - e1*du2) / det,
      det = du1*dv2 - du2*dv1  (Assimp's CalcTangentSpace equivalent;
      the reference requested that flag at import, model.cpp:23-29, but its
      Vertex dropped the tangents "AD 2019", vertex.hpp:16-20).
    Degenerate UV mappings fall back to an arbitrary frame.
    """
    idx = jnp.maximum(hit.tri_id, 0)
    table = jnp.concatenate(
        [scene.tri_e1, scene.tri_e2, scene.uv0, scene.uv1, scene.uv2],
        axis=1)
    rows = take_rows(table, idx)
    e1, e2 = rows[:, 0:3], rows[:, 3:6]
    uv0, uv1, uv2 = rows[:, 6:8], rows[:, 8:10], rows[:, 10:12]
    du1 = (uv1 - uv0)[:, 0]
    dv1 = (uv1 - uv0)[:, 1]
    du2 = (uv2 - uv0)[:, 0]
    dv2 = (uv2 - uv0)[:, 1]
    det = du1 * dv2 - du2 * dv1
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    inv = (1.0 / safe)[:, None]
    tangent = (e1 * dv2[:, None] - e2 * dv1[:, None]) * inv
    bitangent = (e2 * du1[:, None] - e1 * du2[:, None]) * inv
    ok = (jnp.abs(det) > 1e-12)[:, None]
    tangent = jnp.where(ok, tangent, e1)
    bitangent = jnp.where(ok, bitangent, e2)
    return tangent, bitangent
