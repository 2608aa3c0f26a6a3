"""Shading: texture sampling, Phong, BRDF-NEE term, sampling routines.

Reproduces the reference shading model (/root/reference/orion/material.hpp):
  - `phong_color`        <- Material::color (textured, material.hpp:72-93)
  - `color_brdf`         <- Material::colorBRDF (material.hpp:95-105),
                            including its 1/(1+d^2) falloff and two-cosine
                            geometry factor (the oracle uses the same
                            estimator, so images agree by construction)
  - `reflect`            <- math.hpp:321-323
  - `cosine_sample`      <- raytracer.cpp:173-192, with the tangent frame
                            NORMALIZED (the reference leaves tangent/bitangent
                            unnormalized, squashing the distribution —
                            documented deviation, see PARITY.md)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orion_tpu.ops.intersect import take_rows
from orion_tpu.scene import Scene


def reflect(v: jax.Array, n: jax.Array) -> jax.Array:
    """r = v - 2*dot(v,n)*n, rowwise over [..., 3]."""
    return v - 2.0 * jnp.sum(v * n, axis=-1, keepdims=True) * n


def normalize(v: jax.Array, eps: float = 1e-20) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def sample_texture(scene: Scene, map_idx: jax.Array, uv: jax.Array,
                   solid: jax.Array) -> jax.Array:
    """Nearest-neighbor texture lookup with wraparound; falls back to `solid`.

    map_idx: [N] int32 image index, -1 = solid color.
    uv: [N, 2]; solid: [N, 3].

    Matches Texture::color (texture.hpp:72-86) but with a correct
    floored-modulo wrap on both axes (the reference wraps negative v with
    `height + ui` — a bug we fix; PARITY.md).
    """
    img = jnp.maximum(map_idx, 0)
    hw = scene.tex_hw[img]  # [N, 2]
    h = hw[:, 0]
    w = hw[:, 1]
    ui = jnp.mod(jnp.floor(uv[:, 0] * w.astype(uv.dtype)).astype(jnp.int32), w)
    vi = jnp.mod(jnp.floor(uv[:, 1] * h.astype(uv.dtype)).astype(jnp.int32), h)
    off = scene.tex_off[img]  # [N, 2] (y0, x0) into the shelf-packed atlas
    texel = scene.tex_atlas[off[:, 0] + vi, off[:, 1] + ui]  # [N, 3]
    return jnp.where((map_idx >= 0)[:, None], texel, solid)


def _mat_tex_table(scene: Scene, map_per_mat: jax.Array) -> jax.Array:
    """[M, 5] float rows (has_map, h, w, off_y, off_x) for one texture slot.

    Folds the per-ray lookup chain map[mat_id] -> tex_hw[img]/tex_off[img]
    (three latency-bound gathers of 1M+ indices into tiny tables,
    measured ~13 of the 18 ms/1M-rays of a texture sample) into ONE
    M-row table built per call (M gathers — negligible) that take_rows
    then reads on the MXU as a one-hot matmul. Dims/offsets are exact in
    f32 (atlas extents << 2^24).
    """
    img = jnp.maximum(map_per_mat, 0)
    return jnp.concatenate(
        [(map_per_mat >= 0)[:, None].astype(jnp.float32),
         scene.tex_hw[img].astype(jnp.float32),
         scene.tex_off[img].astype(jnp.float32)], axis=1)


def _sample_texture_mat(scene: Scene, map_per_mat: jax.Array,
                        mat_id: jax.Array, uv: jax.Array,
                        solid: jax.Array) -> jax.Array:
    """sample_texture with the per-material table: one one-hot row read +
    one atlas texel gather per ray (same wrap semantics)."""
    rows = take_rows(_mat_tex_table(scene, map_per_mat), mat_id)  # [N,5]
    has = rows[:, 0] > 0.5
    h = rows[:, 1].astype(jnp.int32)
    w = rows[:, 2].astype(jnp.int32)
    ui = jnp.mod(jnp.floor(uv[:, 0] * rows[:, 2]).astype(jnp.int32), w)
    vi = jnp.mod(jnp.floor(uv[:, 1] * rows[:, 1]).astype(jnp.int32), h)
    oy = rows[:, 3].astype(jnp.int32)
    ox = rows[:, 4].astype(jnp.int32)
    texel = scene.tex_atlas[oy + vi, ox + ui]  # [N, 3]
    return jnp.where(has[:, None], texel, solid)


def diffuse_color(scene: Scene, mat_id: jax.Array, uv: jax.Array) -> jax.Array:
    return _sample_texture_mat(scene, scene.mat_map_diffuse, mat_id, uv,
                               take_rows(scene.mat_diffuse, mat_id))


def specular_color(scene: Scene, mat_id: jax.Array, uv: jax.Array) -> jax.Array:
    return _sample_texture_mat(scene, scene.mat_map_specular, mat_id, uv,
                               take_rows(scene.mat_specular, mat_id))


def ambient_color(scene: Scene, mat_id: jax.Array, uv: jax.Array) -> jax.Array:
    # the reference never installs an ambient image (model.cpp:153 loads it
    # into a dead variable), so ambient is always the solid Ka
    del uv
    return take_rows(scene.mat_ambient, mat_id)


def emissive_color(scene: Scene, mat_id: jax.Array, uv: jax.Array) -> jax.Array:
    # likewise emissive is always the solid Ke
    del uv
    return take_rows(scene.mat_emissive, mat_id)


def phong_eval(ka: jax.Array, kd: jax.Array, ks: jax.Array,
               shininess: jax.Array, ray_dir: jax.Array, normal: jax.Array,
               hit_point: jax.Array, light_pos: jax.Array,
               light_color: jax.Array,
               light_intensity: jax.Array) -> jax.Array:
    """Phong from pre-sampled material terms (see phong_color).

    Material samples depend only on the hit point, not the light —
    callers shading L lights sample once and tile, instead of gathering
    the texture atlas L times (render.py _whitted_bounce).
    """
    to_light = light_pos - hit_point
    d2 = jnp.sum(to_light * to_light, axis=-1)
    light_dir = normalize(to_light)

    ndotl = jnp.maximum(jnp.sum(normal * light_dir, axis=-1), 0.0)
    diffuse = ndotl[:, None] * kd

    view_dir = normalize(-ray_dir)
    reflect_dir = reflect(-light_dir, normal)
    spec_cos = jnp.maximum(jnp.sum(view_dir * reflect_dir, axis=-1), 0.0)
    # pow(0, 0) guard: jnp.power(0., 0.) == 1 like C++ powf
    spec = 0.5 * jnp.power(spec_cos, shininess)
    specular = spec[:, None] * ks

    return (light_color * (ka + diffuse + specular)
            * (light_intensity / jnp.maximum(d2, 1e-20))[:, None])


def phong_color(scene: Scene, mat_id: jax.Array, uv: jax.Array,
                ray_dir: jax.Array, normal: jax.Array, hit_point: jax.Array,
                light_pos: jax.Array, light_color: jax.Array,
                light_intensity: jax.Array) -> jax.Array:
    """Textured Phong: light.color*(ambient + diff*Kd + spec*Ks)*intensity/d^2.

    Matches Material::color (material.hpp:72-93); `normal` must be normalized.
    """
    return phong_eval(ambient_color(scene, mat_id, uv),
                      diffuse_color(scene, mat_id, uv),
                      specular_color(scene, mat_id, uv),
                      take_rows(scene.mat_shininess, mat_id),
                      ray_dir, normal, hit_point,
                      light_pos, light_color, light_intensity)


def brdf_eval(kd: jax.Array, normal: jax.Array, hit_point: jax.Array,
              light_pos: jax.Array, light_color: jax.Array,
              light_intensity: jax.Array,
              light_normal: jax.Array) -> jax.Array:
    """color_brdf from a pre-sampled Kd (NEE tiles the same surface point
    over E x S light samples — sample the texture once, not E*S times)."""
    to_light = light_pos - hit_point
    d2 = jnp.sum(to_light * to_light, axis=-1)
    light_dir = normalize(to_light)
    cos_s = jnp.sum(normal * light_dir, axis=-1)
    cos_l = jnp.sum(light_normal * (-light_dir), axis=-1)
    geom = jnp.maximum(cos_s * cos_l, 0.0)
    return light_color * kd * (geom * light_intensity / (1.0 + d2))[:, None]


def color_brdf(scene: Scene, mat_id: jax.Array, uv: jax.Array,
               normal: jax.Array, hit_point: jax.Array,
               light_pos: jax.Array, light_color: jax.Array,
               light_intensity: jax.Array, light_normal: jax.Array) -> jax.Array:
    """NEE diffuse term: Ke * Kd * max(cos_s * cos_l, 0) * intensity / (1+d^2).

    Matches Material::colorBRDF (material.hpp:95-105) exactly, including the
    reference's (non-physical but self-consistent) 1/(1+d^2) falloff and the
    clamp applied to the *product* of cosines.
    """
    return brdf_eval(diffuse_color(scene, mat_id, uv), normal, hit_point,
                     light_pos, light_color, light_intensity, light_normal)


def perturb_normal(scene: Scene, mat_id: jax.Array, uv: jax.Array,
                   normal: jax.Array, tangent: jax.Array,
                   bitangent: jax.Array) -> jax.Array:
    """Tangent-space normal mapping (Material::normalBumpMap,
    material.cpp:4-24 — implemented in the reference but its call site is
    commented out, model.hpp:21-22; here it's an opt-in render flag).

    Materials without a bump map keep their interpolated normal.
    """
    map_idx = scene.mat_map_bump[mat_id]
    n_ts = _sample_texture_mat(scene, scene.mat_map_bump, mat_id, uv,
                               jnp.broadcast_to(jnp.array([0.5, 0.5, 1.0],
                                                          normal.dtype),
                                                normal.shape))
    n_ts = normalize(n_ts * 2.0 - 1.0)
    t = normalize(tangent)
    b = normalize(bitangent)
    n = normalize(normal)
    mapped = (t * n_ts[:, 0:1] + b * n_ts[:, 1:2] + n * n_ts[:, 2:3])
    return jnp.where((map_idx >= 0)[:, None], normalize(mapped), n)


def cosine_sample(normal: jax.Array, u1: jax.Array, u2: jax.Array,
                  reference_frame: bool = False) -> jax.Array:
    """Cosine-weighted hemisphere sample around `normal` (normalized [N,3]).

    sin_theta = sqrt(u1), psi = 2*pi*u2 (raytracer.cpp:173-192). The tangent
    frame follows the reference's construction — tangent = cross(n, (0,1,0)),
    falling back to cross(n, (0,0,1)) when degenerate — but normalized by
    default. Pass reference_frame=True to reproduce the reference's
    unnormalized (squashed) frame bit-for-bit.
    """
    sin_theta = jnp.sqrt(u1)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - sin_theta * sin_theta, 0.0))
    psi = u2 * (2.0 * jnp.pi)

    up_y = jnp.array([0.0, 1.0, 0.0], normal.dtype)
    up_z = jnp.array([0.0, 0.0, 1.0], normal.dtype)
    tangent = jnp.cross(normal, up_y)
    degenerate = jnp.sum(tangent * tangent, axis=-1, keepdims=True) == 0.0
    tangent = jnp.where(degenerate, jnp.cross(normal, up_z), tangent)
    bitangent = jnp.cross(normal, tangent)
    if not reference_frame:
        tangent = normalize(tangent)
        bitangent = normalize(bitangent)

    a = (sin_theta * jnp.cos(psi))[:, None]
    b = (sin_theta * jnp.sin(psi))[:, None]
    c = cos_theta[:, None]
    return a * tangent + b * bitangent + c * normal


def sample_mesh_point(scene: Scene, mesh_id: int, u_tri: jax.Array,
                      u_a: jax.Array, u_b: jax.Array):
    """Uniform-by-count random point on mesh `mesh_id` (static int).

    Mirrors TracedMesh::randomPointOnSurface (mesh.hpp:178-184) +
    Triangle::randomPointOnSurface (geometry.hpp:159-171): pick a triangle
    uniformly by index, fold the parallelogram sample, and return the point,
    the light-sample weight (`bias * meshArea` = triArea * triCount, which is
    what the reference feeds NEE as light intensity, raytracer.cpp:150-155),
    and the sampled triangle's global id.

    u_tri/u_a/u_b: [N] uniforms. Areas use the corrected formula (PARITY.md).
    """
    start = scene.mesh_tri_start[mesh_id]
    count = scene.mesh_tri_count[mesh_id]
    tri_local = jnp.minimum((u_tri * count.astype(u_tri.dtype)).astype(jnp.int32),
                            count - 1)
    tri = start + tri_local

    v0 = scene.tri_v0[tri]
    e1 = scene.tri_e1[tri]
    e2 = scene.tri_e2[tri]

    flip = (u_a + u_b) > 1.0
    a = jnp.where(flip, 1.0 - u_a, u_a)[:, None]
    b = jnp.where(flip, 1.0 - u_b, u_b)[:, None]
    point = v0 + a * e1 + b * e2

    tri_area = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    weight = tri_area * count.astype(tri_area.dtype)  # == bias * meshArea
    return point, weight, tri
