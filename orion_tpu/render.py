"""The render engine: wavefront Whitted ray tracing and BRDF path tracing.

This is the TPU re-design of RayTracer::traceRTC / RayTracer::trace
(/root/reference/orion/raytracer.cpp:19-210). The reference holds one ray's
bounce recursion on the C++ stack and parallelizes pixels with OpenMP; here
the *whole image* is one ray wavefront [N=H*W] and the bounce recursion
becomes a `lax.scan` over depth carrying (origin, dir, throughput, alive)
per ray — so every step is a dense, statically-shaped batch the XLA/TPU
pipeline can fuse, and reverse-mode AD works through the whole renderer.

Mode selection matches the reference (raytracer.cpp:131): scenes with point
lights render Whitted-style; scenes without render with BRDF path tracing +
next-event estimation on emissive meshes + Russian roulette.

RNG: `jax.random` threefry keys folded per (sample, depth) — deterministic,
counter-based, and shard-invariant by construction, replacing the reference's
per-thread xoroshiro128+ jump() streams (raytracer.cpp:43-51).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from orion_tpu.camera import Camera, primary_rays
from orion_tpu.ops import shade
from orion_tpu.ops.intersect import (Hit, hit_attributes, intersect_brute,
                                     take_rows, tangent_frame)
from orion_tpu.scene import Scene

# bias to move rays off surfaces (raytracer.cpp:118)
BIAS = 1e-3

# IntersectFn protocol: (scene, orig [N,3], dirs [N,3], *, alive=None) ->
# Hit. `alive` is an optional [N] bool; implementations may skip (and
# report miss for) dead rays — callers only consume results where alive.
IntersectFn = Callable[..., Hit]


def _tag_hits(fn: IntersectFn) -> IntersectFn:
    """Name an intersect fn's outputs "hit" for the remat="hits" policy.

    The hit record is 8 bytes/ray; the kernel that produced it walks the
    whole acceleration structure. Saving the record and rematerializing
    everything else makes the backward pass intersection-free.
    """

    def tagged(scene, orig, dirs, **kw):
        h = fn(scene, orig, dirs, **kw)
        return Hit(t=checkpoint_name(h.t, "hit"),
                   tri_id=checkpoint_name(h.tri_id, "hit"))

    return tagged


def default_intersect() -> IntersectFn:
    """Best single-chip intersection backend for the current JAX backend.

    TPU gets the fused Pallas MT sweep (ops/pallas_intersect.py); other
    backends (CPU tests, the virtual multi-chip mesh) get the jnp brute
    force. Both share the Hit contract and the differentiable
    `hit_attributes` recompute, so the choice is purely a performance one.
    """
    if jax.default_backend() == "tpu":
        from orion_tpu.ops.pallas_intersect import intersect_brute_pallas

        return intersect_brute_pallas
    return intersect_brute


def _emissive_primary_term(scene: Scene, attrs, dirs, depth):
    """depth-0 emitter visibility: Ke * meshArea * dot(normalize(dir), -normal).

    Matches raytracer.cpp:127-128 (kept verbatim including the mesh-area
    scaling; the oracle uses the same estimator).
    """
    ke = shade.emissive_color(scene, attrs.mat_id, attrs.uv)
    area = scene.mesh_area[attrs.mesh_id]
    cosv = jnp.sum(shade.normalize(dirs) * (-attrs.s_normal), axis=-1)
    term = ke * (area * cosv)[:, None]
    return jnp.where(depth == 0, term, jnp.zeros_like(term))


def _nee(scene: Scene, attrs, kd, hit_mask, key, light_samples: int,
         intersect: IntersectFn):
    """Next-event estimation against every emissive mesh.

    Matches the reference estimator (raytracer.cpp:133-159): for each
    emissive mesh, `light_samples` area samples; a sample contributes iff
    the shadow ray's *nearest* hit lands on the emitter mesh; emitted
    color/normal are evaluated at the shadow-ray hit point.

    Fully batched over E emitters x S samples: one RNG draw, one vmapped
    area sampling, ONE stacked intersect, one vectorized contribution sum —
    compile cost is O(1) in E and S (the reference's data loop over
    emitters, not an unrolled Python loop; a dozen emitters trace the same
    program as one).
    """
    N = attrs.point.shape[0]
    E = scene.num_emissive
    S = light_samples
    ES = E * S
    origin = attrs.point + BIAS * attrs.g_normal

    # [E] emitter mesh ids (static slice drops the -1 padding rows), each
    # sampled S times -> [E*S]
    mesh_ids = scene.emissive_mesh_ids[:E].astype(jnp.int32)
    mesh_id_rep = jnp.repeat(mesh_ids, S)

    u = jax.random.uniform(key, (ES, 3, N))
    target, weight, _ = jax.vmap(
        lambda mid, uu: shade.sample_mesh_point(scene, mid,
                                                uu[0], uu[1], uu[2])
    )(mesh_id_rep, u)                       # [ES, N, 3], [ES, N]

    target_all = target.reshape(ES * N, 3)
    weight_all = weight.reshape(ES * N)
    origin_all = jnp.tile(origin, (ES, 1))
    point_all = jnp.tile(attrs.point, (ES, 1))
    shadow_dir_all = target_all - point_all
    s_hit = intersect(scene, origin_all, shadow_dir_all,
                      alive=jnp.tile(hit_mask, ES))
    s_attrs = hit_attributes(scene, origin_all, shadow_dir_all, s_hit)

    # a sample is visible iff its nearest hit is on ITS emitter mesh
    visible = (s_hit.mask
               & (s_attrs.mesh_id == jnp.repeat(mesh_id_rep, N))
               & jnp.tile(hit_mask, ES))
    ke = shade.emissive_color(scene, s_attrs.mat_id, s_attrs.uv)
    # kd is the SURFACE point's diffuse — identical across the ES tiled
    # copies, sampled once by the caller and tiled here
    c = shade.brdf_eval(jnp.tile(kd, (ES, 1)),
                        jnp.tile(attrs.s_normal, (ES, 1)),
                        point_all, target_all, ke, weight_all,
                        s_attrs.s_normal)
    c = jnp.where(visible[:, None], c, 0.0)
    return jnp.sum(c.reshape(ES, N, 3), axis=0) / float(S)


def _apply_normal_maps(scene: Scene, attrs, hit):
    """Opt-in tangent-space normal mapping (PARITY.md: the reference ships
    this disabled; render(..., normal_maps=True) enables it here)."""
    import dataclasses

    tangent, bitangent = tangent_frame(scene, hit)
    s_n = shade.perturb_normal(scene, attrs.mat_id, attrs.uv,
                               attrs.s_normal, tangent, bitangent)
    return dataclasses.replace(attrs, s_normal=s_n)


def _path_bounce(scene: Scene, carry, depth, key, light_samples: int,
                 max_depth: int, intersect: IntersectFn,
                 reference_frame: bool, normal_maps: bool = False):
    """One path-tracing wavefront step (raytracer.cpp:105-194, BRDF branch)."""
    orig, dirs, throughput, alive = carry
    hit = intersect(scene, orig, dirs, alive=alive)
    attrs = hit_attributes(scene, orig, dirs, hit)
    if normal_maps:
        attrs = _apply_normal_maps(scene, attrs, hit)
    hit_mask = alive & hit.mask

    radiance = jnp.zeros_like(throughput)
    em = _emissive_primary_term(scene, attrs, dirs, depth)
    radiance += jnp.where(hit_mask[:, None], em, 0.0)

    # one diffuse sample per bounce: NEE's BRDF term and Russian roulette
    # read the same surface Kd (the reference re-reads the texture per
    # light sample, material.hpp:95-105)
    kd = shade.diffuse_color(scene, attrs.mat_id, attrs.uv)

    k_nee, k_rr, k_dir = jax.random.split(jax.random.fold_in(key, depth), 3)
    if scene.num_emissive > 0:
        radiance += _nee(scene, attrs, kd, hit_mask, k_nee, light_samples,
                         intersect)
    radiance = radiance * throughput

    # Russian roulette continuation (raytracer.cpp:161-170)
    p_continue = jnp.max(kd, axis=-1)
    u_rr = jax.random.uniform(k_rr, p_continue.shape)
    continue_mask = hit_mask & (depth < max_depth) & (u_rr <= p_continue)
    # double-where so the dead branch contributes a finite cotangent
    # (1/p^2 at p~0 overflows f32 and NaNs the max-gradient otherwise)
    safe_p = jnp.where(p_continue > 0.0, p_continue, 1.0)
    rr_scale = jnp.where(p_continue > 0.0, 1.0 / safe_p, 0.0)

    # cosine-weighted bounce (raytracer.cpp:173-194)
    u = jax.random.uniform(k_dir, (2,) + p_continue.shape)
    new_dir = shade.cosine_sample(attrs.s_normal, u[0], u[1],
                                  reference_frame=reference_frame)
    new_orig = attrs.point + attrs.s_normal * BIAS

    new_throughput = throughput * kd * rr_scale[:, None]
    new_throughput = jnp.where(continue_mask[:, None], new_throughput, 0.0)

    carry = (jnp.where(continue_mask[:, None], new_orig, orig),
             jnp.where(continue_mask[:, None], new_dir, dirs),
             new_throughput,
             continue_mask)
    return carry, radiance


def _whitted_bounce(scene: Scene, carry, depth, max_depth: int,
                    intersect: IntersectFn, normal_maps: bool = False,
                    shadow_intersect: Optional[IntersectFn] = None,
                    prune_zero: bool = True):
    """One Whitted wavefront step (raytracer.cpp:195-207).

    shadow_intersect: occlusion-only backend for the stacked shadow rays
    (only hit.mask is consumed — any-hit kernels are valid here).

    prune_zero: retire rays whose reflected throughput is exactly zero
    (value-identical; the alive-masked kernels then skip their blocks).
    Training paths pass False: at refl == 0 the pruned subpath still
    carries d(contribution)/d(refl) = throughput * L, which needs the
    ray traced."""
    orig, dirs, throughput, alive = carry
    hit = intersect(scene, orig, dirs, alive=alive)
    attrs = hit_attributes(scene, orig, dirs, hit)
    if normal_maps:
        attrs = _apply_normal_maps(scene, attrs, hit)
    hit_mask = alive & hit.mask

    radiance = jnp.zeros_like(throughput)
    em = _emissive_primary_term(scene, attrs, dirs, depth)
    radiance += jnp.where(hit_mask[:, None], em, 0.0)

    shadow_origin = attrs.point + BIAS * attrs.g_normal
    L = scene.num_lights
    N = attrs.point.shape[0]
    # material samples depend only on the hit point: sample ONCE per
    # bounce and tile over lights (texture-atlas/table gathers dominate
    # the non-kernel time; the reference re-reads them per light,
    # material.hpp:72-93); the specular map is also the mirror
    # continuation weight below
    ka = shade.ambient_color(scene, attrs.mat_id, attrs.uv)
    kd = shade.diffuse_color(scene, attrs.mat_id, attrs.uv)
    refl = shade.specular_color(scene, attrs.mat_id, attrs.uv)
    shin = take_rows(scene.mat_shininess, attrs.mat_id)
    if L > 0:
        # fully batched over lights: one stacked intersect + one vectorized
        # Phong evaluation — compile cost O(1) in L (the reference's data
        # loop over rtc lights, raytracer.cpp:196-201)
        lpos_all = jnp.repeat(scene.light_pos[:L], N, axis=0)    # [L*N, 3]
        point_all = jnp.tile(attrs.point, (L, 1))
        to_light_all = lpos_all - point_all
        s_fn = shadow_intersect if shadow_intersect is not None else intersect
        s_hit = s_fn(scene, jnp.tile(shadow_origin, (L, 1)), to_light_all,
                     alive=jnp.tile(hit_mask, L))
        # reference quirk kept: ANY intersection blocks, even geometry
        # beyond the light (raytracer.cpp:196-201); see PARITY.md
        lit = jnp.tile(hit_mask, L) & ~s_hit.mask
        c = shade.phong_eval(jnp.tile(ka, (L, 1)),
                             jnp.tile(kd, (L, 1)),
                             jnp.tile(refl, (L, 1)),
                             jnp.tile(shin, L),
                             jnp.tile(dirs, (L, 1)),
                             jnp.tile(attrs.s_normal, (L, 1)),
                             point_all, lpos_all,
                             jnp.repeat(scene.light_color[:L], N, axis=0),
                             jnp.repeat(scene.light_intensity[:L], N))
        c = jnp.where(lit[:, None], c, 0.0)
        radiance += jnp.sum(c.reshape(L, N, 3), axis=0)
    radiance = radiance * throughput

    # perfect mirror continuation scaled by the specular map (refl,
    # sampled above); rays whose reflected throughput is exactly zero
    # contribute nothing downstream — retire them so the alive-masked
    # kernels skip their blocks (estimator-identical: the reference still
    # recurses on them, raytracer.cpp:203-206, but multiplies by zero)
    continue_mask = hit_mask & (depth < max_depth)
    if prune_zero:
        continue_mask &= jnp.any(throughput * refl > 0.0, axis=-1)
    new_throughput = jnp.where(continue_mask[:, None], throughput * refl, 0.0)
    new_dir = shade.reflect(dirs, attrs.s_normal)
    new_orig = attrs.point + attrs.s_normal * BIAS

    carry = (jnp.where(continue_mask[:, None], new_orig, orig),
             jnp.where(continue_mask[:, None], new_dir, dirs),
             new_throughput,
             continue_mask)
    return carry, radiance


def _octant(dirs: jax.Array) -> jax.Array:
    """3-bit direction octant per ray [N] (packet-coherence sort key)."""
    from orion_tpu.ops.reorder import direction_octant

    return direction_octant(dirs)


def trace_wavefront(scene: Scene, orig: jax.Array, dirs: jax.Array,
                    key: jax.Array, *, max_depth: int, light_samples: int = 2,
                    mode: Optional[str] = None,
                    intersect: Optional[IntersectFn] = None,
                    reference_frame: bool = False,
                    normal_maps: bool = False,
                    sort_bounces: bool = False,
                    shadow_intersect: Optional[IntersectFn] = None,
                    prune_zero: bool = True,
                    remat: bool = False) -> jax.Array:
    """Trace a batch of rays to completion; returns radiance [N, 3].

    mode: "path" | "whitted" | None (auto: whitted iff the scene has point
    lights, matching raytracer.cpp:131). normal_maps enables tangent-space
    bump mapping (off by default — PARITY.md).

    remat: False | True | "hits". True wraps each bounce in
    jax.checkpoint — the backward pass recomputes a bounce's
    intermediates from its (small) carry instead of storing ~dozens of
    [N,3] residuals per (sample, depth) step in HBM. "hits" additionally
    saves each bounce's hit records (8 bytes/ray) under a
    save_only_these_names policy, so the backward pass rematerializes
    only the cheap shading math and never re-runs an intersection
    kernel. Forward-only renders ignore it; training wants "hits".

    sort_bounces: False | True | "octant" | "morton". After each bounce,
    reorder the wavefront so the Pallas packet kernels see coherent
    blocks on secondary rays; radiance is un-permuted at the end.
    "octant" (== True, back-compat) keys on (dead-last, direction
    octant); "morton" additionally keys on the morton code of the ray
    origin inside the scene AABB — the production choice for enclosed
    scenes, where bounce origins scatter across finely subdivided
    geometry (ops/reorder.py). Changes which RNG slot each ray draws
    (still a valid, deterministic estimator; images differ from
    unsorted at the noise level). Off by default.
    """
    if mode is None:
        mode = "whitted" if scene.num_lights > 0 else "path"
    if intersect is None:
        intersect = default_intersect()
    if remat == "hits":
        intersect = _tag_hits(intersect)
        if shadow_intersect is not None:
            shadow_intersect = _tag_hits(shadow_intersect)
    N = orig.shape[0]
    throughput = jnp.ones((N, 3), jnp.float32)
    alive = jnp.ones((N,), bool)

    if mode == "path":
        def bounce(carry, depth):
            return _path_bounce(scene, carry, depth, key, light_samples,
                                max_depth, intersect, reference_frame,
                                normal_maps)
    elif mode == "whitted":
        def bounce(carry, depth):
            return _whitted_bounce(scene, carry, depth, max_depth, intersect,
                                   normal_maps, shadow_intersect, prune_zero)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if remat == "hits":
        # save ONLY the (tiny) hit records; the backward pass then reuses
        # them instead of re-walking the acceleration structure, and
        # recomputes the cheap shading/sampling math from each bounce's
        # carry — intersection kernels run exactly once per bounce
        bounce = jax.checkpoint(
            bounce,
            policy=jax.checkpoint_policies.save_only_these_names("hit"))
    elif remat:
        bounce = jax.checkpoint(bounce)

    depths = jnp.arange(max_depth + 1)

    if not sort_bounces:
        _, radiance_per_depth = jax.lax.scan(bounce, (orig, dirs, throughput,
                                                      alive), depths)
        return jnp.sum(radiance_per_depth, axis=0)

    pix = jnp.arange(N, dtype=jnp.int32)
    acc = jnp.zeros((N, 3), jnp.float32)

    if sort_bounces == "morton":
        from orion_tpu.ops.reorder import coherence_key, scene_bounds

        s_lo, s_hi = scene_bounds(scene)

        def sort_key(orig, dirs, alive):
            return coherence_key(orig, dirs, alive, s_lo, s_hi)
    else:
        def sort_key(orig, dirs, alive):
            return jnp.where(alive, _octant(dirs), 8)

    def body(carry, depth):
        orig, dirs, throughput, alive, pix, acc = carry
        (orig, dirs, throughput, alive), radiance = bounce(
            (orig, dirs, throughput, alive), depth)
        acc = acc + radiance
        perm = jnp.argsort(sort_key(orig, dirs, alive), stable=True)
        carry = tuple(a[perm] for a in
                      (orig, dirs, throughput, alive, pix, acc))
        return carry, None

    carry, _ = jax.lax.scan(body, (orig, dirs, throughput, alive, pix, acc),
                            depths)
    _, _, _, _, pix, acc = carry
    return jnp.zeros((N, 3), jnp.float32).at[pix].set(acc)


@partial(jax.jit, static_argnames=("samples", "max_depth", "light_samples",
                                   "mode", "intersect", "reference_frame",
                                   "shared_jitter", "sample_offset",
                                   "normal_maps", "sort_bounces",
                                   "shadow_intersect", "prune_zero",
                                   "remat", "fold_samples"))
def render(scene: Scene, camera: Camera, key: jax.Array, *,
           samples: int = 1, max_depth: int = 1, light_samples: int = 2,
           mode: Optional[str] = None,
           intersect: Optional[IntersectFn] = None,
           reference_frame: bool = False,
           shared_jitter: bool = True,
           sample_offset: int = 0,
           normal_maps: bool = False,
           sort_bounces: bool = False,
           shadow_intersect: Optional[IntersectFn] = None,
           prune_zero: bool = True,
           remat: bool = False,
           fold_samples: bool = False) -> jax.Array:
    """Render an [H, W, 3] image with `samples` jittered samples per pixel.

    shared_jitter=True replicates the reference's shared sub-pixel pattern
    (one jitter offset per sample index, used by every pixel,
    raytracer.cpp:53-63); False gives every pixel its own jitter.

    sample_offset shifts the per-sample key indices: sample i draws keys
    from fold_in(key, sample_offset + i), so chunked/checkpointed renders
    composing [0,n) + [n,m) bit-match a single [0,m) render (io/checkpoint).

    fold_samples=True traces all `samples` as ONE [S*H*W] wavefront
    instead of a lax.scan over per-sample wavefronts: S x the rays in
    flight per kernel launch, which keeps the chip saturated at small
    resolutions (the fwd+bwd training config is 256^2). Same estimator,
    different RNG stream than the scanned form (each folded ray draws
    from its own slot of the batched uniforms), so images differ at the
    noise level; checkpoint composition via sample_offset still works at
    whole-call granularity.
    """
    H, W = camera.yres, camera.xres
    px = 2.0 / W
    py = 2.0 / H

    if fold_samples:
        ks = jnp.stack([jax.random.fold_in(key, k + sample_offset)
                        for k in range(samples)])
        k_jits = jax.vmap(lambda k: jax.random.split(k)[0])(ks)
        if shared_jitter:
            jit = jax.vmap(lambda k: jax.random.uniform(k, (2,)))(k_jits)
        else:
            jit = jax.vmap(lambda k: jax.random.uniform(k, (2, H, W)))(k_jits)
        orig, dirs = jax.vmap(
            lambda j: primary_rays(camera, j[0] * px, j[1] * py))(jit)
        orig = orig.reshape(samples * H * W, 3)
        dirs = dirs.reshape(samples * H * W, 3)
        k_trace = jax.random.split(jax.random.fold_in(key, sample_offset))[1]
        radiance = trace_wavefront(scene, orig, dirs, k_trace,
                                   max_depth=max_depth,
                                   light_samples=light_samples, mode=mode,
                                   intersect=intersect,
                                   reference_frame=reference_frame,
                                   normal_maps=normal_maps,
                                   sort_bounces=sort_bounces,
                                   shadow_intersect=shadow_intersect,
                                   prune_zero=prune_zero, remat=remat)
        return jnp.mean(radiance.reshape(samples, H, W, 3), axis=0)

    def sample_body(acc, k):
        k_jit, k_trace = jax.random.split(
            jax.random.fold_in(key, k + sample_offset))
        if shared_jitter:
            jit = jax.random.uniform(k_jit, (2,))
            jx, jy = jit[0] * px, jit[1] * py
        else:
            jit = jax.random.uniform(k_jit, (2, H, W))
            jx, jy = jit[0] * px, jit[1] * py
        orig, dirs = primary_rays(camera, jx, jy)
        radiance = trace_wavefront(scene, orig, dirs, k_trace,
                                   max_depth=max_depth,
                                   light_samples=light_samples, mode=mode,
                                   intersect=intersect,
                                   reference_frame=reference_frame,
                                   normal_maps=normal_maps,
                                   sort_bounces=sort_bounces,
                                   shadow_intersect=shadow_intersect,
                                   prune_zero=prune_zero, remat=remat)
        return acc + radiance.reshape(H, W, 3), None

    acc0 = jnp.zeros((H, W, 3), jnp.float32)
    acc, _ = jax.lax.scan(sample_body, acc0, jnp.arange(samples))
    return acc / float(samples)
