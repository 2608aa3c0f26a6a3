"""Engine: scene preparation, backend selection, render orchestration, stats.

The TPU re-design of RayTracer::traceRTC (/root/reference/orion/
raytracer.cpp:19-103): parse the .rtc, load and flatten the scene, build
the acceleration structure, pick the fastest intersection backend for the
current JAX backend and scene size, render, and report statistics.

Backend selection:
  - small scenes (<= BRUTE_MAX_TRIS valid triangles): brute-force sweep —
    the Pallas streamed-chunk kernel on TPU, the jnp fallback elsewhere.
    For a 36-triangle cornell box a BVH walk costs more than testing
    everything.
  - large scenes: flattened BVH — the Pallas packet-traversal kernel on
    TPU (leaf bundles sized for VPU planes), the batched lax.while_loop
    walk elsewhere.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from orion_tpu.accel.bvh import DEFAULT_LEAF, SAH, BVH, BuildStats, build_bvh
from orion_tpu.camera import Camera, camera_from_rtc
from orion_tpu.io.rtc import RTCData
from orion_tpu.render import IntersectFn
from orion_tpu.scene import Scene, load_scene

BRUTE_MAX_TRIS = 1024
# Pallas packet-traversal tuning (nanosuit sweeps,
# experiments/exp_bvh_sweep.py, 2026-08): 128-triangle leaves keep the
# tree shallow (leaf planes are full-width VPU work either way), and
# 256-ray blocks beat 1024 on both coherent and shuffled batches
TPU_LEAF_SIZE = 128
TPU_RAY_BLOCK = 256


@dataclasses.dataclass
class PreparedScene:
    """A scene plus everything needed to render it fast."""

    scene: Scene
    rtc: RTCData
    camera: Camera
    intersect: IntersectFn
    backend: str                       # "brute-pallas" | "brute-jnp" | ...
    bvh: Optional[BVH] = None
    bvh_stats: Optional[BuildStats] = None
    build_seconds: float = 0.0
    # occlusion-only (any-hit) backend for Whitted shadow rays, where only
    # hit.mask is consumed; None => reuse `intersect`
    shadow_intersect: Optional[IntersectFn] = None
    # how the backend was chosen (for refresh_octant_order rebuilds)
    strategy: str = SAH
    force_backend: Optional[str] = None
    order_signs: tuple = (1.0, 1.0, 1.0)


def select_intersect(scene: Scene, *, strategy: str = SAH,
                     force: Optional[str] = None,
                     order_signs=(1.0, 1.0, 1.0)):
    """Choose (intersect_fn, backend_name, bvh, stats) for a scene.

    force: "brute" | "bvh" overrides the size heuristic; the fully
    qualified forms "brute-jnp" | "brute-pallas" | "bvh-jnp" |
    "bvh-pallas" also pin the implementation.
    """
    on_tpu = jax.default_backend() == "tpu"
    force_impl = None
    if force and "-" in force:
        force, force_impl = force.split("-", 1)
    want_bvh = (scene.num_triangles > BRUTE_MAX_TRIS
                if force is None else force == "bvh")

    if not want_bvh:
        use_pallas = on_tpu if force_impl is None else force_impl == "pallas"
        if use_pallas:
            from orion_tpu.ops.pallas_intersect import intersect_brute_pallas

            return intersect_brute_pallas, "brute-pallas", None, None
        from orion_tpu.ops.intersect import intersect_brute

        return intersect_brute, "brute-jnp", None, None

    use_pallas = on_tpu if force_impl is None else force_impl == "pallas"
    if use_pallas:
        from orion_tpu.ops.pallas_bvh import (RESIDENT_MAX_BUNDLED,
                                              make_bvh_intersect_pallas)

        bvh, stats = build_bvh(np.asarray(scene.tri_v0),
                               np.asarray(scene.tri_e1),
                               np.asarray(scene.tri_e2),
                               np.asarray(scene.tri_valid),
                               strategy=strategy, leaf_size=TPU_LEAF_SIZE,
                               leaf_width=TPU_LEAF_SIZE,
                               order_signs=order_signs)
        if bvh.num_bundled <= RESIDENT_MAX_BUNDLED or not on_tpu:
            fn = make_bvh_intersect_pallas(bvh, scene,
                                           ray_block=TPU_RAY_BLOCK)
            return fn, "bvh-pallas", bvh, stats
        # very large scenes: one resident tree would exceed the VMEM cap.
        # Decompose into spatial treelets, each its own resident tree; the
        # kernel walks them sequentially and hits merge by nearest t.
        fn, stats = _make_treelet_intersect(scene, strategy, order_signs)
        return fn, "bvh-pallas-treelet", None, stats
    # the jnp walk prefers small leaves
    bvh, stats = build_bvh(np.asarray(scene.tri_v0),
                           np.asarray(scene.tri_e1),
                           np.asarray(scene.tri_e2),
                           np.asarray(scene.tri_valid),
                           strategy=strategy, leaf_size=DEFAULT_LEAF,
                           order_signs=order_signs)
    from orion_tpu.ops.bvh_traverse import make_bvh_intersect

    return make_bvh_intersect(bvh), "bvh-jnp", bvh, stats


# Megakernel preference for path scenes past the fused brute gate,
# best-first (measured on the 35k-tri subdivided cornell, 256^2 16 spp —
# BENCHMARKS.md): the sorted-wavefront bounce kernel beats the resident
# walk ~3x on enclosed scenes (bounce-ray divergence is the walk's worst
# case); the walk stays as fallback. "binned" (ops/pallas_binned.py)
# joins the list ahead of whichever it beats once its end-to-end TPU
# number lands.
BIG_PATH_ORDER = ("bounce", "walk")


def make_big_path_renderer(scene: Scene, camera, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           strategy: str = SAH,
                           order_signs=(1.0, 1.0, 1.0),
                           order: tuple = None):
    """Best available path megakernel for scenes past the fused brute
    gate: returns (fn(key) -> [H, W, 3], backend_name).

    Candidates (BIG_PATH_ORDER, best-first) are tried in turn; a
    candidate that raises ValueError (over the VMEM residency cap,
    outside its gate) falls through to the next. Raises ValueError when
    none fits — callers fall back to the treelet wavefront.

    This is the selection point the reference never needs: its traversal
    IS production (/root/reference/orion/avx/sbvh.cpp:26-83); here the
    best backend depends on scene scale and bounce coherence.
    """
    from orion_tpu.ops.pallas_bvh_path import (bounce_textured_supported,
                                               bvh_path_supported)

    textured = not bvh_path_supported(scene)
    if textured and not bounce_textured_supported(scene):
        raise ValueError("scene outside the bvh-path gate "
                         "(textures / emitters)")
    errs = []
    # textured path scenes: only the bounce pipeline resolves texels
    # per bounce (VERDICT r4 #4); the resident-walk fallback stays
    # untextured-only
    for cand in (order or (("bounce",) if textured else BIG_PATH_ORDER)):
        try:
            if cand == "bounce":
                from orion_tpu.ops.pallas_bounce import \
                    make_bounce_path_renderer

                return make_bounce_path_renderer(
                    scene, camera, samples=samples, max_depth=max_depth,
                    light_samples=light_samples), "bounce-pallas"
            if cand == "binned":
                from orion_tpu.ops.pallas_binned import \
                    make_binned_path_renderer

                return make_binned_path_renderer(
                    scene, camera, samples=samples, max_depth=max_depth,
                    light_samples=light_samples), "binned-pallas"
            if cand == "walk":
                from orion_tpu.ops.pallas_bvh_path import \
                    make_bvh_path_renderer

                return make_bvh_path_renderer(
                    scene, camera, samples=samples, max_depth=max_depth,
                    light_samples=light_samples, strategy=strategy,
                    order_signs=order_signs), "bvh-path-pallas"
            raise ValueError(f"unknown big-path candidate {cand!r}")
        except ValueError as e:
            errs.append(f"{cand}: {e}")
    raise ValueError("no big-path megakernel fits: " + "; ".join(errs))


# partition headroom: bundled rows inflate ~1.5x over triangle count at
# leaf 128 (padding); 1.8 keeps every part under the cap with margin
TREELET_MARGIN = 1.8


def _make_treelet_intersect(scene: Scene, strategy: str, order_signs):
    """Treelet decomposition for scenes beyond the VMEM residency cap.

    Spatial slabs (accel/bvh.py partition_triangles) each get their own
    BVH + Pallas closure; the returned IntersectFn walks them in sequence
    and keeps the nearest hit. Each part's root AABB is tight (the slabs
    are spatially contiguous), so a ray block that misses a part leaves
    that call in one while-step — the cost of distant treelets is near
    zero. The returned fn carries `any_hit_variant`: the occlusion
    closure chain, which shrinks the alive mask between parts (a ray
    occluded by part k skips parts k+1..).
    """
    import jax.numpy as jnp

    from orion_tpu.accel.bvh import partition_triangles
    from orion_tpu.ops.intersect import Hit
    from orion_tpu.ops.pallas_bvh import (RESIDENT_MAX_BUNDLED,
                                          _bvh_device_layout,
                                          make_bvh_intersect_pallas)

    v0 = np.asarray(scene.tri_v0)
    e1 = np.asarray(scene.tri_e1)
    e2 = np.asarray(scene.tri_e2)
    valid = np.asarray(scene.tri_valid)
    max_tris = int(RESIDENT_MAX_BUNDLED / TREELET_MARGIN)
    queue = partition_triangles(v0, e1, e2, valid, max_tris)
    closers, shadow_closers = [], []
    total = BuildStats()
    while queue:
        mask = queue.pop(0)
        bvh, st = build_bvh(v0, e1, e2, mask, strategy=strategy,
                            leaf_size=TPU_LEAF_SIZE,
                            leaf_width=TPU_LEAF_SIZE,
                            order_signs=order_signs)
        if bvh.num_bundled > RESIDENT_MAX_BUNDLED:
            # pathological padding inflation: split this slab again
            queue.extend(partition_triangles(v0, e1, e2, mask,
                                             int(mask.sum()) // 2 + 1))
            continue
        layout = _bvh_device_layout(bvh)
        closers.append(make_bvh_intersect_pallas(
            bvh, scene, ray_block=TPU_RAY_BLOCK, layout=layout))
        shadow_closers.append(make_bvh_intersect_pallas(
            bvh, scene, ray_block=TPU_RAY_BLOCK, any_hit=True,
            layout=layout))
        total.nodes += st.nodes
        total.leaves += st.leaves
        total.max_depth = max(total.max_depth, st.max_depth)
        total.padded_tris += st.padded_tris

    def intersect(scene, orig, dirs, *, alive=None) -> Hit:
        t = jnp.full(orig.shape[:1], jnp.inf, jnp.float32)
        tri = jnp.full(orig.shape[:1], -1, jnp.int32)
        for fn in closers:
            h = fn(scene, orig, dirs, alive=alive)
            better = h.t < t
            t = jnp.where(better, h.t, t)
            tri = jnp.where(better, h.tri_id, tri)
        return Hit(t=t, tri_id=tri)

    def any_hit_intersect(scene, orig, dirs, *, alive=None) -> Hit:
        n = orig.shape[0]
        occluded = jnp.zeros(n, bool)
        tri = jnp.full(n, -1, jnp.int32)
        live = (jnp.ones(n, bool) if alive is None
                else jnp.asarray(alive, bool))
        for fn in shadow_closers:
            h = fn(scene, orig, dirs, alive=live & ~occluded)
            new = h.mask & ~occluded
            tri = jnp.where(new, h.tri_id, tri)
            occluded = occluded | (h.mask & live)
        return Hit(t=jnp.where(occluded, 1.0, jnp.inf), tri_id=tri)

    intersect.any_hit_variant = any_hit_intersect
    intersect.num_treelets = len(closers)
    return intersect, total


def prepare(rtc_path: str | Path, *, strategy: str = SAH,
            force_backend: Optional[str] = None,
            load_textures: bool = True,
            xres: Optional[int] = None,
            yres: Optional[int] = None) -> PreparedScene:
    """Load an .rtc scene and select the intersection backend."""
    t0 = time.perf_counter()
    scene, rtc = load_scene(rtc_path, load_textures=load_textures)
    if xres is not None:
        rtc.xres = xres
    if yres is not None:
        rtc.yres = yres
    from orion_tpu.validate import validate_rtc, validate_scene

    validate_rtc(rtc)
    validate_scene(scene)
    camera = camera_from_rtc(rtc)
    # bake near-first child order for the camera's direction octant into
    # the BVH flattening (~40% fewer leaf tests on coherent batches;
    # measured: nanosuit primary tri-tests/ray 11.5 -> 6.5)
    signs = octant_signs(camera.front)
    fn, backend, bvh, stats, shadow_fn = _select_with_shadow(
        scene, strategy, force_backend, signs)
    return PreparedScene(scene=scene, rtc=rtc, camera=camera, intersect=fn,
                         backend=backend, bvh=bvh, bvh_stats=stats,
                         build_seconds=time.perf_counter() - t0,
                         shadow_intersect=shadow_fn, strategy=strategy,
                         force_backend=force_backend, order_signs=signs)


def octant_signs(front) -> tuple:
    """Per-axis direction signs of a dominant ray direction (zeros -> +)."""
    return tuple(float(s) if s != 0 else 1.0
                 for s in np.sign(np.asarray(front)))


def _select_with_shadow(scene: Scene, strategy: str,
                        force_backend: Optional[str], signs: tuple):
    """select_intersect + the Whitted any-hit shadow variant when useful."""
    fn, backend, bvh, stats = select_intersect(scene, strategy=strategy,
                                               force=force_backend,
                                               order_signs=signs)
    shadow_fn = None
    if backend == "bvh-pallas-treelet" and scene.num_lights > 0:
        shadow_fn = getattr(fn, "any_hit_variant", None)
    elif backend == "bvh-pallas" and scene.num_lights > 0:
        # Whitted scenes get an any-hit occlusion kernel for shadow rays;
        # rebuild both closures over ONE shared device layout (otherwise
        # each holds its own copy of the node + triangle buffers). Path
        # scenes never consume shadow_intersect (NEE needs nearest-hit
        # emitter identity) — skip the build entirely.
        from orion_tpu.ops.pallas_bvh import (_bvh_device_layout,
                                              make_bvh_intersect_pallas)

        layout = _bvh_device_layout(bvh)
        fn = make_bvh_intersect_pallas(bvh, scene, ray_block=TPU_RAY_BLOCK,
                                       layout=layout)
        shadow_fn = make_bvh_intersect_pallas(bvh, scene,
                                              ray_block=TPU_RAY_BLOCK,
                                              any_hit=True, layout=layout)
    return fn, backend, bvh, stats, shadow_fn


def refresh_octant_order(ps: PreparedScene, front) -> PreparedScene:
    """Re-bake the BVH child order when the camera has moved to a new
    direction octant (the viewer's fly camera invalidates the order baked
    at prepare time — VERDICT round 1: a stale hint silently degrades to
    default-order traversal, measured +77% triangle tests on primaries).

    Same tree, new flatten: node shapes are unchanged, so the Pallas
    kernels' compiled code is reused — only the node/triangle device
    buffers are rebuilt (milliseconds with the native builder). No-op for
    brute backends or when the octant is unchanged.
    """
    signs = octant_signs(front)
    if ps.bvh is None or signs == tuple(ps.order_signs):
        return ps
    fn, backend, bvh, stats, shadow_fn = _select_with_shadow(
        ps.scene, ps.strategy, ps.force_backend, signs)
    return dataclasses.replace(ps, intersect=fn, backend=backend, bvh=bvh,
                               bvh_stats=stats, shadow_intersect=shadow_fn,
                               order_signs=signs)


def render_prepared(ps: PreparedScene, key, *, samples: int = 1,
                    light_samples: int = 1,
                    max_depth: Optional[int] = None,
                    mode: Optional[str] = None):
    """Render a PreparedScene; max_depth defaults to the rtc recursion
    level EXACTLY (raytracer.cpp:29,203-206 cap trace() at
    rtc.recursion_level — nanosuit.rtc/hindu.rtc say 0: no bounces)."""
    from orion_tpu.render import render

    if max_depth is None:
        max_depth = int(ps.rtc.recursion_level)
    return render(ps.scene, ps.camera, key, samples=samples,
                  max_depth=max_depth, light_samples=light_samples,
                  mode=mode, intersect=ps.intersect,
                  shadow_intersect=ps.shadow_intersect)


def render_report(ps: PreparedScene, *, samples: int, light_samples: int,
                  max_depth: int, seconds: float) -> dict:
    """Structured per-render statistics (SURVEY.md §5 observability row;
    the reference only prints a triangle count, raytracer.cpp:305-310)."""
    H, W = ps.rtc.yres, ps.rtc.xres
    primary = H * W * samples
    shadow_per_hit = (ps.scene.num_lights if ps.scene.num_lights > 0
                      else ps.scene.num_emissive * light_samples)
    return {
        "resolution": [W, H],
        "samples": samples,
        "light_samples": light_samples,
        "max_depth": max_depth,
        "triangles": ps.scene.num_triangles,
        "meshes": ps.scene.num_meshes,
        "backend": ps.backend,
        "jax_backend": jax.default_backend(),
        "bvh_nodes": ps.bvh_stats.nodes if ps.bvh_stats else 0,
        "scene_build_seconds": round(ps.build_seconds, 3),
        "render_seconds": round(seconds, 3),
        "primary_rays": primary,
        "primary_rays_per_s": round(primary / max(seconds, 1e-9), 1),
        "est_shadow_rays_per_primary_bounce": shadow_per_hit,
    }
