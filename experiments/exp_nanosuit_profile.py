"""Where does nanosuit whitted time go? (BASELINE config 4 decomposition)

Times each stage of the 1024x1024 Whitted wavefront on the real chip:
  - full render at 1 spp (the unit the 64-spp bench scales linearly from)
  - closest-hit BVH kernel alone on the 1M primary rays
  - any-hit shadow kernel alone on the same rays
  - hit_attributes + Phong shading alone (the XLA glue between kernels)

Timing per tpu-tunnel etiquette: dispatch ITERS calls back-to-back,
fetch ONE value at the end (block_until_ready does not force execution
through the tunnel).
"""

import json
import time

import jax
import jax.numpy as jnp

from orion_tpu.camera import primary_rays
from orion_tpu.engine import prepare
from orion_tpu.ops.intersect import hit_attributes, take_rows
from orion_tpu.ops import shade
from orion_tpu.render import render

ASSETS = "/root/reference/assets"
ITERS = 4

ps = prepare(f"{ASSETS}/nanosuit.rtc", xres=1024, yres=1024)
scene, cam = ps.scene, ps.camera
print(f"backend={ps.backend} tris={scene.num_triangles} "
      f"bvh_nodes={ps.bvh_stats.nodes if ps.bvh_stats else 0}", flush=True)

key = jax.random.key(0)
orig, dirs = primary_rays(cam, 0.0003, 0.0007)
orig, dirs = jax.device_put(orig), jax.device_put(dirs)
N = orig.shape[0]


def timeit(name, go, fetch, iters=ITERS):
    go()                       # warm (compile)
    _ = fetch(go())            # force warm execution
    t0 = time.perf_counter()
    for _ in range(iters):
        out = go()
    _ = fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"stage": name, "seconds": round(dt, 4),
                      "m_rays_per_s": round(N / dt / 1e6, 2)}), flush=True)
    return dt


# 1. full whitted render, 1 spp, depth 2 (the bench shape)
t_full = timeit(
    "full_render_1spp_d2",
    lambda: render(scene, cam, key, samples=1, max_depth=2,
                   light_samples=1, mode="whitted",
                   intersect=ps.intersect,
                   shadow_intersect=ps.shadow_intersect),
    lambda img: float(jnp.sum(img)))

# depth 0 variant: one closest-hit + one shadow stack, no reflections
t_d0 = timeit(
    "full_render_1spp_d0",
    lambda: render(scene, cam, key, samples=1, max_depth=0,
                   light_samples=1, mode="whitted",
                   intersect=ps.intersect,
                   shadow_intersect=ps.shadow_intersect),
    lambda img: float(jnp.sum(img)))

# 2. closest-hit kernel alone on the primary wavefront
closest = jax.jit(lambda o, d: ps.intersect(scene, o, d))
t_closest = timeit("closest_hit_primary", lambda: closest(orig, dirs),
                   lambda h: float(jnp.sum(h.t * (h.tri_id >= 0))))

# 3. any-hit shadow kernel alone (shadow rays toward the single light)
l_pos = scene.light_pos[0]
sh_fn = ps.shadow_intersect if ps.shadow_intersect is not None \
    else ps.intersect


@jax.jit
def shadow(o, d):
    h0 = ps.intersect(scene, o, d)
    a = hit_attributes(scene, o, d, h0)
    so = a.point + 1e-3 * a.g_normal
    return sh_fn(scene, so, l_pos[None, :] - a.point, alive=h0.mask)


# time (closest + attrs + any-hit); subtracting t_closest isolates any-hit
t_shadow_chain = timeit("closest+attrs+any_hit",
                        lambda: shadow(orig, dirs),
                        lambda h: float(jnp.sum(h.t)))


# 4. attrs + phong shading alone at a fixed hit record
hit0 = closest(orig, dirs)
hit0 = jax.tree.map(jax.device_put, hit0)


@jax.jit
def shade_only(o, d, h):
    a = hit_attributes(scene, o, d, h)
    ka = shade.ambient_color(scene, a.mat_id, a.uv)
    kd = shade.diffuse_color(scene, a.mat_id, a.uv)
    ks = shade.specular_color(scene, a.mat_id, a.uv)
    shin = take_rows(scene.mat_shininess, a.mat_id)
    c = shade.phong_eval(ka, kd, ks, shin, d, a.s_normal, a.point,
                         l_pos[None, :].repeat(a.point.shape[0], 0),
                         scene.light_color[0][None, :].repeat(
                             a.point.shape[0], 0),
                         scene.light_intensity[0].repeat(a.point.shape[0]))
    return jnp.sum(c)


t_shade = timeit("attrs+phong_shade", lambda: shade_only(orig, dirs, hit0),
                 float)

print(json.dumps({
    "full_d2": round(t_full, 4), "full_d0": round(t_d0, 4),
    "closest": round(t_closest, 4),
    "any_hit_est": round(t_shadow_chain - t_closest - t_shade, 4),
    "shade": round(t_shade, 4),
    "glue_est_d0": round(t_d0 - t_shadow_chain - t_shade, 4),
}), flush=True)
