"""Bisect the non-kernel time of the nanosuit Whitted render.

Round-2 bisect (experiments/exp_mixed.py part2) showed the 1024^2 4spp
render spends ~1.07 s in intersection kernels and ~0.88 s elsewhere.
This times each non-kernel piece at the same N = 1M ray scale:

  - pack_ray_rows (the [N,3] -> [8,N_pad] transpose every kernel call)
  - hit_attributes (the [T,25] row gather + differentiable recompute)
  - each material sample (take_rows tables + texture atlas texel gathers)
  - phong_color, emissive term
  - one full _whitted_bounce step vs its parts

Run on TPU: `python experiments/exp_overhead.py`; JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(go, iters=5):
    import jax
    import jax.numpy as jnp

    r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import orion_tpu.render as _  # noqa: F401  (package import side effects)
    from orion_tpu.camera import primary_rays
    from orion_tpu.engine import prepare
    from orion_tpu.ops import shade
    from orion_tpu.ops.intersect import hit_attributes
    from orion_tpu.ops.pallas_intersect import pack_ray_rows
    from orion_tpu.render import _whitted_bounce, render

    ps = prepare("/root/reference/assets/nanosuit.rtc", xres=1024, yres=1024)
    orig, dirs = primary_rays(ps.camera, 0.0, 0.0)
    N = orig.shape[0]
    key = jax.random.key(0)

    def emit(name, dt):
        print(json.dumps({"piece": name, "seconds": round(dt, 4),
                          "per_1M_rays_ms": round(dt * 1e3 * 1e6 / N, 2)}),
              flush=True)

    pack_jit = jax.jit(lambda o, d: pack_ray_rows(o, d, N, None))
    emit("pack_ray_rows", timeit(lambda: pack_jit(orig, dirs)))

    hit = ps.intersect(ps.scene, orig, dirs)
    hit = jax.tree.map(lambda x: x.block_until_ready(), hit)

    emit("intersect_closest", timeit(
        lambda: ps.intersect(ps.scene, orig, dirs).t))
    emit("intersect_anyhit", timeit(
        lambda: ps.shadow_intersect(ps.scene, orig, dirs).t))

    attrs_fn = jax.jit(lambda h: hit_attributes(ps.scene, orig, dirs, h))
    emit("hit_attributes", timeit(lambda: attrs_fn(hit)))
    attrs = attrs_fn(hit)

    emit("diffuse_color", timeit(jax.jit(
        lambda: shade.diffuse_color(ps.scene, attrs.mat_id, attrs.uv))))
    emit("specular_color", timeit(jax.jit(
        lambda: shade.specular_color(ps.scene, attrs.mat_id, attrs.uv))))
    emit("ambient_color", timeit(jax.jit(
        lambda: shade.ambient_color(ps.scene, attrs.mat_id, attrs.uv))))

    L = ps.scene.num_lights
    lpos = jnp.repeat(ps.scene.light_pos[:L], N, axis=0)[:N]
    lcol = jnp.repeat(ps.scene.light_color[:L], N, axis=0)[:N]
    lint = jnp.repeat(ps.scene.light_intensity[:L], N)[:N]
    emit("phong_color", timeit(jax.jit(
        lambda: shade.phong_color(ps.scene, attrs.mat_id, attrs.uv, dirs,
                                  attrs.s_normal, attrs.point, lpos, lcol,
                                  lint))))

    carry = (orig, dirs, jnp.ones((N, 3), jnp.float32),
             jnp.ones((N,), bool))
    bounce_fn = jax.jit(lambda c: _whitted_bounce(
        ps.scene, c, jnp.int32(0), 2, ps.intersect,
        shadow_intersect=ps.shadow_intersect))
    emit("whitted_bounce_full", timeit(lambda: bounce_fn(carry)[1], iters=3))

    emit("render_4spp_d2", timeit(lambda: render(
        ps.scene, ps.camera, key, samples=4, max_depth=2, light_samples=1,
        mode="whitted", intersect=ps.intersect,
        shadow_intersect=ps.shadow_intersect), iters=2))


if __name__ == "__main__":
    main()
