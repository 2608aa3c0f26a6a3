"""Round-2 follow-ups, one TPU process (crash candidate LAST):

1. Backward: jax.checkpoint policy variants on top of per-bounce remat.
2. Whitted bisect: how much of the nanosuit 1024^2 render is kernel time
   vs wavefront overhead (attrs/shading/assembly).
3. bvh-jnp on TPU at growing ray counts — the round-1 "TPU worker
   crashed: kernel fault" repro. Runs last; a crash leaves 1+2 recorded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(go, iters=3):
    import jax
    import jax.numpy as jnp

    r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def part1_bwd_policies():
    import jax
    import jax.numpy as jnp

    import orion_tpu.render as R
    from orion_tpu.engine import prepare
    from orion_tpu.optim import make_loss

    xres = yres = 256
    samples, depth = 4, 4
    primary = xres * yres * samples
    ps = prepare("/root/reference/assets/cornell-box.rtc",
                 xres=xres, yres=yres)
    key = jax.random.key(0)
    target = jnp.zeros((yres, xres, 3), jnp.float32)
    params = {"mat_diffuse": ps.scene.mat_diffuse,
              "tri_v0": ps.scene.tri_v0}

    policies = {
        "remat_full": None,
        "remat_save_dots": jax.checkpoint_policies.dots_saveable,
    }
    import functools
    orig_checkpoint = jax.checkpoint
    for name, pol in policies.items():
        if pol is not None:
            jax.checkpoint = functools.partial(orig_checkpoint, policy=pol)
        try:
            # NOTE: `import orion_tpu.render as R` binds R to the *render
            # function* (the package's `from .render import render` shadows
            # the submodule attribute), so clear_cache lives on R itself
            R.clear_cache()
            loss = make_loss(ps.scene, ps.camera, samples=samples,
                             max_depth=depth, light_samples=2, mode="path",
                             intersect=ps.intersect, remat=True)
            grad_fn = jax.jit(jax.value_and_grad(loss))
            dt = timeit(lambda: grad_fn(params, key, target), iters=5)
            print(json.dumps({"variant": name, "seconds": round(dt, 4),
                              "fwd_bwd_rays_per_s":
                                  round(primary / dt, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
        finally:
            jax.checkpoint = orig_checkpoint


def part2_whitted_bisect():
    import jax
    import jax.numpy as jnp

    from orion_tpu.camera import primary_rays
    from orion_tpu.engine import prepare
    from orion_tpu.render import render

    ps = prepare("/root/reference/assets/nanosuit.rtc", xres=1024,
                 yres=1024)
    orig, dirs = primary_rays(ps.camera, 0.0, 0.0)
    key = jax.random.key(0)

    dt_hit = timeit(lambda: ps.intersect(ps.scene, orig, dirs).t)
    dt_shadow = timeit(
        lambda: ps.shadow_intersect(ps.scene, orig, dirs).t)
    dt_render = timeit(lambda: render(
        ps.scene, ps.camera, key, samples=4, max_depth=2, light_samples=1,
        mode="whitted", intersect=ps.intersect,
        shadow_intersect=ps.shadow_intersect), iters=2)
    # whitted 4spp depth cap 2: per sample 3 closest-hit passes (depths
    # 0..2) + 3 shadow passes (1 light)
    kernel_est = 4 * (3 * dt_hit + 3 * dt_shadow)
    print(json.dumps({"measure": "whitted_bisect",
                      "closest_1Mray_s": round(dt_hit, 4),
                      "anyhit_1Mray_s": round(dt_shadow, 4),
                      "render_4spp_s": round(dt_render, 4),
                      "kernel_estimate_s": round(kernel_est, 4),
                      "overhead_s": round(dt_render - kernel_est, 4)}),
          flush=True)


def part3_bvhjnp_ramp():
    import jax
    import jax.numpy as jnp

    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.camera import camera_from_rtc, primary_rays
    from orion_tpu.ops.bvh_traverse import make_bvh_intersect
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene("/root/reference/assets/nanosuit.rtc")
    rtc.xres = rtc.yres = 1024
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.0, 0.0)
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH)
    fn = make_bvh_intersect(bvh)
    for n in (65536, 262144, 1048576):
        try:
            dt = timeit(lambda: fn(scene, orig[:n], dirs[:n]).t, iters=2)
            print(json.dumps({"measure": "bvh_jnp", "rays": n,
                              "seconds": round(dt, 4),
                              "rays_per_s": round(n / dt, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"measure": "bvh_jnp", "rays": n,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    part1_bwd_policies()
    part2_whitted_bisect()
    part3_bvhjnp_ramp()
