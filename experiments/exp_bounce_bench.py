"""Round-3: sorted-wavefront bounce kernel vs BVH-path megakernel on the
flagship config (subdiv35k cornell, 256^2, 16 spp, depth 8, ls 2).
Target: >= 1.0M primary rays/s (reference CPU anchor is 0.83M)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer
from orion_tpu.ops.pallas_bvh_path import make_bvh_path_renderer
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=3):
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n_primary = 256 * 256 * 16

    mk = make_bvh_path_renderer(scene, cam, samples=16, max_depth=8,
                                light_samples=2, ray_block=512)
    dt, img_mk = timeit(mk, key)
    print(f"megakernel rb512:        {dt:.3f}s "
          f"{n_primary / dt / 1e6:.3f}M prim/s  mean={float(img_mk.mean()):.5f}",
          flush=True)

    for rb in (256, 512, 1024):
        for sort in (True, False):
            fn = make_bounce_path_renderer(scene, cam, samples=16,
                                           max_depth=8, light_samples=2,
                                           ray_block=rb, sort=sort)
            dt, img = timeit(fn, key)
            print(f"bounce rb={rb:<5} sort={str(sort):<5}: {dt:.3f}s "
                  f"{n_primary / dt / 1e6:.3f}M prim/s  "
                  f"mean={float(img.mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
