"""Round-5 flagship candidates on the 34.8k-tri subdivided cornell,
256^2 x 16 spp x depth 8 (VERDICT r4 #1: break 1.0M rays/s).

  full         : prefix-sized buffers + row-major attr gather
  octant       : + 8 per-octant node flattenings, every walk (main,
                 shadow pair) majority-votes its block's direction
                 octant and runs near-first for it

Run on real TPU: python experiments/exp_r5_flagship.py
"""

import time

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
    return (time.perf_counter() - t0) / iters, out


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n = 256 * 256 * 16

    for name, kw in [("full", {}),
                     ("octant", {"octant_trees": True}),
                     ("leaf64", {"leaf_width": 64}),
                     ("oct+l64", {"octant_trees": True,
                                  "leaf_width": 64})]:
        fn = make_bounce_path_renderer(scene, cam, samples=16,
                                       max_depth=8, light_samples=2,
                                       **kw)
        dt, img = timeit(fn, key)
        print(f"{name:8s} {dt:.3f}s  {n / dt / 1e6:.3f}M prim/s  "
              f"mean={float(img.mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
