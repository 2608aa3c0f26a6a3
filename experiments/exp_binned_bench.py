"""Round-3: binned dense traversal vs sorted-wavefront walk on the
flagship config (subdiv cornell, 256^2, 16 spp, depth 8, ls 2).
Target: >= 1.0M primary rays/s (reference CPU anchor 0.83M)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_binned import make_binned_path_renderer
from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=3):
    # axon-tunnel timing rule: block_until_ready does not force
    # execution; dispatch N calls and fetch ONE value at the end
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters, out


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=levels)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n_primary = 256 * 256 * 16
    print(f"tris={scene.num_triangles}", flush=True)

    fn_b = make_bounce_path_renderer(scene, cam, samples=16, max_depth=8,
                                     light_samples=2)
    dt, img_b = timeit(fn_b, key)
    print(f"sorted-walk bounce: {dt:.3f}s {n_primary / dt / 1e6:.3f}M "
          f"prim/s  mean={float(img_b.mean()):.6f}", flush=True)

    for mr in (512, 1024):
        fn = make_binned_path_renderer(scene, cam, samples=16,
                                       max_depth=8, light_samples=2,
                                       max_rows=mr)
        dt, img = timeit(fn, key)
        diff = float(jnp.abs(img - img_b).max())
        print(f"binned mr={mr}:      {dt:.3f}s "
              f"{n_primary / dt / 1e6:.3f}M prim/s  "
              f"mean={float(img.mean()):.6f} maxdiff={diff:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
