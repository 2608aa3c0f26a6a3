"""Round-4: wavefront PRB train step (binned dense sweep) vs the
BVH-PRB regen megakernel on the 35k-tri flagship training config
(subdiv cornell, 256^2, 4 spp, depth 4, ls 2).
Target: >= 0.5M fwd+bwd primary rays/s (round-3 record: 0.077M)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit_step(step, key, iters=3):
    loss, g = step(key)
    _ = float(loss) + float(jnp.sum(g["mat_diffuse"]))
    t0 = time.perf_counter()
    for _i in range(iters):
        loss, g = step(key)
    _ = float(loss) + float(jnp.sum(g["mat_diffuse"]))
    return (time.perf_counter() - t0) / iters, float(loss), g


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=levels)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    target = jnp.zeros((256, 256, 3), jnp.float32)
    n_primary = 256 * 256 * 4
    print(f"tris={scene.num_triangles}", flush=True)

    from orion_tpu.ops.prb_wavefront import make_binned_train_step

    for mr in (512, 1024):
        step = make_binned_train_step(scene, cam, target, samples=4,
                                      max_depth=4, light_samples=2,
                                      max_rows=mr)
        dt, loss, g = timeit_step(step, key)
        print(f"wavefront-prb mr={mr}: {dt:.3f}s "
              f"{n_primary / dt / 1e6:.3f}M fwd+bwd prim/s "
              f"loss={loss:.6f} |g_kd|={float(jnp.abs(g['mat_diffuse']).max()):.3e}",
              flush=True)

    from orion_tpu.ops.pallas_bvh_prb import make_bvh_train_step

    step = make_bvh_train_step(scene, cam, target, samples=4, max_depth=4,
                               light_samples=2, ray_block=512)
    dt, loss, g = timeit_step(step, key)
    print(f"bvh-prb megakernel:  {dt:.3f}s "
          f"{n_primary / dt / 1e6:.3f}M fwd+bwd prim/s loss={loss:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
