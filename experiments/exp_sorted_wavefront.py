"""Round-3 experiment: can a coherence-sorted wavefront beat the
block-uniform BVH-path megakernel on the enclosed 35k-tri scene?

VERDICT r2 weak #1: bvh-path megakernel does 0.14M primary rays/s on
cornell_subdiv35k_path_256_16spp because bounce rays are incoherent and
the walk advances ONE node pointer per 256-ray block. Hypothesis: the
TPU-idiomatic fix is to make the DATA coherent (sort the wavefront
between bounces by direction-octant + origin-morton) rather than make
the control flow finer (per-lane pointers fight the 8x128 VPU).

Run on real TPU:  python experiments/exp_sorted_wavefront.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.engine import prepare, select_intersect
from orion_tpu.render import render
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, n=3):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    out.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    samples = 16
    n_primary = 256 * 256 * samples
    key = jax.random.key(0)

    fn, backend, bvh, stats = select_intersect(scene)
    print(f"backend={backend} tris={scene.num_triangles} "
          f"nodes={stats.nodes if stats else 0}")

    # 1. megakernel baseline
    from orion_tpu.ops.pallas_bvh_path import make_bvh_path_renderer
    mk = make_bvh_path_renderer(scene, cam, samples=samples, max_depth=8,
                                light_samples=2, ray_block=512)
    dt = timeit(lambda: mk(key))
    print(f"megakernel:                {dt:.3f}s  "
          f"{n_primary / dt / 1e6:.3f}M primary rays/s")

    # 2. wavefront variants
    from orion_tpu.ops.pallas_bvh import make_bvh_intersect_pallas

    def wf(sort, isect):
        return render(scene, cam, key, samples=samples, max_depth=8,
                      light_samples=2, mode="path", intersect=isect,
                      fold_samples=True, sort_bounces=sort)

    for rb in (128, 256, 512):
        isect = make_bvh_intersect_pallas(bvh, scene, ray_block=rb)
        for sort in (False, "octant", "morton"):
            dt = timeit(lambda: wf(sort, isect))
            print(f"wavefront rb={rb:<4} sort={str(sort):<7} {dt:.3f}s  "
                  f"{n_primary / dt / 1e6:.3f}M primary rays/s")


if __name__ == "__main__":
    main()
