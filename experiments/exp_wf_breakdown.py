"""Round-3: where does the sorted wavefront spend its time?

Times the full subdiv35k path render, then variants with NEE stubbed
out and with the closest-hit traversal stubbed out, to attribute the
frame between traversal, NEE walks, and jnp shading overhead.
"""

import time

import jax
import jax.numpy as jnp

import sys

import orion_tpu.render  # noqa: F401 (module import; attr may be shadowed)

R = sys.modules["orion_tpu.render"]
from orion_tpu.camera import camera_from_rtc
from orion_tpu.engine import select_intersect
from orion_tpu.ops.intersect import Hit
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, n=3):
    fn().block_until_ready()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
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

    def wf(isect, sort="morton"):
        return R.render(scene, cam, key, samples=samples, max_depth=8,
                        light_samples=2, mode="path", intersect=isect,
                        fold_samples=True, sort_bounces=sort)

    dt_full = timeit(lambda: wf(fn))
    print(f"full:            {dt_full:.3f}s "
          f"{n_primary / dt_full / 1e6:.3f}M prim/s")

    # stub NEE
    real_nee = R._nee

    def no_nee(scene, attrs, kd, hit_mask, key, light_samples, intersect):
        return jnp.zeros_like(attrs.point)

    R._nee = no_nee
    dt_nonee = timeit(lambda: wf(fn))
    R._nee = real_nee
    print(f"no-NEE:          {dt_nonee:.3f}s  -> NEE share "
          f"{dt_full - dt_nonee:.3f}s")

    # stub closest-hit (keep NEE walking? no - NEE uses same fn; stub both)
    def miss(scene, orig, dirs, *, alive=None):
        n = orig.shape[0]
        return Hit(t=jnp.full((n,), jnp.inf), tri_id=jnp.zeros((n,),
                                                               jnp.int32))

    dt_nohit = timeit(lambda: wf(miss))
    print(f"no-traversal:    {dt_nohit:.3f}s  (jnp scaffolding, "
          f"all-hit shading)")

    # no sort at all with stub - pure scaffold cost
    dt_nosort = timeit(lambda: wf(miss, sort=False))
    print(f"stub, unsorted:  {dt_nosort:.3f}s  -> sort share "
          f"{dt_nohit - dt_nosort:.3f}s")


if __name__ == "__main__":
    main()
