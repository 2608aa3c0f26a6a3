"""Textured nanosuit 1024x1024 64spp depth-0: deferred-texturing
BVH-Whitted megakernel (packed-texel epilogue) vs the wavefront record.

Timing: N back-to-back dispatches, ONE fetch (tunnel rule).
"""
import time

import jax
import numpy as np

from orion_tpu.engine import prepare
from orion_tpu.ops.pallas_bvh_whitted import make_bvh_whitted_deferred
from orion_tpu.render import render

ASSETS = "/root/reference/assets"


def time_calls(fn, iters):
    out = fn()
    np.asarray(out)  # warm + fetch
    t0 = time.perf_counter()
    outs = [fn() for _ in range(iters)]
    np.asarray(outs[-1])
    return (time.perf_counter() - t0) / iters


def main():
    ps = prepare(f"{ASSETS}/nanosuit.rtc", xres=1024, yres=1024)
    key = jax.random.key(0)
    n_rays = 1024 * 1024 * 64

    fn_d = make_bvh_whitted_deferred(ps.scene, ps.camera, samples=64,
                                     order_signs=ps.order_signs)
    dt = time_calls(lambda: fn_d(key), 2)
    print(f"deferred megakernel: {dt:.4f}s  {n_rays/dt/1e6:.2f} M rays/s")

    def go():
        return render(ps.scene, ps.camera, key, samples=64, max_depth=0,
                      light_samples=1, mode="whitted",
                      intersect=ps.intersect,
                      shadow_intersect=ps.shadow_intersect)

    dt_w = time_calls(go, 2)
    print(f"wavefront ({ps.backend}): {dt_w:.4f}s  "
          f"{n_rays/dt_w/1e6:.2f} M rays/s")

    # value check at small res (same estimator, different jitter streams)
    ps2 = prepare(f"{ASSETS}/nanosuit.rtc", xres=128, yres=128)
    img_d = np.asarray(make_bvh_whitted_deferred(
        ps2.scene, ps2.camera, samples=16,
        order_signs=ps2.order_signs)(key))
    img_w = np.asarray(render(ps2.scene, ps2.camera, jax.random.key(1),
                              samples=16, max_depth=0, light_samples=1,
                              mode="whitted", intersect=ps2.intersect,
                              shadow_intersect=ps2.shadow_intersect))
    corr = float((img_d * img_w).sum()
                 / (np.linalg.norm(img_d) * np.linalg.norm(img_w) + 1e-20))
    print(f"finite={np.isfinite(img_d).all()} corr={corr:.5f} "
          f"means {img_d.mean():.5f} vs {img_w.mean():.5f}")


if __name__ == "__main__":
    main()
