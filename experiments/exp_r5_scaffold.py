"""Round-5: price the flagship scaffold pieces after the prefix-sized
buffer change (walk/attrs/vis outputs shrink with the compaction
ladder instead of staying full-width).

Variants, all on the 34.8k-tri subdivided cornell at 256^2 x 16 spp
x depth 8 (the flagship config):

  full          : production pipeline (round-5 prefix-sized buffers)
  sort-every-2  : argsort+permute+recompact only on odd bounces
  fake-argsort  : perm := iota (permutes still run) -> argsort's share
  fake-gather   : attrs := broadcast (no row gather) -> gather's share

The probes break the image (fake-*) or change coherence (sort-every);
only `full` and `sort-every-2` are candidate production configs.

Run on real TPU: python experiments/exp_r5_scaffold.py
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

    variants = [
        ("full", {}),
        ("sort-every-2", {"sort_every": 2}),
        ("sort-every-3", {"sort_every": 3}),
        ("fake-argsort", {"_exp": {"fake_argsort": True}}),
        ("fake-gather", {"_exp": {"fake_gather": True}}),
    ]
    base = None
    for name, kw in variants:
        fn = make_bounce_path_renderer(scene, cam, samples=16,
                                       max_depth=8, light_samples=2,
                                       **kw)
        dt, img = timeit(fn, key)
        if base is None:
            base = dt
        print(f"{name:14s} {dt:.3f}s  {n / dt / 1e6:.3f}M prim/s  "
              f"delta={base - dt:+.3f}s  mean={float(img.mean()):.5f}",
              flush=True)


if __name__ == "__main__":
    main()
