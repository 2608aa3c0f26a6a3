"""Headline benchmark: Cornell-box BRDF path trace throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors BASELINE.md config 2 (Cornell 512x512, 16 spp, max depth 8,
light samples 2 — the reference's path-tracing mode, raytracer.cpp:131-194).
The baseline anchor is the reference CPU's 0.83M primary rays/s derived from
its published 1920x1080 @2048spp render in 5126.4 s (README.md:40-46).
"""

import json
import sys
import time

BASELINE_PRIMARY_RAYS_PER_S = 0.83e6  # reference CPU anchor (BASELINE.md)

XRES, YRES = 512, 512
SAMPLES = 16
MAX_DEPTH = 8
LIGHT_SAMPLES = 2


def main():
    import jax

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.render import render
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene("/root/reference/assets/cornell-box.rtc")
    rtc.xres, rtc.yres = XRES, YRES
    cam = camera_from_rtc(rtc)
    key = jax.random.key(0)

    def run():
        img = render(scene, cam, key, samples=SAMPLES, max_depth=MAX_DEPTH,
                     light_samples=LIGHT_SAMPLES, mode="path")
        img.block_until_ready()
        return img

    img = run()  # compile + warmup
    assert bool(jax.numpy.isfinite(img).all()), "non-finite radiance"

    n_iters = 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters

    primary_rays = XRES * YRES * SAMPLES
    rays_per_s = primary_rays / dt
    out = {
        "metric": "cornell_path_512x512_16spp_primary_rays_per_s",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
