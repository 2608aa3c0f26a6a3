"""Leaf-width sweep for the BVH megakernels, post-Woop.

The Woop transform made the in-leaf intersection plane 3.5x cheaper
(exp_mt_variants.py) but end-to-end BVH-megakernel times barely moved —
the walk itself (scalar node steps, block-uniform control, winner
select-reduces) is now the bound. That inverts the round-2 leaf-size
tradeoff: fatter leaves buy FEWER walk steps with MT tests that are now
nearly free. This sweep measures leaf_width in {128, 256, 512} on

  - nanosuit untextured 1024^2 Whitted (the bench's coherent-walk config)
  - cornell subdiv-35k 256^2 16spp path (the enclosed incoherent worst case)

Run on TPU: python experiments/exp_leaf_width.py [spp_whitted]
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from orion_tpu.camera import camera_from_rtc
from orion_tpu.engine import prepare
from orion_tpu.scene import load_scene, subdivide_scene

SPP_W = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def timeit(fn, n=2):
    fn(jax.random.key(0)).block_until_ready()
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(jax.random.key(i + 1)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import orion_tpu.ops.pallas_bvh_whitted as pbw
    import orion_tpu.ops.pallas_bvh_path as pbp

    ps = prepare("/root/reference/assets/nanosuit.rtc", xres=1024,
                 yres=1024, load_textures=False)

    for w in (128, 256, 512):
        # leaf lane offsets must stay 128-aligned (pallas_bvh.py:55): a
        # non-multiple would turn the pl.multiple_of hints into silent
        # miscompiles rather than errors
        assert w % 128 == 0, "leaf_width must be a multiple of 128"
        pbw.LEAF_WIDTH = w
        try:
            fn = pbw.make_bvh_whitted_renderer(
                ps.scene, ps.camera, samples=SPP_W, max_depth=0,
                order_signs=ps.order_signs)
            dt = timeit(fn)
            mps = 1024 * 1024 * SPP_W / dt / 1e6
            print(f"whitted nanosuit leaf={w}: {dt:.3f}s {mps:.1f} M/s",
                  flush=True)
        except Exception as e:
            print(f"whitted nanosuit leaf={w}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    pbw.LEAF_WIDTH = 128

    scene, r = load_scene("/root/reference/assets/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    print(f"path scene tris={scene.num_triangles}", flush=True)
    ref_img = None
    for w in (128, 256, 512):
        assert w % 128 == 0, "leaf_width must be a multiple of 128"
        # set BOTH modules together: pallas_bvh_path imports helpers from
        # pallas_bvh_whitted (_woop_uv today); keeping the two widths in
        # lockstep means any future helper that reads LEAF_WIDTH stays
        # consistent with the kernel that calls it
        pbp.LEAF_WIDTH = w
        pbw.LEAF_WIDTH = w
        try:
            fn = pbp.make_bvh_path_renderer(scene, cam, samples=16,
                                            max_depth=8, light_samples=2)
            dt = timeit(fn)
            img = fn(jax.random.key(0))
            if ref_img is None:
                ref_img = img           # w=128 output is the correctness ref
                err = 0.0
            else:
                err = float(abs(img - ref_img).mean())
            mps = 256 * 256 * 16 / dt / 1e6
            print(f"path subdiv35k leaf={w}: {dt:.3f}s {mps:.2f} M/s "
                  f"mean|diff vs w128|={err:.2e}", flush=True)
        except Exception as e:
            print(f"path subdiv35k leaf={w}: FAIL {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
    pbp.LEAF_WIDTH = 128
    pbw.LEAF_WIDTH = 128


if __name__ == "__main__":
    main()
