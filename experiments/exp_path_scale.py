"""Where does path-mode throughput go as T grows past one sweep chunk?

Matrix over the subdiv-cornell scene (2,178 tris, the bench's
cornell_subdiv2k config): chunked fused sweep with/without chunk-cull
conds, bigger FUSED_CHUNK (fewer chunk iterations / fully resident),
and the BVH path megakernel at several ray blocks.

Run on TPU: python experiments/exp_path_scale.py [levels]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from orion_tpu.camera import camera_from_rtc
from orion_tpu.scene import load_scene, subdivide_scene

LEVELS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
RES = 512
SPP = 16
DEPTH = 8
LS = 2


def timeit(fn, n=3):
    fn(jax.random.key(0)).block_until_ready()
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        fn(jax.random.key(i + 1)).block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    return dt, RES * RES * SPP / dt / 1e6


def main():
    scene, r = load_scene("/root/reference/assets/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=LEVELS)
    r.xres = r.yres = RES
    cam = camera_from_rtc(r)
    print(f"tris={scene.num_triangles} res={RES} spp={SPP} depth={DEPTH}")

    import orion_tpu.ops.pallas_fused as pf

    def fused(chunk, cull=True, label=""):
        old_chunk = pf.FUSED_CHUNK
        old_bounds = pf.fused_chunk_bounds
        pf.FUSED_CHUNK = chunk
        if not cull:
            # boxes the slab test always passes -> cond always sweeps;
            # to remove the cond entirely see the no_cond variant below
            def _open_bounds(sc):
                n = max(pf._fused_t_pad(int(sc.num_triangles)) // chunk, 1)
                return (np.full((n, 3), -3e37, np.float32),
                        np.full((n, 3), 3e37, np.float32))
            pf.fused_chunk_bounds = _open_bounds
        try:
            fn = pf.make_fused_path_renderer(
                scene, cam, samples=SPP, max_depth=DEPTH, light_samples=LS)
            dt, mps = timeit(fn)
            print(f"fused chunk={chunk} cull={cull} {label}: "
                  f"{dt:.3f}s {mps:.2f} M rays/s")
        except Exception as e:
            print(f"fused chunk={chunk} cull={cull} {label}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}")
        finally:
            pf.FUSED_CHUNK = old_chunk
            pf.fused_chunk_bounds = old_bounds

    fused(512, cull=True, label="(bench baseline)")
    fused(512, cull=False)
    fused(1024, cull=True)
    fused(2560, cull=True, label="(single chunk -> resident)")

    from orion_tpu.ops.pallas_bvh_path import make_bvh_path_renderer

    for rb in (128, 256, 512):
        try:
            fn = make_bvh_path_renderer(scene, cam, samples=SPP,
                                        max_depth=DEPTH, light_samples=LS,
                                        ray_block=rb)
            dt, mps = timeit(fn)
            print(f"bvh-path rb={rb}: {dt:.3f}s {mps:.2f} M rays/s")
        except Exception as e:
            print(f"bvh-path rb={rb}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
