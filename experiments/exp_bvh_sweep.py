"""Sweep (leaf_size, ray_block) for the Pallas BVH packet kernel on nanosuit.

Round-2 VERDICT item 2: the round-1 kernel ran 1024-ray blocks against
128-triangle leaves (TPU_LEAF_SIZE == leaf_width == 128), so any lane's
AABB hit dragged 1024 rays through a [1024, 128] MT plane — ~6.5k
ray-triangle tests per ray where the reference does ~6. This sweep
decouples leaf_size (tree quality: how many triangles a leaf holds)
from leaf_width (the 128-lane storage alignment, pinned by Mosaic
dynamic-slice rules) and shrinks the block-uniform pointer granularity.

Run on the real TPU: `python experiments/exp_bvh_sweep.py [coarse|fine]`
One process, configs ordered safest-first, one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.camera import camera_from_rtc, primary_rays
    from orion_tpu.ops.pallas_bvh import (RESIDENT_MAX_BUNDLED,
                                          make_bvh_intersect_pallas)
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene("/root/reference/assets/nanosuit.rtc")
    rtc.xres = rtc.yres = 1024
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.0, 0.0)
    N = orig.shape[0]
    # incoherent proxy: the same rays in shuffled order (no spatial
    # coherence within a block) — a stand-in for bounce/shadow batches
    perm = np.random.default_rng(0).permutation(N)
    orig_s, dirs_s = orig[perm], dirs[perm]

    signs = tuple(float(s) if s != 0 else 1.0
                  for s in np.sign(np.asarray(cam.front)))

    mode = sys.argv[1] if len(sys.argv) > 1 else "coarse"
    if mode == "coarse":
        # round-1 row-per-ray kernel (any rb multiple of 8)
        configs = [(128, 1024), (128, 256), (128, 64),
                   (64, 256), (64, 64), (64, 32),
                   (32, 128), (32, 64), (32, 32)]
    else:
        # lane-major kernel (rb multiple of 128)
        configs = [(128, 256), (128, 512), (128, 1024), (128, 128),
                   (64, 256), (64, 128), (32, 256), (32, 128)]

    def timeit(fn, o, d, iters=3):
        t, row = fn(scene, o, d).t, None
        _ = float(jnp.sum(t))  # warmup + force
        t0 = time.perf_counter()
        for _ in range(iters):
            h = fn(scene, o, d)
        _ = float(jnp.sum(h.t))
        return (time.perf_counter() - t0) / iters

    for leaf, rb in configs:
        rec = {"leaf": leaf, "rb": rb}
        try:
            bvh, stats = build_bvh(np.asarray(scene.tri_v0),
                                   np.asarray(scene.tri_e1),
                                   np.asarray(scene.tri_e2),
                                   np.asarray(scene.tri_valid),
                                   strategy=SAH, leaf_size=leaf,
                                   leaf_width=128, order_signs=signs)
            rec.update(nodes=stats.nodes, leaves=stats.leaves,
                       bundled=bvh.num_bundled)
            if bvh.num_bundled > RESIDENT_MAX_BUNDLED:
                rec["skip"] = "over residency cap"
                print(json.dumps(rec), flush=True)
                continue
            fn = make_bvh_intersect_pallas(bvh, scene, ray_block=rb)
            rec["coherent_s"] = round(timeit(fn, orig, dirs), 4)
            rec["coherent_mrays"] = round(N / rec["coherent_s"] / 1e6, 3)
            rec["shuffled_s"] = round(timeit(fn, orig_s, dirs_s), 4)
            rec["shuffled_mrays"] = round(N / rec["shuffled_s"] / 1e6, 3)
        except Exception as e:
            rec["error"] = repr(e)[:300]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
