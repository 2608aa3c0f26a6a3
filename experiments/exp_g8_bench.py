"""Round-3: G8 grouped-pointer traversal vs block-uniform, on TPU.

Configs: nanosuit primaries (coherent), shuffled (incoherent), and
shuffled+sorted-by-coherence-key (the wavefront's real regime), plus
subdiv35k cornell depth-2 bounce rays if /tmp/bounce_dump.npz exists.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.accel.bvh import SAH, build_bvh
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.ops.pallas_bvh import make_bvh_intersect_pallas
from orion_tpu.ops.pallas_bvh_g8 import make_bvh_intersect_g8
from orion_tpu.ops.reorder import coherence_key
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out.t))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out.t))
    return (time.perf_counter() - t0) / iters


def bench(name, scene, orig, dirs, alive=None):
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    n = orig.shape[0]
    for label, mk in (("block256", make_bvh_intersect_pallas),
                      ("g8-1024 ", make_bvh_intersect_g8)):
        fn = mk(bvh, scene)
        f = jax.jit(lambda o, d: fn(scene, o, d, alive=alive))
        dt = timeit(f, orig, dirs)
        print(f"{name:<28} {label}: {dt*1e3:8.2f} ms "
              f"{n / dt / 1e6:7.2f} M rays/s", flush=True)


def main():
    scene, rtc = load_scene(f"{ASSETS}/nanosuit.rtc", load_textures=False)
    rtc.xres, rtc.yres = 1024, 1024
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.001, 0.001)
    key = jax.random.key(0)
    perm = jax.random.permutation(key, orig.shape[0])
    s_lo = jnp.min(scene.tri_v0, axis=0)
    s_hi = jnp.max(scene.tri_v0 + jnp.maximum(scene.tri_e1, 0)
                   + jnp.maximum(scene.tri_e2, 0), axis=0)

    o_sh, d_sh = orig[perm], dirs[perm]
    k = coherence_key(o_sh, d_sh, jnp.ones(orig.shape[0], bool), s_lo, s_hi)
    sperm = jnp.argsort(k, stable=True)

    bench("nanosuit coherent", scene, orig, dirs)
    bench("nanosuit shuffled", scene, o_sh, d_sh)
    bench("nanosuit shuffled+sorted", scene, o_sh[sperm], d_sh[sperm])

    try:
        b = np.load("/tmp/bounce_dump.npz")
        sc2, r2 = load_scene(f"{ASSETS}/cornell-box.rtc")
        sc2 = subdivide_scene(sc2, levels=5)
        o2 = jnp.asarray(np.tile(b["orig2"], (16, 1)))
        d2 = jnp.asarray(np.tile(b["dirs2"], (16, 1)))
        a2 = jnp.asarray(np.tile(b["alive2"], 16))
        lo2 = jnp.min(sc2.tri_v0, axis=0)
        hi2 = jnp.max(sc2.tri_v0 + jnp.maximum(sc2.tri_e1, 0)
                      + jnp.maximum(sc2.tri_e2, 0), axis=0)
        k2 = coherence_key(o2, d2, a2, lo2, hi2)
        p2 = jnp.argsort(k2, stable=True)
        bench("subdiv35k bounce2 unsorted", sc2, o2, d2, a2)
        bench("subdiv35k bounce2 sorted", sc2, o2[p2], d2[p2], a2[p2])
    except FileNotFoundError:
        print("(no bounce dump; skipping subdiv35k)")


if __name__ == "__main__":
    main()
