"""Round-3: where do the sorted-bounce pipeline's 2.6s go?

Replicates make_bounce_path_renderer's _impl with (a) the real kernel,
(b) the kernel swapped for identity (scaffold-only: primaries + 9x
argsort + permute + scatter), and dumps per-bounce live fractions so the
occupancy argument for regeneration is measured, not assumed."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops import pallas_bounce as pb
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    samples, max_depth, ls, rb = 16, 8, 2, 512
    n_primary = 256 * 256 * samples

    # full pipeline
    fn = pb.make_bounce_path_renderer(scene, cam, samples=samples,
                                      max_depth=max_depth,
                                      light_samples=ls, ray_block=rb)
    dt_full, img = timeit(fn, key)
    print(f"full pipeline:    {dt_full:.3f}s "
          f"{n_primary / dt_full / 1e6:.3f}M prim/s", flush=True)

    # scaffold only: patch build_bounce_call to return identity
    real_build = pb.build_bounce_call
    try:
        pb.build_bounce_call = (
            lambda *a, **k: lambda seed, depth, *rest: (rest[-3], rest[-2]))
        fn0 = pb.make_bounce_path_renderer(scene, cam, samples=samples,
                                           max_depth=max_depth,
                                           light_samples=ls, ray_block=rb)
    finally:
        pb.build_bounce_call = real_build
    dt_scaf, _ = timeit(fn0, key)
    print(f"scaffold only:    {dt_scaf:.3f}s  "
          f"=> kernel ~{dt_full - dt_scaf:.3f}s", flush=True)

    # per-bounce live fractions + per-bounce kernel timing
    H, W = cam.yres, cam.xres
    n_pix = H * W
    N = n_pix * samples
    n_pad = pb._round_up(max(N, rb), rb)
    from orion_tpu.ops.pallas_bvh_path import bvh_path_device_data
    from orion_tpu.ops.pallas_fused import _emitters_consts, seed_scalar
    node_scalars, tab, num_nodes = bvh_path_device_data(scene)
    emitter = _emitters_consts(scene)
    s_lo, s_hi = pb._scene_bounds_np(scene)
    call = jax.jit(pb.build_bounce_call(num_nodes, max_depth, ls, emitter,
                                        s_lo, s_hi, n_pad, rb, False))

    fn_state = pb.make_bounce_path_renderer(scene, cam, samples=samples,
                                            max_depth=max_depth,
                                            light_samples=ls, ray_block=rb)
    # rebuild initial state inline (mirror _impl's init)
    seed = seed_scalar(key)
    mk = fn_state  # noqa: F841  (kept for warm scene constants)

    # inline primaries via the module helper
    import orion_tpu.ops.pallas_fused as pf
    cam_v = pf.camera_vec(cam)
    pixv = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), samples)
    sampv = jnp.repeat(jnp.arange(samples, dtype=jnp.int32), n_pix)
    jb0, jb1, _, _ = pf._pcg4d(sampv, jnp.broadcast_to(seed[0], sampv.shape),
                               jnp.full_like(sampv, 0x4A17),
                               jnp.full_like(sampv, 0x7E57))
    jx = pf._u01(jb0) * np.float32(2.0 / W)
    jy = pf._u01(jb1) * np.float32(2.0 / H)
    pfl = pixv.astype(jnp.float32)
    i = jnp.floor((pfl + 0.5) * np.float32(1.0 / W))
    j = pfl - i * np.float32(W)
    x = 2.0 * (j * np.float32(1.0 / W)) - 1.0 + jx
    y = -(2.0 * (i * np.float32(1.0 / H)) - 1.0 + jy)
    st = jnp.zeros((16, n_pad), jnp.float32)
    st = st.at[0, :N].set(cam_v[0]).at[1, :N].set(cam_v[1]).at[2, :N].set(cam_v[2])
    st = st.at[3, :N].set(cam_v[3] + x * cam_v[6] + y * cam_v[9])
    st = st.at[4, :N].set(cam_v[4] + x * cam_v[7] + y * cam_v[10])
    st = st.at[5, :N].set(cam_v[5] + x * cam_v[8] + y * cam_v[11])
    st = st.at[6:9, :N].set(1.0)
    st = st.at[9, :N].set(1.0)
    it = jnp.zeros((8, n_pad), jnp.int32)
    it = it.at[0, :N].set(pixv).at[1, :N].set(sampv)

    @jax.jit
    def sort_step(st, it):
        perm = jnp.argsort(st[13].astype(jnp.int32), stable=True)
        return st[:, perm], it[:, perm]

    for depth in range(max_depth + 1):
        st, it = sort_step(st, it)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        st2, it2 = call(seed, jnp.full((1,), depth, jnp.int32),
                        *node_scalars, st, it, tab)
        jax.block_until_ready(st2)
        dt = time.perf_counter() - t0
        alive = float(jnp.mean((st[9] > 0).astype(jnp.float32)))
        print(f"bounce {depth}: live {alive:6.3f}  kernel {dt * 1e3:8.2f} ms",
              flush=True)
        st, it = st2, it2


if __name__ == "__main__":
    main()
