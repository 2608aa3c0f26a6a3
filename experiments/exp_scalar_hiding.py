"""Round-3: hide the walk's per-iteration scalar latency.

exp_walk_anatomy measured 226 ns per node step at RB=512, of which only
~50 ns is slab vector work — the rest is the serial scalar chain
(8 SMEM loads -> any-reduce -> branch -> pointer update). Variants:

  S1:   baseline one-pointer walk (fixed ITERS steps)
  U2:   same, while body unrolled x2 (halves loop-cond overhead)
  P2:   TWO independent pointer chains per kernel instance over a
        [8, 2*RB] superblock — chains interleave on the scalar unit
  P4:   four chains over [8, 4*RB]
Reported: ns per POINTER-STEP (total steps = chains * ITERS).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.ops.pallas_bvh_path import bvh_path_device_data
from orion_tpu.ops.pallas_intersect import pack_ray_rows
from orion_tpu.ops.woop import woop_t
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"
ITERS = 256
RB = 512
N_TOTAL = 128 * 512 * 4


def timeit(fn, iters=5):
    out = fn()
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    orig, dirs = primary_rays(cam, 0.0, 0.0)
    reps = N_TOTAL // orig.shape[0] + 1
    orig = jnp.tile(orig, (reps, 1))[:N_TOTAL]
    dirs = jnp.tile(dirs, (reps, 1))[:N_TOTAL]

    node_scalars, tab, M = bvh_path_device_data(scene)

    def make(chains, unroll):
        width = RB * chains

        def kern(n_lox, n_loy, n_loz, n_hix, n_hiy, n_hiz, n_skip,
                 n_start, r_ref, tab_ref, t_out):
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
            o = [tuple(r_ref[c:c + 1, h * RB:(h + 1) * RB]
                       for c in range(3)) for h in range(chains)]
            d = [tuple(r_ref[c:c + 1, h * RB:(h + 1) * RB]
                       for c in range(3, 6)) for h in range(chains)]
            inv = [tuple(1.0 / x for x in dh) for dh in d]

            def one_step(h, ptr, t_b, c_b):
                lo = (n_lox[ptr], n_loy[ptr], n_loz[ptr])
                hi = (n_hix[ptr], n_hiy[ptr], n_hiz[ptr])
                oh, ih = o[h], inv[h]
                tx0 = (lo[0] - oh[0]) * ih[0]
                tx1 = (hi[0] - oh[0]) * ih[0]
                ty0 = (lo[1] - oh[1]) * ih[1]
                ty1 = (hi[1] - oh[1]) * ih[1]
                tz0 = (lo[2] - oh[2]) * ih[2]
                tz1 = (hi[2] - oh[2]) * ih[2]
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1))
                lane_hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_b)
                any_hit = jnp.any(lane_hit)
                start = n_start[ptr]
                is_leaf = start >= 0

                def leaf_case(state):
                    t_b, c_b = state
                    off = pl.multiple_of(jnp.maximum(start, 0), 128)
                    blk_t = tab_ref[0:16, pl.ds(off, 128)].T   # [128,16]
                    w = tuple(blk_t[:, i:i + 1] for i in range(13))
                    t = woop_t(o[h], d[h], w)
                    t_min = jnp.min(t, axis=0, keepdims=True)
                    row = jnp.min(jnp.where(t == t_min, row_idx,
                                            jnp.int32(2**30)),
                                  axis=0, keepdims=True) + start
                    better = (t_min < t_b) & (t_min < 3e38)
                    return (jnp.where(better, t_min, t_b),
                            jnp.where(better, row, c_b))

                t_b, c_b = jax.lax.cond(any_hit & is_leaf, leaf_case,
                                        lambda s: s, (t_b, c_b))
                descend = any_hit & jnp.logical_not(is_leaf)
                # fixed-length probe: wrap instead of terminating
                nxt = jnp.where(descend, ptr + 1, n_skip[ptr])
                nxt = jnp.where(nxt < M, nxt, 0)
                return nxt, t_b, c_b

            def body(carry):
                i = carry[0]
                ptrs = list(carry[1:1 + chains])
                tbs = list(carry[1 + chains:1 + 2 * chains])
                cbs = list(carry[1 + 2 * chains:1 + 3 * chains])
                for _ in range(unroll):
                    for h in range(chains):
                        ptrs[h], tbs[h], cbs[h] = one_step(
                            h, ptrs[h], tbs[h], cbs[h])
                return (i + unroll,) + tuple(ptrs) + tuple(tbs) \
                    + tuple(cbs)

            init = (jnp.int32(0),) \
                + tuple(jnp.int32(0) for _ in range(chains)) \
                + tuple(jnp.full((1, RB), 3e38, jnp.float32)
                        for _ in range(chains)) \
                + tuple(jnp.full((1, RB), -1, jnp.int32)
                        for _ in range(chains))
            out = jax.lax.while_loop(lambda c: c[0] < ITERS, body, init)
            for h in range(chains):
                t_out[:, h * RB:(h + 1) * RB] = out[1 + chains + h]

        nblk = N_TOTAL // width
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8, grid=(nblk,),
            in_specs=[pl.BlockSpec((8, width), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, width), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM))
        call = pl.pallas_call(kern, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct(
                                  (1, N_TOTAL), jnp.float32))
        rays = pack_ray_rows(orig, dirs, N_TOTAL)
        steps = nblk * ITERS * chains
        return (lambda: call(*node_scalars, rays, tab)), steps

    for name, chains, unroll in (("S1", 1, 1), ("U2", 1, 2),
                                 ("P2", 2, 1), ("P4", 4, 1),
                                 ("P2U2", 2, 2)):
        fn, steps = make(chains, unroll)
        dt = timeit(fn)
        print(f"{name:4s}: {dt * 1e3:7.2f} ms  "
              f"{dt / steps * 1e9:7.1f} ns/pointer-step", flush=True)


if __name__ == "__main__":
    main()
