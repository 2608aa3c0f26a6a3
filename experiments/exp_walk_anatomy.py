"""Round-3: exact cost anatomy of the BVH walk kernel's two phases.

Kernels that run a FIXED number of while-iterations over real node/leaf
data, toggling the work done per iteration:
  A: slab chain only (node step cost)
  B: slab + leaf woop_t every iteration, WITH the [16,W]->[W,16] transpose
  C: like B but leaf block pre-transposed outside the loop (isolates the
     per-visit transpose cost)
  D: like B plus winner row-pick + t/col select (full lean leaf)
  E: like D plus the one-hot MXU attribute pick of 21 columns (full
     attr-sweep leaf)
Per-iteration costs in ns = slope between variants.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.ops.pallas_bvh_path import bvh_path_device_data
from orion_tpu.ops.pallas_fused import _BOUNCE_ATTRS
from orion_tpu.ops.pallas_intersect import pack_ray_rows
from orion_tpu.ops.woop import woop_t
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"
ITERS = 256        # fixed walk length
RB = 512
NBLK = 128         # blocks timed


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
    N = NBLK * RB
    orig, dirs = orig[:N], dirs[:N]

    node_scalars, tab, M = bvh_path_device_data(scene)
    n_leaves = int((np.asarray(node_scalars[7]) >= 0).sum())
    print(f"nodes={M} leaves={n_leaves} tab={tab.shape}")

    def make(variant):
        def kern(n_lox, n_loy, n_loz, n_hix, n_hiy, n_hiz, n_skip,
                 n_start, r_ref, tab_ref, t_out):
            row_idx = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
            o = (r_ref[0:1, :], r_ref[1:2, :], r_ref[2:3, :])
            d = (r_ref[3:4, :], r_ref[4:5, :], r_ref[5:6, :])
            inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
            blk0_t = tab_ref[:, 0:128].T          # hoisted (variant C)

            def body(carry):
                i, ptr, t_b, c_b, acc = carry
                lo = (n_lox[ptr], n_loy[ptr], n_loz[ptr])
                hi = (n_hix[ptr], n_hiy[ptr], n_hiz[ptr])
                tx0 = (lo[0] - o[0]) * inv[0]
                tx1 = (hi[0] - o[0]) * inv[0]
                ty0 = (lo[1] - o[1]) * inv[1]
                ty1 = (hi[1] - o[1]) * inv[1]
                tz0 = (lo[2] - o[2]) * inv[2]
                tz1 = (hi[2] - o[2]) * inv[2]
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                               jnp.maximum(ty0, ty1)),
                                   jnp.maximum(tz0, tz1))
                hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_b)
                acc = acc + hit.astype(jnp.float32)

                if variant != "A":
                    start = jnp.where(n_start[ptr] >= 0, n_start[ptr], 0)
                    off = pl.multiple_of(start, 128)
                    if variant == "C":
                        blk_t = blk0_t
                    else:
                        blk_t = tab_ref[:, pl.ds(off, 128)].T   # [128,32]
                    w = tuple(blk_t[:, i:i + 1] for i in range(13))
                    t = woop_t(o, d, w)
                    t_min = jnp.min(t, axis=0, keepdims=True)
                    if variant in ("D", "E"):
                        row = jnp.min(jnp.where(t == t_min, row_idx,
                                                jnp.int32(2**30)),
                                      axis=0, keepdims=True)
                        better = t_min < t_b
                        t_b = jnp.where(better, t_min, t_b)
                        c_b = jnp.where(better, row, c_b)
                        if variant == "E":
                            sel = row_idx == row
                            got_all = jax.lax.dot_general(
                                blk_t, sel.astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                            for c in _BOUNCE_ATTRS:
                                acc = acc + got_all[c:c + 1, :]
                    else:
                        acc = acc + t_min

                nxt = jnp.where(ptr + 1 < M, ptr + 1, 0)
                return i + 1, nxt, t_b, c_b, acc

            rb = t_out.shape[1]
            init = (jnp.int32(0), jnp.int32(0),
                    jnp.full((1, rb), 3e38, jnp.float32),
                    jnp.full((1, rb), -1, jnp.int32),
                    jnp.zeros((1, rb), jnp.float32))
            out = jax.lax.while_loop(lambda c: c[0] < ITERS, body, init)
            t_out[:, :] = out[4] + out[2]

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8, grid=(NBLK,),
            in_specs=[pl.BlockSpec((8, RB), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, RB), lambda i, *_: (0, i),
                                   memory_space=pltpu.VMEM))
        call = pl.pallas_call(kern, grid_spec=gs,
                              out_shape=jax.ShapeDtypeStruct((1, N),
                                                             jnp.float32))
        rays = pack_ray_rows(orig, dirs, N)
        return lambda: call(*node_scalars, rays, tab)

    base = None
    for v in ("A", "B", "C", "D", "E"):
        dt = timeit(make(v))
        per_iter = dt / (NBLK * ITERS) * 1e9
        msg = f"{v}: {dt * 1e3:7.2f} ms  {per_iter:7.1f} ns/block-iter"
        if base is not None:
            msg += f"  (+{(dt - base) / (NBLK * ITERS) * 1e9:6.1f} ns)"
        else:
            base = dt
        print(msg, flush=True)


if __name__ == "__main__":
    main()
