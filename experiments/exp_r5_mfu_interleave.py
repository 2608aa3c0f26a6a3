"""Round-5 (VERDICT r4 next #6): the latency-hiding interleave,
measured.

The round-4 floor analysis (exp_mfu_floor.py, BENCHMARKS.md) put the
headline fused kernel at ~46% of its own op-mix floor and blamed the
rest on FMA latency exposure in the [1, RB] elementwise chains between
sweeps (~4 vregs of ILP against a ~5-cycle latency). Two measurements
close the question:

1. chain micro-benchmark: K dependent FMAs on one [1, 512] plane vs
   2/4/8 INTERLEAVED independent chains in one Pallas kernel — the
   recoverable-ILP ceiling in isolation.

2. dual-body megakernel: the production regenerative estimator
   instantiated TWICE per kernel at half block width (two adjacent
   128-lane pixel sub-blocks), jointly advanced under condA | condB —
   _make_regen_body documents finished lanes as no-ops, so the joint
   while_loop is estimator-exact; the two bodies' dataflows are
   independent, giving the compiler 2x the chains to interleave.
   Compared against the production 256-lane single-body kernel on the
   headline config (cornell 512x512, 16 spp, depth 8).

Run on TPU: python experiments/exp_r5_mfu_interleave.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops import pallas_fused as pf
from orion_tpu.scene import load_scene

ASSETS = "/root/reference/assets"


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
    return (time.perf_counter() - t0) / iters, out


# ---------------------------------------------------------------- 1
def chain_bench(n_chains: int, K: int = 4096, RB: int = 512,
                blocks: int = 512):
    """n_chains independent K-step FMA chains on [1, RB] planes."""
    def kernel(x_ref, o_ref):
        chains = [x_ref[i:i + 1, :] + np.float32(i) for i in range(n_chains)]
        a = np.float32(1.000001)
        b = np.float32(1e-7)

        def body(k, cs):
            return tuple(c * a + b for c in cs)

        chains = jax.lax.fori_loop(0, K, body, tuple(chains))
        acc = chains[0]
        for c in chains[1:]:
            acc = acc + c
        o_ref[0:1, :] = acc
        o_ref[1:8, :] = jnp.zeros((7, RB), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=[pl.BlockSpec((8, RB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, RB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, RB * blocks), jnp.float32),
    )
    x = jnp.ones((8, RB * blocks), jnp.float32)
    fn = jax.jit(lambda x: call(x))
    dt, _ = timeit(fn, x, iters=10)
    flops = 2.0 * K * n_chains * RB * blocks
    return dt, flops / dt


# ---------------------------------------------------------------- 2
def build_dual_fused(scene, cam, *, samples, max_depth, light_samples,
                     rb_half=128):
    """The fused path megakernel with TWO half-width regen bodies per
    kernel instance (adjacent pixel sub-blocks), jointly advanced."""
    H, W = cam.yres, cam.xres
    n_pix = H * W
    rb = 2 * rb_half
    n_pad = ((max(n_pix, rb) + rb - 1) // rb) * rb
    tab = jnp.asarray(pf.pack_fused_tri_table(scene))
    T_pad = tab.shape[0]
    lo, hi = pf.fused_chunk_bounds(scene)
    clo, chi = jnp.asarray(lo.ravel()), jnp.asarray(hi.ravel())
    emitter = pf._emitters_consts(scene)
    cam_v = pf.camera_vec(cam)
    chunked = T_pad > pf.FUSED_CHUNK

    def kernel(cam_ref, seed_ref, base_ref, clo_ref, chi_ref, tri_ref,
               out_ref):
        seed = seed_ref[0]

        def camf(i):
            return cam_ref[i]

        def col(c):
            return tri_ref[:, c:c + 1]

        def col_dyn(off, c):
            return tri_ref[pl.ds(pl.multiple_of(off, pf.FUSED_CHUNK),
                                 pf.FUSED_CHUNK), c:c + 1]

        def blk():
            return tri_ref[:, :]

        def blk_dyn(off):
            return tri_ref[pl.ds(pl.multiple_of(off, pf.FUSED_CHUNK),
                                 pf.FUSED_CHUNK), :]

        def chunk_box(k):
            return ((clo_ref[3 * k], clo_ref[3 * k + 1],
                     clo_ref[3 * k + 2]),
                    (chi_ref[3 * k], chi_ref[3 * k + 1],
                     chi_ref[3 * k + 2]))

        pix0 = pl.program_id(0) * rb + base_ref[0]
        halves = []
        for h in range(2):
            pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb_half), 1)
                   + pix0 + h * rb_half)
            body, cond, init = pf._make_regen_body(
                col, camf, seed, pix, n_pix, T_pad, W, H, samples,
                max_depth, light_samples, emitter, col_dyn=col_dyn,
                chunk_box=chunk_box if chunked else None,
                blk=blk, blk_dyn=blk_dyn, fast_shadow=True)
            halves.append((body, cond, init(pix < n_pix)))
        (bodyA, condA, initA), (bodyB, condB, initB) = halves
        nA = len(initA)

        def body2(c):
            return tuple(bodyA(c[:nA])) + tuple(bodyB(c[nA:]))

        def cond2(c):
            return condA(c[:nA]) | condB(c[nA:])

        carry = jax.lax.while_loop(cond2, body2,
                                   tuple(initA) + tuple(initB))
        cA, cB = carry[:nA], carry[nA:]
        inv_s = np.float32(1.0 / samples)
        for h, cc in ((0, cA), (1, cB)):
            sl = pl.ds(h * rb_half, rb_half)
            out_ref[0:1, sl] = cc[9] * inv_s
            out_ref[1:2, sl] = cc[10] * inv_s
            out_ref[2:3, sl] = cc[11] * inv_s
        out_ref[3:8, :] = jnp.zeros((5, rb), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, rb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )
    zero_base = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _impl(seed):
        out = call(cam_v, seed, zero_base, clo, chi, tab)
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    return lambda key: _impl(pf.seed_scalar(key))


def main():
    print("== 1. FMA chain ILP micro-benchmark ==", flush=True)
    base = None
    for n in (1, 2, 4, 8):
        dt, rate = chain_bench(n)
        base = base or rate
        print(f"chains={n}: {rate / 1e9:8.1f} Gflop/s "
              f"({rate / base:.2f}x of 1-chain)", flush=True)

    print("== 2. dual-body fused megakernel (headline config) ==",
          flush=True)
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    r.xres = r.yres = 512
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n = 512 * 512 * 16

    fn = pf.make_fused_path_renderer(scene, cam, samples=16, max_depth=8,
                                     light_samples=2, ray_block=256)
    dt, img = timeit(fn, key)
    print(f"production rb=256 single body: {dt * 1e3:7.2f} ms "
          f"{n / dt / 1e6:6.1f}M prim/s mean={float(img.mean()):.5f}",
          flush=True)

    for rbh in (128, 256):
        fn2 = build_dual_fused(scene, cam, samples=16, max_depth=8,
                               light_samples=2, rb_half=rbh)
        dt2, img2 = timeit(fn2, key)
        print(f"dual body rb_half={rbh}:        {dt2 * 1e3:7.2f} ms "
              f"{n / dt2 / 1e6:6.1f}M prim/s "
              f"mean={float(img2.mean()):.5f}", flush=True)


if __name__ == "__main__":
    main()
