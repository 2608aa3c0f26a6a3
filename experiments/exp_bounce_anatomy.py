"""Round-4: partition the sorted-bounce pipeline's time IN SITU.

exp_bounce_breakdown (round 3) timed per-launch pieces with
block_until_ready, which on the axon tunnel reports dispatch latency,
not compute (BENCHMARKS.md methodology note) — its ~25 us/block
dead-block figure was inflated by per-call tunnel sync, which is why
compaction measured neutral. This experiment instead swaps out ONE
pipeline stage at a time inside the same jitted scan and times with
N back-to-back dispatches + one value fetch:

  full      : the production renderer
  no-nee    : _make_nee patched to visible := hit, no shadow walk
              (light normal/ke still consts) -> shadow-walk share
  no-walk   : main attribute sweep patched to a fixed trivial hit
              (t=1, row-0 attrs) -> main-walk share
  scaffold  : kernel patched to identity -> sort/permute/switch share

Run on real TPU: python experiments/exp_bounce_anatomy.py
"""

import time
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops import pallas_bounce as pb
from orion_tpu.ops import pallas_bvh_path as pbp
from orion_tpu.ops import pallas_fused as pf
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


def build(scene, cam, **kw):
    return pb.make_bounce_path_renderer(scene, cam, samples=16,
                                        max_depth=8, light_samples=2,
                                        **kw)


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n = 256 * 256 * 16

    dt, img = timeit(build(scene, cam), key)
    print(f"full:      {dt:.3f}s  {n / dt / 1e6:.3f}M prim/s "
          f"mean={float(img.mean()):.5f}", flush=True)

    # --- no-nee: shadow walks replaced by visible := alive ---
    real_nee = pf._make_nee

    def nee_novis(sweep, emitter, seed, pix, light_samples, **kw):
        class _S:
            def __call__(self, o, d, cols, alive=None, t_init=None):
                return sweep(o, d, cols, alive=alive, t_init=t_init)

        s2 = _S()
        s2.shadow_em = lambda o, d, alive=None, **k: (
            jnp.ones(jnp.broadcast_shapes(o[0].shape, d[0].shape), bool)
            if alive is None else alive)
        return real_nee(s2, emitter, seed, pix, light_samples, **kw)

    with mock.patch.object(pf, "_make_nee", nee_novis), \
            mock.patch.object(pb, "_make_nee", nee_novis):
        dt_nn, img_nn = timeit(build(scene, cam), key)
    print(f"no-nee:    {dt_nn:.3f}s  => shadow walks ~{dt - dt_nn:.3f}s "
          f"mean={float(img_nn.mean()):.5f}", flush=True)

    # --- no-walk: main sweep returns a fixed trivial hit ---
    real_sweep_maker = pbp._make_path_sweep

    def sweep_trivial(node, tab_ref, M):
        real = real_sweep_maker(node, tab_ref, M)

        def sweep(o, d, attr_cols, alive=None, t_init=None):
            shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
            one = jnp.ones(shape, jnp.float32)
            hit = (jnp.ones(shape, bool) if alive is None else alive)
            got = {c: tab_ref[c:c + 1, 0:1] * one for c in attr_cols}
            return one, hit, 0.3 * one, 0.3 * one, got

        sweep.any_hit = real.any_hit
        sweep.shadow_em = real.shadow_em
        return sweep

    with mock.patch.object(pbp, "_make_path_sweep", sweep_trivial), \
            mock.patch.object(pb, "_make_path_sweep", sweep_trivial):
        dt_nw, _ = timeit(build(scene, cam), key)
    print(f"no-walk:   {dt_nw:.3f}s  => main walk ~{dt - dt_nw:.3f}s",
          flush=True)

    # --- lean-carry: walk carries ONE attr plane instead of 17 ---
    def sweep_lean(node, tab_ref, M):
        real = real_sweep_maker(node, tab_ref, M)

        def sweep(o, d, attr_cols, alive=None, t_init=None):
            t, hit, u, v, got = real(o, d, (0,), alive=alive,
                                     t_init=t_init)
            p = got[0]
            return t, hit, u, v, {c: p for c in attr_cols}

        sweep.any_hit = real.any_hit
        sweep.shadow_em = real.shadow_em
        sweep.shadow_em2 = real.shadow_em2
        return sweep

    with mock.patch.object(pbp, "_make_path_sweep", sweep_lean), \
            mock.patch.object(pb, "_make_path_sweep", sweep_lean):
        dt_lc, _ = timeit(build(scene, cam), key)
    print(f"lean-carry:{dt_lc:.3f}s  => attr-carry cost ~{dt - dt_lc:.3f}s",
          flush=True)

    # --- scaffold: kernel -> identity ---
    real_build = pb.build_bounce_call
    with mock.patch.object(
            pb, "build_bounce_call",
            lambda *a, **k: lambda seed, depth, *rest: (rest[-3],
                                                        rest[-2])):
        dt_sc, _ = timeit(build(scene, cam), key)
    print(f"scaffold:  {dt_sc:.3f}s  (sort+permute+switch+scatter)",
        flush=True)

    # --- per-depth live fractions (occupancy ground truth) ---
    assert pb.build_bounce_call is real_build


if __name__ == "__main__":
    main()
