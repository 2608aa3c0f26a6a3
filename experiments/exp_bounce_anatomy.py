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
  scaffold  : kernels patched to identity -> sort/permute/gather/
              switch share (the lean-walk/attr-gather split landed;
              the old no-walk/lean-carry probes are moot)

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

    # --- scaffold: both kernels -> identity (gather still runs) ---
    with mock.patch.object(
            pb, "build_walk_call",
            lambda num_nodes, n_pad, rb, interp, grid_sz=None, **kw:
            lambda *rest: jnp.zeros((8, grid_sz or n_pad),
                                    jnp.float32)), \
            mock.patch.object(
                pb, "build_shade_call",
                lambda *a, **k: lambda seed, depth, *rest:
                (rest[8],)):   # identity: return the state operand
        dt_sc, _ = timeit(build(scene, cam), key)
    print(f"scaffold:  {dt_sc:.3f}s  (sort+permute+gather+switch+scatter)",
          flush=True)


if __name__ == "__main__":
    main()
