"""Round-4 (VERDICT r3 #9): op-by-op floor analysis of the fused
megakernel's gap to VPU speed-of-light.

BENCHMARKS.md's roofline credits ONLY Woop-test flops (48/test) and
lands the headline kernel at ~30% of the measured 1.62 Tflop/s FMA
ceiling. This experiment attributes the other ~70% by (a) measuring
in-situ stage shares (monkeypatched kernel variants, N-dispatch + one
fetch timing), and (b) counting the non-MT vector ops the estimator
REQUIRES per bounce, to argue how much of the gap is a floor of the
estimator's op mix rather than kernel inefficiency.

Stages of the regenerative fused kernel per bounce (cornell headline,
T_pad = 128 resident rows):
  main sweep     : woop planes [T_pad, RB] + winner select + MXU
                   attribute gather
  NEE x2         : light-sample draws (PCG4D) + shadow sweep + BRDF term
  shading/RR     : emissive term, cosine bounce (sin/cos/sqrt), RR,
                   regeneration bookkeeping

Run on TPU: python experiments/exp_mfu_floor.py
"""

import time
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np

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


def build(scene, cam):
    return pf.make_fused_path_renderer(scene, cam, samples=16, max_depth=8,
                                  light_samples=2)


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    r.xres = r.yres = 512
    cam = camera_from_rtc(r)
    key = jax.random.key(0)
    n = 512 * 512 * 16

    dt, img = timeit(build(scene, cam), key)
    print(f"full:     {dt * 1e3:7.2f} ms  {n / dt / 1e6:6.1f}M prim/s "
          f"mean={float(img.mean()):.5f}", flush=True)

    # no-nee: shadow sweeps + light-sample draws replaced by zero
    # contribution (visible := False would still walk; zero the whole
    # nee closure instead)
    real_nee = pf._make_nee

    def nee_zero(sweep, emitter, seed, pix, light_samples, **kw):
        def nee(samp, depth, h, gn, sn, hit):
            z = jnp.zeros_like(h[0])
            return [z, z, z], z

        return nee

    with mock.patch.object(pf, "_make_nee", nee_zero):
        dt_nn, _ = timeit(build(scene, cam), key)
    print(f"no-nee:   {dt_nn * 1e3:7.2f} ms  => NEE (draws + 2 shadow "
          f"sweeps + BRDF) ~{(dt - dt_nn) * 1e3:.2f} ms", flush=True)

    # single light sample: isolates ONE shadow sweep
    fn_ls1 = pf.make_fused_path_renderer(scene, cam, samples=16, max_depth=8,
                                    light_samples=1)
    dt_l1, _ = timeit(fn_ls1, key)
    print(f"ls=1:     {dt_l1 * 1e3:7.2f} ms  => one shadow-sample set "
          f"~{(dt - dt_l1) * 1e3:.2f} ms", flush=True)

    # counted op classes per bounce per live lane (static attribution):
    T = 40  # resident rows (cornell 40 tris; _fused_t_pad rounds to 8)
    mt = 48 * T * 3           # 3 sweeps (1 bounce + 2 NEE) x woop flops
    winner = (2 * T + 40) * 3  # t_min reduce + row tie + select, /sweep
    rng = 4 * 28 * 3          # PCG4D rounds: jitter + light x2 + RR site
    shade = 260               # emissive+BRDF+cosine bounce+RR+regen
    total = mt + winner + rng + shade
    print(f"counted VPU ops/lane/bounce: MT {mt} ({mt / total:.0%}) "
          f"winner {winner} ({winner / total:.0%}) rng {rng} "
          f"({rng / total:.0%}) shade {shade} ({shade / total:.0%})",
          flush=True)
    print("=> MT-creditable share of REQUIRED vector work "
          f"~{mt / total:.0%}; at the measured ~30%-of-SOL MT rate the "
          "kernel runs at ~"
          f"{0.40 / (mt / total):.0%} of the estimator's op-mix floor "
          "(fast-NEE headline: 60.3M prim/s ~= 40% of the 1.62T FMA SOL)",
          flush=True)


if __name__ == "__main__":
    main()
