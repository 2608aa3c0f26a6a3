"""Measured roofline for the intersection kernels (VERDICT round 1 #4).

Empirical chip ceilings (measured, not quoted):
  - VPU f32 peak proxy: a long fused multiply-add chain on a resident
    vector (compute-bound by construction).
  - HBM bandwidth: reduction over a multi-GB array (bandwidth-bound).

Kernel work accounting:
  - The Woop-transform test costs ~48 VPU flops per ray-triangle test
    (counted from woop_tuv: 3 offset-dots = 18, 3 dots = 15, div+neg = 2,
    2 FMAs = 4, predicate = 9). The pre-Woop Möller-Trumbore form was
    ~53 (3 crosses = 27, 4 dots = 20, 1 div, 5 compares) — nearly the
    same IDEALIZED count, yet measured 3.5x slower on the leaf plane
    (exp_mt_variants.py): the cross products forced extra vector
    shuffles/temporaries the count never credited. Flop-accounting
    percentages below use the Woop count and are therefore comparable
    across kernels but NOT across rounds (round-2's committed table used
    53 against the MT kernels of its day).
  - Brute kernel: rays/s x T_pad tests/ray.
  - BVH packet kernel: tests/ray = (leaf visits per block) x 128 x RB /
    RB, taken from a host-side simulation of the block-uniform
    skip-pointer walk over a sample of real ray blocks (same algorithm
    as the kernel, numpy).

Run on TPU: `python experiments/exp_roofline.py`; JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WOOP_FLOPS = 48.0  # per-ray-triangle Woop unit-triangle test (was 53.0 for MT)


def measure_vpu_peak():
    import jax
    import jax.numpy as jnp

    # 256 FMAs fused per element per pass (unrolled inside the loop body,
    # so XLA emits one register-resident chain): 64 f32-flops/byte — far
    # past the ridge, compute-bound by construction. A fori_loop of
    # single FMAs would re-stream the array from HBM every iteration and
    # measure bandwidth instead.
    n = 2 * 1024 * 1024
    unroll = 256
    k = 8
    x = jnp.ones((n,), jnp.float32) * 1.000001
    a = jnp.float32(0.999999)
    b = jnp.float32(1e-7)

    @jax.jit
    def chain(x):
        def body(i, x):
            for _ in range(unroll):
                x = x * a + b
            return x
        return jax.lax.fori_loop(0, k, body, x)

    y = chain(x)
    _ = float(jnp.sum(y))
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        y = chain(y)
    _ = float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * n * unroll * k / dt  # FMA = 2 flops


def measure_hbm_bw():
    """Streaming triad y = a*x + y over 1 GB arrays: 8 B read + 4 B
    written per element, trivially vectorized (a reduction serializes on
    the accumulator tree and under-reports). Dispatches back-to-back with
    one fetch so tunnel latency amortizes (round-1 lesson)."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024  # 1 GB f32 each
    x = jnp.ones((n,), jnp.float32)
    y = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def triad(x, y):
        return x * jnp.float32(1.000001) + y

    y = triad(x, y)
    _ = float(y[0])
    t0 = time.perf_counter()
    iters = 30
    for _ in range(iters):
        y = triad(x, y)
    _ = float(y[0])
    dt = (time.perf_counter() - t0) / iters
    return 12.0 * n / dt  # bytes moved / s


def simulate_packet_walk(bvh, orig, dirs, rb, n_blocks=64, seed=0):
    """Host replica of the kernel's block-uniform skip-pointer walk.
    Returns (mean node steps per block, mean leaf visits per block)."""
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    skip = np.asarray(bvh.node_skip)
    start = np.asarray(bvh.node_start)
    M = bvh.num_nodes
    N = orig.shape[0]
    rng = np.random.default_rng(seed)
    blocks = rng.choice(N // rb, size=min(n_blocks, N // rb), replace=False)
    tot_steps = tot_leaves = 0
    for b in blocks:
        o = np.asarray(orig[b * rb:(b + 1) * rb], np.float64)
        d = np.asarray(dirs[b * rb:(b + 1) * rb], np.float64)
        inv = 1.0 / d
        t_best = np.full(rb, np.inf)
        ptr = 0
        while ptr < M:
            t0 = (lo[ptr] - o) * inv
            t1 = (hi[ptr] - o) * inv
            tmin = np.minimum(t0, t1).max(axis=1)
            tmax = np.maximum(t0, t1).min(axis=1)
            hit = (tmax >= tmin) & (tmax > 0) & (tmin < t_best)
            tot_steps += 1
            if hit.any():
                if start[ptr] >= 0:
                    tot_leaves += 1
                    # approximate t improvement: clamp t_best to the
                    # leaf's entry distance (cheap stand-in for MT)
                    t_best = np.where(hit, np.minimum(t_best, tmin + 1.0),
                                      t_best)
                    ptr = skip[ptr]
                else:
                    ptr += 1
            else:
                ptr = skip[ptr]
    nb = len(blocks)
    return tot_steps / nb, tot_leaves / nb


def main():
    import jax
    import jax.numpy as jnp

    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.camera import camera_from_rtc, primary_rays
    from orion_tpu.scene import load_scene

    vpu = measure_vpu_peak()
    print(json.dumps({"measure": "vpu_f32_flops_per_s", "value": vpu}),
          flush=True)
    hbm = measure_hbm_bw()
    print(json.dumps({"measure": "hbm_read_bytes_per_s", "value": hbm}),
          flush=True)

    # brute kernel achieved intensity on the cornell box
    from orion_tpu.engine import prepare
    from orion_tpu.ops.pallas_intersect import intersect_brute_pallas

    ps = prepare("/root/reference/assets/cornell-box.rtc", xres=512,
                 yres=512)
    orig, dirs = primary_rays(ps.camera, 0.0, 0.0)
    h = intersect_brute_pallas(ps.scene, orig, dirs)
    _ = float(jnp.sum(h.t))
    t0 = time.perf_counter()
    for _ in range(5):
        h = intersect_brute_pallas(ps.scene, orig, dirs)
    _ = float(jnp.sum(h.t))
    dt = (time.perf_counter() - t0) / 5
    n = orig.shape[0]
    t_pad = int(np.asarray(ps.scene.tri_v0).shape[0])
    flops = n * t_pad * WOOP_FLOPS / dt
    print(json.dumps({"measure": "brute_cornell",
                      "rays_per_s": round(n / dt, 1),
                      "tests_per_ray": t_pad,
                      "achieved_flops": flops,
                      "pct_of_vpu": round(100 * flops / vpu, 1)}),
          flush=True)

    # BVH packet kernel achieved intensity on nanosuit primaries
    scene, rtc = load_scene("/root/reference/assets/nanosuit.rtc")
    rtc.xres = rtc.yres = 1024
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.0, 0.0)
    signs = tuple(float(s) if s != 0 else 1.0
                  for s in np.sign(np.asarray(cam.front)))
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128, order_signs=signs)
    rb = 256
    steps, leaves = simulate_packet_walk(bvh, np.asarray(orig),
                                         np.asarray(dirs), rb)
    from orion_tpu.ops.pallas_bvh import make_bvh_intersect_pallas

    fn = make_bvh_intersect_pallas(bvh, scene, ray_block=rb)
    h = fn(scene, orig, dirs)
    _ = float(jnp.sum(h.t))
    t0 = time.perf_counter()
    for _ in range(5):
        h = fn(scene, orig, dirs)
    _ = float(jnp.sum(h.t))
    dt = (time.perf_counter() - t0) / 5
    n = orig.shape[0]
    n_blocks = n // rb
    mt_flops = n_blocks * leaves * 128 * rb * WOOP_FLOPS / dt
    slab_flops = n_blocks * steps * rb * 30.0 / dt
    print(json.dumps({"measure": "bvh_nanosuit_primary",
                      "rays_per_s": round(n / dt, 1),
                      "node_steps_per_block": round(steps, 1),
                      "leaf_visits_per_block": round(leaves, 1),
                      "tests_per_ray": round(leaves * 128, 1),
                      "achieved_mt_flops": mt_flops,
                      "achieved_total_flops": mt_flops + slab_flops,
                      "pct_of_vpu": round(
                          100 * (mt_flops + slab_flops) / vpu, 1)}),
          flush=True)

    # fused megakernel achieved intensity (BASELINE config 2). Work per
    # primary ray = bounces/sample x (1 nearest + ls shadow sweeps) x
    # T_pad MT tests; bounces/sample counted exactly by stepping the
    # replica's shared body on a small image (same estimator, same RNG
    # family — path-length statistics are resolution-invariant for a
    # fixed scene/camera).
    import dataclasses as _dc

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.ops import pallas_fused as pf

    scene2, rtc2 = load_scene("/root/reference/assets/cornell-box.rtc")
    samples_cfg, depth_cfg, ls_cfg = 16, 8, 2
    rtc_small = rtc2
    rtc_small.xres, rtc_small.yres = 96, 54
    cam_small = camera_from_rtc(rtc_small)
    npx = 96 * 54
    tab = pf.pack_fused_tri_table_jnp(scene2)
    pix = jnp.arange(npx, dtype=jnp.int32).reshape(1, npx)
    cv = pf.camera_vec(cam_small)
    seed = pf.seed_scalar(jax.random.key(0))[0]
    body, _, init = pf._make_regen_body(
        lambda c: tab[:, c:c + 1], lambda i: cv[i], seed, pix, npx,
        tab.shape[0], 96, 54, samples_cfg, depth_cfg, ls_cfg,
        pf._emitter_consts(scene2))
    carry = init(jnp.ones((1, npx), bool))
    active_steps = 0.0
    for _ in range(samples_cfg * (depth_cfg + 1)):
        active_steps += float(jnp.sum(carry[13] < samples_cfg))
        carry = body(carry)
    bounces_per_sample = active_steps / (npx * samples_cfg)

    rtc2.xres = rtc2.yres = 512
    cam512 = camera_from_rtc(rtc2)
    fn = pf.make_fused_path_renderer(scene2, cam512, samples=samples_cfg,
                                     max_depth=depth_cfg,
                                     light_samples=ls_cfg)
    k = jax.random.key(0)
    img = fn(k)
    _ = float(jnp.sum(img))
    t0 = time.perf_counter()
    for _ in range(5):
        img = fn(k)
    _ = float(jnp.sum(img))
    dt = (time.perf_counter() - t0) / 5
    rays = 512 * 512 * samples_cfg
    T_pad = tab.shape[0]
    mt = rays * bounces_per_sample * (1 + ls_cfg) * T_pad * WOOP_FLOPS / dt
    print(json.dumps({"measure": "fused_cornell_512_16spp",
                      "rays_per_s": round(rays / dt, 1),
                      "bounces_per_sample": round(bounces_per_sample, 3),
                      "mt_tests_per_primary": round(
                          bounces_per_sample * (1 + ls_cfg) * T_pad, 1),
                      "achieved_mt_flops": mt,
                      "pct_of_vpu": round(100 * mt / vpu, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
