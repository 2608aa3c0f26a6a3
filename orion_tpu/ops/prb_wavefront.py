"""Wavefront path-replay backpropagation: differentiable path tracing
with the divergence-free binned sweep (VERDICT r3 next #4).

ops/pallas_prb.py / ops/pallas_bvh_prb.py compute material gradients in
closed form by replaying each path inside a REGENERATIVE megakernel —
fast while the walk is fast, but on enclosed big scenes the resident
walk collapses under bounce-ray divergence (0.077M fwd+bwd rays/s at
35k tris, BENCHMARKS.md). This module runs the SAME estimator and the
SAME closed-form adjoints in WAVEFRONT form over any jnp-level sweep
with _make_geom's contract — concretely the binned dense sweep
(ops/pallas_binned.py), whose per-round kernels never walk a tree.

Shape of a train step (all one jit):
  1. forward: lax.scan of _make_bounce_step over depth — each
     (pixel, sample) lane accumulates its OWN radiance L_s in place
     (the wavefront needs none of the regen megakernel's per-sample
     one-hot planes: a lane IS a sample).
  2. loss + cotangents: image = scatter-add by pixel / spp; per-lane
     weight w = dLoss/dL_s gathered back by pixel id.
  3. replay: lax.scan of _make_replay_step — recomputes the forward's
     bounce values (same sweep, same PCG4D draws keyed on
     (pixel, sample, depth): bit-identical), maintains remaining
     radiance U_{d+1} = U_d - contrib_d, and accumulates the
     closed-form adjoints of pallas_prb.replay_impl:
       d kd[m,c] += w_c T_c A_c + w_c U_c / kd_c
                    - share_c inv_p sum_c' w_c' U_c'
       d ke[m,c] += w_c T_c em_scale          (depth-0 emissive)
       d ke[em,c] += w_c T_c kd_c sum_scale   (NEE, single-emitter gate)
     routed to material rows by a scatter-add over winner mesh ids.

Oracle: reverse-mode AD of the identical jnp estimator (brute sweep
over the same bundled table, differentiable via tab_updater_from_bvh)
— tests/test_prb_wavefront.py.

vs the reference: no analogue at any scale — the reference computes no
gradients (SURVEY §7 layer 6 is our addition; BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.ops.pallas_binned import (MAX_ROWS, RAY_BLOCK,
                                         binned_consts,
                                         binned_device_data,
                                         binned_sweep_from,
                                         build_bin_round_call)
from orion_tpu.ops.pallas_bounce import (BIAS, _make_bounce_step,
                                         wavefront_rays)
from orion_tpu.ops.pallas_bvh_path import bvh_path_supported
from orion_tpu.ops.pallas_bvh_prb import tab_updater_from_bvh
from orion_tpu.ops.pallas_fused import (_BOUNCE_ATTRS, _C_AREA, _C_KD,
                                        _C_KE, _C_MESH, _C_N0,
                                        _cosine_bounce, _emitters_consts,
                                        _gn_from_got, _interp_n,
                                        _make_nee, _norm3,
                                        _rr_bounce_draws, camera_vec,
                                        seed_scalar)
from orion_tpu.ops.pallas_prb import M_LANES
from orion_tpu.scene import Scene


def wavefront_train_supported(scene: Scene) -> bool:
    """Gate: bvh-path scene, <= M_LANES materials, ONE emissive mesh.
    No spp cap — a lane IS a sample (the regen megakernels' MAX_SAMPLES
    carry-plane limit does not apply)."""
    return (bvh_path_supported(scene) and scene.num_meshes <= M_LANES
            and scene.num_emissive == 1)


def _make_replay_step(sweep, emitter, seed, light_samples: int,
                      max_depth: int):
    """One replay bounce: recompute _make_bounce_step's values (same
    sweep, same draws — bit-identical floats), update the remaining
    radiance U, and emit the closed-form material adjoints.

    step(pix, samp, depth, o, d, T, U, alive, w3) ->
      (g_kd3, g_ke3, ek3, mat, new_o, new_d, new_T, new_U, new_alive)
    where g_* are per-lane adjoint planes to scatter-add onto the
    winner's material row, ek3 the NEE mat_emissive adjoint (single
    emitter: sum over lanes, scatter to its row)."""

    def step(pix, samp, depth, o, d, T, U, alive, w3):
        nee = _make_nee(sweep, emitter, seed, pix, light_samples)

        t, hit, u, v, got = sweep(o, d, _BOUNCE_ATTRS, alive=alive)
        hitf = hit.astype(jnp.float32)
        hx, hy, hz = o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2]
        sn = _interp_n(u, v, got, _C_N0, _C_N0 + 3, _C_N0 + 6)
        gn = _gn_from_got(got)
        kd = (got[_C_KD], got[_C_KD + 1], got[_C_KD + 2])

        ndx, ndy, ndz = _norm3(*d)
        cosv = -(ndx * sn[0] + ndy * sn[1] + ndz * sn[2])
        em_scale = jnp.where((depth == 0) & hit, got[_C_AREA] * cosv, 0.0)
        A, sum_scale = nee(samp, depth, (hx, hy, hz), gn, sn, hit)
        r = tuple(got[_C_KE + c] * em_scale + kd[c] * A[c]
                  for c in range(3))
        contrib = tuple(T[c] * r[c] * hitf for c in range(3))
        # U_{d+1}: remaining radiance AFTER this bounce (same floats,
        # same order as the forward's accumulation)
        U = tuple(U[c] - contrib[c] for c in range(3))

        u_rr, u1, u2 = _rr_bounce_draws(seed, pix, samp, depth)
        p_cont = jnp.maximum(jnp.maximum(kd[0], kd[1]), kd[2])
        cont = hit & (depth < max_depth) & (u_rr <= p_cont)
        safe_p = jnp.where(p_cont > 0.0, p_cont, 1.0)
        inv_p = jnp.where(p_cont > 0.0, 1.0 / safe_p, 0.0)

        # adjoints (pallas_prb.replay_impl's closed forms)
        ties = [(kd[c] == p_cont).astype(jnp.float32) for c in range(3)]
        tie_n = ties[0] + ties[1] + ties[2]
        wU = w3[0] * U[0] + w3[1] * U[1] + w3[2] * U[2]
        amax_term = -inv_p * wU / jnp.maximum(tie_n, 1.0)
        g_kd = tuple(
            w3[c] * T[c] * A[c]
            + jnp.where(kd[c] > 0.0,
                        w3[c] * U[c] / jnp.maximum(kd[c], 1e-30), 0.0)
            + ties[c] * amax_term
            for c in range(3))
        g_ke = tuple(w3[c] * T[c] * em_scale for c in range(3))
        ek = tuple(w3[c] * T[c] * kd[c] * sum_scale for c in range(3))

        bd = _cosine_bounce(sn, u1, u2)
        contf = cont.astype(jnp.float32)
        new_o = tuple(jnp.where(cont, (hx, hy, hz)[c] + sn[c] * BIAS,
                                o[c]) for c in range(3))
        new_d = tuple(jnp.where(cont, bd[c], d[c]) for c in range(3))
        new_T = tuple(T[c] * kd[c] * inv_p * contf for c in range(3))
        return (g_kd, g_ke, ek, got[_C_MESH], new_o, new_d, new_T, U,
                cont)

    return step


def make_binned_train_step(scene: Scene, camera, target, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           max_rows: int = MAX_ROWS,
                           ray_block: int = RAY_BLOCK,
                           interpret: bool | None = None,
                           dynamic_params: bool = False):
    """MSE train step against `target` with the binned dense sweep:
    forward wavefront + replay wavefront, gradients w.r.t. the material
    tables — the fwd+bwd north-star metric past the brute gate without
    the walk's divergence collapse.

    dynamic_params=False: `step(key) -> (loss, grads)` over the baked
    scene. dynamic_params=True: `step(params, key) -> (loss, grads)`,
    params over {mat_diffuse, mat_emissive} (table material rows rebuilt
    in-graph; tree and bins untouched)."""
    if not wavefront_train_supported(scene):
        raise ValueError("scene outside the wavefront-train gate "
                         "(textures / emitters / materials)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    H, W = camera.yres, camera.xres
    n_pix = H * W
    N = n_pix * samples
    M = int(scene.num_meshes)

    bins, tab0, bvh = binned_device_data(scene, max_rows=max_rows)
    update = tab_updater_from_bvh(bvh, scene)
    emitter = _emitters_consts(scene)
    em_mesh = emitter[0][0]
    cam_v = camera_vec(camera)
    n_pad = ((max(N, ray_block) + ray_block - 1)
             // ray_block) * ray_block
    call = build_bin_round_call(bins.k, n_pad, ray_block, interpret)
    consts0 = binned_consts(bins, tab0)
    target = jnp.asarray(target, jnp.float32)
    depths = jnp.arange(max_depth + 1, dtype=jnp.int32)

    @jax.jit
    def _impl(seed_arr, consts):
        sweep = binned_sweep_from(consts, k=bins.k, n_rays=N, call=call,
                                  ray_block=ray_block)
        seed = seed_arr[0]
        pix, samp, o0, d0 = wavefront_rays(seed, cam_v, W, H, samples)
        fwd = _make_bounce_step(sweep, emitter, seed, light_samples,
                                max_depth)

        ones = jnp.ones_like(o0[0])
        alive0 = jnp.ones(o0[0].shape, bool)
        zeros3 = tuple(jnp.zeros_like(o0[0]) for _ in range(3))

        def fwd_body(carry, depth):
            o, d, thr, alive, acc = carry
            rad, o, d, thr, alive = fwd(pix, samp, depth, o, d, thr,
                                        alive)
            acc = tuple(a + r for a, r in zip(acc, rad))
            return (o, d, thr, alive, acc), None

        (_, _, _, _, ls), _ = jax.lax.scan(
            fwd_body, (o0, d0, (ones, ones, ones), alive0, zeros3),
            depths)

        # image + loss + per-lane cotangent
        pix_f = pix[0]
        lane_rgb = jnp.stack([c[0] for c in ls], axis=-1)      # [N, 3]
        img = jnp.zeros((n_pix, 3), jnp.float32).at[pix_f].add(
            lane_rgb) / np.float32(samples)
        diff = img.reshape(H, W, 3) - target
        loss = jnp.mean(diff * diff)
        w_pix = (diff * np.float32(2.0 / (H * W * 3 * samples))
                 ).reshape(n_pix, 3)
        w_lane = w_pix[pix_f]                                   # [N, 3]
        w3 = tuple(w_lane[:, c][None] for c in range(3))

        # replay
        replay = _make_replay_step(sweep, emitter, seed, light_samples,
                                   max_depth)
        acc0 = jnp.zeros((M_LANES, 8), jnp.float32)
        ek0 = tuple(jnp.zeros((), jnp.float32) for _ in range(3))

        def rep_body(carry, depth):
            o, d, T, U, alive, acc, ek = carry
            (g_kd, g_ke, ekd, mat, o, d, T, U, alive) = replay(
                pix, samp, depth, o, d, T, U, alive, w3)
            G = jnp.stack([g_kd[0][0], g_kd[1][0], g_kd[2][0],
                           g_ke[0][0], g_ke[1][0], g_ke[2][0],
                           jnp.zeros(N, jnp.float32),
                           jnp.zeros(N, jnp.float32)], axis=-1)  # [N, 8]
            acc = acc.at[mat[0].astype(jnp.int32)].add(G)
            ek = tuple(ek[c] + jnp.sum(ekd[c]) for c in range(3))
            return (o, d, T, U, alive, acc, ek), None

        (_, _, _, _, _, acc, ek), _ = jax.lax.scan(
            rep_body,
            (o0, d0, (ones, ones, ones), ls, alive0, acc0, ek0),
            depths)

        g_kd = acc[:M, 0:3]
        g_ke = acc[:M, 3:6].at[em_mesh].add(jnp.stack(ek))
        return loss, {"mat_diffuse": g_kd, "mat_emissive": g_ke}

    if not dynamic_params:
        def step(key):
            return _impl(seed_scalar(key), consts0)

        return step

    def step_params(params, key):
        bad = set(params) - {"mat_diffuse", "mat_emissive"}
        if bad:
            raise ValueError(f"PRB differentiates material tables only; "
                             f"got {sorted(bad)}")
        s = dataclasses.replace(scene, **params)
        consts = dict(consts0, tab=update(s))
        loss, g = _impl(seed_scalar(key), consts)
        return loss, {k: g[k] for k in params}

    return step_params
