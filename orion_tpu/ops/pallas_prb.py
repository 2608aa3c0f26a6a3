"""Path-replay backpropagation (PRB) megakernel: material gradients of the
fused path tracer, computed in closed form inside ONE Pallas kernel.

The wavefront trainer (optim.make_loss over render.py) gets its gradients
from JAX reverse-mode AD: every bounce's intermediates either live in HBM
as residuals or get rematerialized (remat="hits"). That caps fwd+bwd at a
few M rays/s — the HBM round-trips per bounce dominate exactly as they do
in the forward wavefront. This kernel instead computes the pixel-loss
gradient w.r.t. the material tables (mat_diffuse, mat_emissive) the way
the megakernel computes radiance: per-ray state resident in VMEM for the
whole sample loop, zero residual traffic.

Method — path replay backpropagation (the technique of Vicini, Speierer &
Jakob, "Path Replay Backpropagation", SIGGRAPH 2021, re-derived here for
this estimator): radiance decomposes as L = sum_d T_d * r_d with
per-channel throughput T_{d+1} = T_d * kd * inv_p. Differentiating,

  dL/dtheta = sum_d [ T_d * dr_d/dtheta  +  (df_d/dtheta) * U_{d+1} / f_d ]

where f_d = kd * inv_p is the bounce's throughput factor and
U_{d+1} = sum_{j>d} T_j r_j is the path's REMAINING radiance after bounce
d. U is obtained without storing the path: the forward kernel additionally
one-hot-accumulates each SAMPLE's total radiance L_s into per-sample
planes (pallas_fused._make_regen_body samp_slots), and the replay kernel
re-traces the identical paths (the PCG4D draws are pure functions of
(pixel, sample, depth, site) — regeneration order does not enter),
initializing U = L_s at each sample regeneration and subtracting each
bounce's contribution as it is re-encountered. Both accumulate the same
floats in the same order, so U hits exactly 0.0f at termination and dead
lanes contribute exactly zero gradient. The replay is REGENERATIVE like
the forward (terminated lanes immediately start their next sample), so a
full train step is two regen-rate kernel launches ≈ 2 forwards of work —
no lockstep depth-cap tail, no per-bounce residuals.

Per-bounce closed-form adjoints (w = dLoss/d(lane radiance), per channel):
  d kd[m_d, c]  += w_c * T_c * A_c                     (NEE: r_nee = kd*A)
                 + w_c * U_c / kd_c                     (throughput factor)
                 - share_c * inv_p * sum_c' w_c' U_c'   (p = max_c kd_c;
                   share = even split over argmax ties, matching
                   jnp.max's VJP in the jnp replica/wavefront)
  d ke[m_d, c]  += w_c * T_c * em_scale                 (depth-0 emissive)
  d ke[em, c]   += w_c * T_c * kd_c * sum_ls scale_ls   (NEE emitted color;
                   the gate guarantees ONE emissive mesh, so the shadow
                   winner's material is the static em id whenever visible)

Gradients are routed to materials with an MXU one-hot contraction: the
six per-lane gradient rows [8, RB] are contracted against the winner
material's one-hot plane [M_LANES, RB] into an [8, M_LANES] accumulator
(materials ride lanes), which accumulates across bounces, samples, and
sequential grid blocks (TPU grid = one core, constant out-block mapping).

Oracle: tests/test_prb.py checks these adjoints against reverse-mode AD
of `pallas_fused.fused_reference_render` — the SAME estimator math (same
builders, same RNG), differentiable end-to-end — so any calculus error
here is a test failure, not noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.ops.pallas_fused import (
    _BOUNCE_ATTRS, _C_AREA, _C_KD, _C_KE, _C_MESH,
    _C_N0, _C_N1, _C_N2, _cosine_bounce, _emitter_consts, _gn_from_got,
    _interp_n, _make_geom, _make_nee, _make_primary, _make_regen_body,
    _norm3, _rr_bounce_draws, BIAS, FUSED_CHUNK, RAY_BLOCK, camera_vec,
    fused_path_supported, pack_fused_tri_table, seed_scalar)
from orion_tpu.scene import Scene

M_LANES = 128   # materials ride accumulator lanes
MAX_SAMPLES = 32  # per-sample radiance planes live in the carry


def fused_train_supported(scene: Scene, samples: int = 1) -> bool:
    """Gate: fused-path scene, <= M_LANES materials, bounded spp, ONE
    emissive mesh (the replay's mat_emissive adjoint scatters to a single
    emitter lane; multi-emitter scenes train through the wavefront)."""
    return (fused_path_supported(scene) and scene.num_meshes <= M_LANES
            and samples <= MAX_SAMPLES and scene.num_emissive == 1)


def _ls_rows(samples: int) -> int:
    return ((3 * samples + 7) // 8) * 8


def _make_fwd_ls_kernel(T_pad: int, W: int, H: int, samples: int,
                        max_depth: int, light_samples: int, emitter,
                        n_pix: int):
    """Forward megakernel that ALSO emits per-sample radiance planes."""

    def kernel(cam_ref, seed_ref, base_ref, tri_ref, out_ref, ls_ref):
        rb = out_ref.shape[1]
        seed = seed_ref[0]

        def cam(i):
            return cam_ref[i]

        def col(c):
            return tri_ref[:, c:c + 1]

        def col_dyn(off, c):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), c:c + 1]

        def blk_dyn(off):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), :]

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        body, cond, init = _make_regen_body(
            col, cam, seed, pix, n_pix, T_pad, W, H, samples, max_depth,
            light_samples, emitter, samp_slots=samples, col_dyn=col_dyn,
            blk_dyn=blk_dyn)
        carry = jax.lax.while_loop(cond, body, init(in_image))
        inv_s = np.float32(1.0 / samples)
        out_ref[0:1, :] = carry[9] * inv_s
        out_ref[1:2, :] = carry[10] * inv_s
        out_ref[2:3, :] = carry[11] * inv_s
        out_ref[3:8, :] = jnp.zeros((5, rb), jnp.float32)
        for k in range(3 * samples):
            ls_ref[k:k + 1, :] = carry[14 + k]
        for k in range(3 * samples, _ls_rows(samples)):
            ls_ref[k:k + 1, :] = jnp.zeros((1, rb), jnp.float32)

    return kernel


def replay_impl(sweep, cam, seed, pix, in_image, w_ref, ls_ref, out_ref,
                emitter, samples, max_depth, light_samples, W, H):
    """The replay pass over a prebuilt geometry sweep (shared between the
    brute-sweep kernel below and the BVH replay kernel in
    ops/pallas_bvh_prb.py — same closed-form adjoints, same U
    bookkeeping, different intersection)."""
    em_mesh = emitter[0]
    # static one-hot scatter targets for the NEE mat_emissive adjoint
    # (built from iotas: pallas kernels cannot capture array consts)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, M_LANES), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (8, M_LANES), 1)
    em_masks = [((row_i == 3 + ch)
                 & (col_i == em_mesh)).astype(jnp.float32)
                for ch in range(3)]
    rb = w_ref.shape[1]

    primary = _make_primary(cam, seed, pix, W, H)
    nee = _make_nee(sweep, emitter, seed, pix, light_samples)

    w3 = (w_ref[0:1, :], w_ref[1:2, :], w_ref[2:3, :])
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (M_LANES, rb), 0)
    S = jnp.int32(samples)

    def l_of(samp, c):
        """L_{samp, c} via one-hot select over the sample planes
        (zero when samp == S: no plane matches)."""
        out = jnp.zeros((1, rb), jnp.float32)
        for s in range(samples):
            out += jnp.where(samp == s, ls_ref[3 * s + c:3 * s + c + 1,
                                               :], 0.0)
        return out

    def bounce_common(o, d, T, depth, samp):
        """Replayed bounce math (bit-identical to the forward body's
        value computations — U bookkeeping depends on it)."""
        t, hit, u, v, got = sweep(o, d, _BOUNCE_ATTRS)
        hitf = hit.astype(jnp.float32)
        hx = o[0] + t * d[0]
        hy = o[1] + t * d[1]
        hz = o[2] + t * d[2]
        sn = _interp_n(u, v, got, _C_N0, _C_N1, _C_N2)
        gn = _gn_from_got(got)
        kd = (got[_C_KD], got[_C_KD + 1], got[_C_KD + 2])

        ndx, ndy, ndz = _norm3(*d)
        cosv = -(ndx * sn[0] + ndy * sn[1] + ndz * sn[2])
        em_scale = jnp.where((depth == 0) & hit,
                             got[_C_AREA] * cosv, 0.0)
        A, sum_scale = nee(samp, depth, (hx, hy, hz), gn, sn, hit)
        r = tuple(got[_C_KE + c] * em_scale + kd[c] * A[c]
                  for c in range(3))
        contrib = tuple(T[c] * r[c] * hitf for c in range(3))

        u_rr, u1, u2 = _rr_bounce_draws(seed, pix, samp, depth)
        p_cont = jnp.maximum(jnp.maximum(kd[0], kd[1]), kd[2])
        cont = hit & (depth < max_depth) & (u_rr <= p_cont) \
            & (samp < S)
        safe_p = jnp.where(p_cont > 0.0, p_cont, 1.0)
        inv_p = jnp.where(p_cont > 0.0, 1.0 / safe_p, 0.0)
        bd = _cosine_bounce(sn, u1, u2)
        no = (hx + sn[0] * BIAS, hy + sn[1] * BIAS, hz + sn[2] * BIAS)
        return dict(kd=kd, p=p_cont, inv_p=inv_p, A=A,
                    em_scale=em_scale, sum_scale=sum_scale,
                    mat=got[_C_MESH], cont=cont, bd=bd, no=no,
                    contrib=contrib)

    def body(c):
        o, d, T, U, depth, samp, acc, ek = c
        st = bounce_common(o, d, T, depth, samp)
        # U_{d+1}: remaining radiance AFTER this bounce (exact: the
        # forward accumulated the same floats in the same order)
        U = tuple(U[i] - st["contrib"][i] for i in range(3))

        kd, p, inv_p = st["kd"], st["p"], st["inv_p"]
        # even split over argmax ties (jnp.max VJP convention)
        ties = [(kd[c] == p).astype(jnp.float32) for c in range(3)]
        tie_n = ties[0] + ties[1] + ties[2]
        wU = (w3[0] * U[0] + w3[1] * U[1] + w3[2] * U[2])
        amax_term = -inv_p * wU / jnp.maximum(tie_n, 1.0)

        g_rows = []
        for c in range(3):
            g_kd = (w3[c] * T[c] * st["A"][c]
                    + jnp.where(kd[c] > 0.0,
                                w3[c] * U[c]
                                / jnp.maximum(kd[c], 1e-30), 0.0)
                    + ties[c] * amax_term)
            g_rows.append(g_kd)
        for c in range(3):
            g_rows.append(w3[c] * T[c] * st["em_scale"])
        g_rows.append(jnp.zeros((1, rb), jnp.float32))
        g_rows.append(jnp.zeros((1, rb), jnp.float32))
        G = jnp.concatenate(g_rows, axis=0)              # [8, RB]

        onehot = (lane_iota
                  == st["mat"].astype(jnp.int32)).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            G, onehot, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # [8, M]

        # NEE mat_emissive adjoint (static emitter material)
        ek = tuple(ek[c] + w3[c] * T[c] * kd[c] * st["sum_scale"]
                   for c in range(3))

        # advance WITH regeneration (mirrors the forward body)
        cont = st["cont"]
        n_samp = jnp.where(cont, samp, samp + 1)
        lane_on = n_samp < S
        p_o = primary(n_samp)
        onf = lane_on.astype(jnp.float32)
        o = tuple(jnp.where(cont, st["no"][i], p_o[i])
                  for i in range(3))
        d = tuple(jnp.where(cont, st["bd"][i], p_o[3 + i])
                  for i in range(3))
        T = tuple(jnp.where(cont, T[i] * kd[i] * inv_p, onf)
                  for i in range(3))
        U = tuple(jnp.where(cont, U[i], l_of(n_samp, i))
                  for i in range(3))
        depth = jnp.where(cont, depth + 1, 0)
        return (o, d, T, U, depth, n_samp, acc, ek)

    def cond(c):
        return jnp.any(c[5] < S)

    samp0 = jnp.where(in_image, 0, S)
    p0 = primary(samp0)
    onf0 = (samp0 < S).astype(jnp.float32)
    zeros = jnp.zeros((1, rb), jnp.float32)
    c0 = ((p0[0], p0[1], p0[2]), (p0[3], p0[4], p0[5]),
          (onf0, onf0, onf0),
          tuple(l_of(samp0, c) for c in range(3)),
          jnp.zeros((1, rb), jnp.int32), samp0,
          jnp.zeros((8, M_LANES), jnp.float32),
          (zeros, zeros, zeros))
    out = jax.lax.while_loop(cond, body, c0)
    acc, ek = out[6], out[7]
    for c in range(3):
        acc = acc + jnp.sum(ek[c]) * em_masks[c]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


def _make_replay_kernel(T_pad: int, W: int, H: int, samples: int,
                        max_depth: int, light_samples: int, emitter,
                        n_pix: int):
    def kernel(cam_ref, seed_ref, base_ref, tri_ref, w_ref, ls_ref,
               out_ref):
        rb = w_ref.shape[1]
        seed = seed_ref[0]

        def cam(i):
            return cam_ref[i]

        def col(c):
            return tri_ref[:, c:c + 1]

        def col_dyn(off, c):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), c:c + 1]

        def blk_dyn(off):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), :]

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        _, sweep = _make_geom(col, T_pad, chunk=FUSED_CHUNK,
                              col_dyn=col_dyn, blk_dyn=blk_dyn)
        replay_impl(sweep, cam, seed, pix, in_image, w_ref, ls_ref,
                    out_ref, emitter, samples, max_depth, light_samples,
                    W, H)

    return kernel


def build_fwd_ls_call(T_pad: int, W: int, H: int, samples: int,
                      max_depth: int, light_samples: int, emitter,
                      n_pix: int, n_pad: int, ray_block: int,
                      interpret: bool):
    """Raw call: (cam [12], seed [1], pix_base [1], tab) ->
    (radiance [8, n_pad], per-sample L [pad8(3S), n_pad])."""
    kernel = _make_fwd_ls_kernel(T_pad, W, H, samples, max_depth,
                                 light_samples, emitter, n_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // ray_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_ls_rows(samples), ray_block),
                                lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((_ls_rows(samples), n_pad),
                                        jnp.float32)),
        interpret=interpret,
    )


def build_replay_call(T_pad: int, W: int, H: int, samples: int,
                      max_depth: int, light_samples: int, emitter,
                      n_pix: int, n_pad: int, ray_block: int,
                      interpret: bool):
    """Raw call: (cam, seed, pix_base, tab, w_planes [8, n_pad],
    ls_planes) -> [8, M_LANES] gradient accumulator."""
    kernel = _make_replay_kernel(T_pad, W, H, samples, max_depth,
                                 light_samples, emitter, n_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // ray_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((_ls_rows(samples), ray_block),
                               lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, M_LANES), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, M_LANES), jnp.float32),
        interpret=interpret,
    )


def _sizes(camera, ray_block):
    H, W = camera.yres, camera.xres
    n_pix = H * W
    n_pad = ((max(n_pix, ray_block) + ray_block - 1)
             // ray_block) * ray_block
    return H, W, n_pix, n_pad


def make_fused_grad_fn(scene: Scene, camera, *, samples: int,
                       max_depth: int, light_samples: int = 2,
                       ray_block: int = RAY_BLOCK,
                       interpret: bool | None = None):
    """Build `grads(key, dloss_dimg) -> dict` for the fused path scene.

    dloss_dimg is the loss cotangent w.r.t. the rendered image [H, W, 3]
    (e.g. 2*(img-target)/(H*W*3) for MSE). Returns per-material-table
    gradients {"mat_diffuse": [M, 3], "mat_emissive": [M, 3]} — exactly
    what reverse-mode AD of the estimator yields, computed by path
    replay instead of residual storage. Runs its own forward for the
    per-sample radiance record; make_fused_train_step shares one forward
    between the image and the replay instead.
    """
    if not fused_train_supported(scene, samples):
        raise ValueError("scene outside the fused-train gate "
                         "(textures / emitters / size / materials / spp)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, n_pix, n_pad = _sizes(camera, ray_block)
    M = int(scene.num_meshes)

    tri_tab = jnp.asarray(pack_fused_tri_table(scene))
    T_pad = tri_tab.shape[0]
    emitter = _emitter_consts(scene)
    args = (T_pad, W, H, samples, max_depth, light_samples, emitter,
            n_pix, n_pad, ray_block, interpret)
    fwd_call = build_fwd_ls_call(*args)
    replay_call = build_replay_call(*args)
    cam_v = camera_vec(camera)
    zero_base = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _impl(seed, w_planes, tab):
        _, ls = fwd_call(cam_v, seed, zero_base, tab)
        out = replay_call(cam_v, seed, zero_base, tab, w_planes, ls)
        return {"mat_diffuse": out[0:3, :M].T,
                "mat_emissive": out[3:6, :M].T}

    def grads(key, dloss_dimg, tab=None):
        # per-lane adjoint: lanes accumulate SUM over samples; the image
        # is the mean, so fold 1/samples into the cotangent
        w = (jnp.asarray(dloss_dimg, jnp.float32)
             .reshape(n_pix, 3).T / float(samples))        # [3, n_pix]
        w_planes = jnp.zeros((8, n_pad), jnp.float32)
        w_planes = w_planes.at[0:3, :n_pix].set(w)
        return _impl(seed_scalar(key), w_planes,
                     tri_tab if tab is None else tab)

    return grads


def make_fused_train_step(scene: Scene, camera, target, *, samples: int,
                          max_depth: int, light_samples: int = 2,
                          ray_block: int = RAY_BLOCK,
                          interpret: bool | None = None,
                          dynamic_params: bool = False):
    """MSE train step against `target`: one forward megakernel launch
    (which also records per-sample radiance) + one regen-rate replay
    launch — ~2 forward-equivalents of work, no per-bounce residuals.

    dynamic_params=False: `step(key) -> (loss, grads)` over the baked
    scene (benchmark form). dynamic_params=True:
    `step(params, key) -> (loss, grads)` where params is a dict over
    {mat_diffuse, mat_emissive} — the triangle table is rebuilt in-graph
    (pack_fused_tri_table_jnp) each call, so an optax loop can fit
    materials end-to-end at megakernel speed (optim.fit routes here)."""
    import dataclasses

    from orion_tpu.ops.pallas_fused import pack_fused_tri_table_jnp

    if not fused_train_supported(scene, samples):
        raise ValueError("scene outside the fused-train gate "
                         "(textures / emitters / size / materials / spp)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, n_pix, n_pad = _sizes(camera, ray_block)
    M = int(scene.num_meshes)

    tri_tab = jnp.asarray(pack_fused_tri_table(scene))
    T_pad = tri_tab.shape[0]
    emitter = _emitter_consts(scene)
    args = (T_pad, W, H, samples, max_depth, light_samples, emitter,
            n_pix, n_pad, ray_block, interpret)
    fwd_call = build_fwd_ls_call(*args)
    replay_call = build_replay_call(*args)
    cam_v = camera_vec(camera)
    zero_base = jnp.zeros((1,), jnp.int32)
    target = jnp.asarray(target, jnp.float32)

    def _loss_and_grads(tab, key, wanted):
        seed = seed_scalar(key)
        planes, ls = fwd_call(cam_v, seed, zero_base, tab)
        img = planes[0:3, :n_pix].T.reshape(H, W, 3)
        diff = img - target
        loss = jnp.mean(diff * diff)
        w = (diff * (2.0 / (H * W * 3 * samples))).reshape(n_pix, 3).T
        w_planes = jnp.zeros((8, n_pad), jnp.float32)
        w_planes = w_planes.at[0:3, :n_pix].set(w)
        out = replay_call(cam_v, seed, zero_base, tab, w_planes, ls)
        g = {"mat_diffuse": out[0:3, :M].T, "mat_emissive": out[3:6, :M].T}
        return loss, {k: g[k] for k in wanted}

    if not dynamic_params:
        @jax.jit
        def step(key):
            return _loss_and_grads(tri_tab, key,
                                   ("mat_diffuse", "mat_emissive"))

        return step

    def step_params(params, key):
        bad = set(params) - {"mat_diffuse", "mat_emissive"}
        if bad:
            raise ValueError(f"PRB differentiates material tables only; "
                             f"got {sorted(bad)}")
        s = dataclasses.replace(scene, **params)
        tab = pack_fused_tri_table_jnp(s)
        return _loss_and_grads(tab, key, tuple(params))

    return step_params
