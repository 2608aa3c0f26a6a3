"""Closed-form PRB training on the sorted-wavefront bounce pipeline:
the backward pass costs ~zero walks.

The regenerative PRB megakernels (ops/pallas_prb.py, pallas_bvh_prb.py)
REPLAY every path — a second full traversal pass — to recompute the
per-bounce values their closed-form material adjoints need. On enclosed
big scenes that doubles the dominant cost (the BVH walks), which is why
BVH-PRB sat at 0.077M fwd+bwd rays/s (VERDICT r3 weak #2).

This trainer instead has the FORWARD bounce kernel dump the 15 per-bounce
values the adjoints consume (kd, NEE radiance A, contribution, em_scale,
sum_scale, winner mesh, hit/cont flags, inv_p — _make_bounce_step
with_aux), one [16, n_pad] plane set per depth. The backward pass is
then pure per-lane arithmetic over the dumps:

    T_{d+1} = T_d kd inv_p cont          (throughput chain)
    U_{d+1} = U_d - contrib_d            (remaining radiance)
    d kd[m,c] += w_c T_c A_c + w_c U_c / kd_c - tie_c inv_p <w,U>/n_tie
    d ke[m,c] += w_c T_c em_scale        (depth-0 emissive)
    d ke[em,c] += w_c T_c kd_c sum_scale (NEE, single-emitter gate)

— no tree walks, no shadow rays, no sorts: fwd+bwd ~= forward + a few
ms of HBM-bound scatter/scan. The dumps arrive in each depth's own
sorted lane order with (pixel, sample) riders; a per-depth scatter by
lane id realigns them so the T/U chains line up per path.

Identities: the forward is make_bounce_path_renderer's exact pipeline
(same kernels, fast-shadow NEE, same PCG4D streams), so loss == the
renderer's image MSE bitwise. Adjoint formulas are
prb_wavefront._make_replay_step's closed forms; gradients match
reverse-mode AD of the equivalent jnp estimator to fp accuracy
(tests/test_bounce_prb.py — the ~1e-6 delta is the fast-shadow light
normal's fp path, not the adjoints).

vs the reference: no analogue — the reference computes no gradients
(SURVEY §7 layer 6; BASELINE.json north star fwd+bwd rays/s).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.ops.pallas_bounce import RAY_BLOCK, build_forward_pipeline
from orion_tpu.ops.pallas_bvh_prb import tab_updater_from_bvh
from orion_tpu.ops.pallas_fused import seed_scalar
from orion_tpu.ops.pallas_prb import M_LANES
from orion_tpu.ops.prb_wavefront import wavefront_train_supported
from orion_tpu.scene import Scene

# aux plane rows (the _make_bounce_step with_aux layout)
_A_KD, _A_A, _A_RAD = 0, 3, 6
_A_EMS, _A_SUMS, _A_MESH, _A_HIT, _A_CONT, _A_INVP = 9, 10, 11, 12, 13, 14


def make_bounce_train_core(scene: Scene, camera, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           ray_block: int = RAY_BLOCK, sort: bool = True,
                           interpret: bool | None = None,
                           pix_count: int | None = None):
    """(core, ctx): the tile-local closed-form PRB train computation —

        core(seed, tab, pix_base, target_local [pix_count, 3])
            -> (sse, acc [M_LANES, 8], ek [3])

    where sse is the tile's sum of squared pixel errors, acc the
    per-mesh material-gradient accumulator (cols 0-2 kd, 3-5 ke), and
    ek the NEE emitter-ke gradient triple. EVERYTHING is local to the
    tile: per-tile wavefront, per-tile sorts/compaction, per-tile dump
    realignment — so parallel/fused_shard can run one core per chip
    with scene/tree replicated and reduce (sse, acc, ek) with a single
    psum (SURVEY §2.4: ray DP for the production trainer). The MSE
    normalization constant is GLOBAL (H*W*3*samples), so sharded
    gradients sum to the single-chip values exactly."""
    if not wavefront_train_supported(scene):
        raise ValueError("scene outside the wavefront-train gate "
                         "(textures / emitters / materials)")
    pipeline, ctx = build_forward_pipeline(
        scene, camera, samples=samples, max_depth=max_depth,
        light_samples=light_samples, ray_block=ray_block, sort=sort,
        interpret=interpret, with_aux=True, pix_count=pix_count)
    H, W = ctx["H"], ctx["W"]
    pc, N = ctx["pix_count"], ctx["N"]
    em_mesh = ctx["emitter"][0][0] if isinstance(ctx["emitter"], list) \
        else ctx["emitter"][0]

    def core(seed, tab, pix_base, target_local):
        st, (aux, pix_d, samp_d) = pipeline(seed, tab,
                                            pix_base=pix_base)

        # tile image + squared error + per-pixel cotangent
        img = jnp.zeros((pc, 3), jnp.float32)
        img = img.at[st[14].astype(jnp.int32) - pix_base].add(
            st[10:13].T, mode="drop")
        img = img / np.float32(samples)
        # tiles are padded to equal size: a last-chip tile can reach
        # past the image — those rows must not contribute error
        valid = ((jnp.arange(pc, dtype=jnp.int32) + pix_base)
                 < jnp.int32(ctx["n_pix"])).astype(jnp.float32)[:, None]
        diff = (img - target_local) * valid
        sse = jnp.sum(diff * diff)
        w_pix = diff * np.float32(2.0 / (H * W * 3 * samples))

        # realign each depth's dump to canonical tile-lane order
        # (lane = samp * pix_count + local pix; scatter-ADD so the zero
        # dumps of padding riders colliding on lane 0 cannot clobber
        # real values)
        lane_d = (samp_d * jnp.int32(pc)
                  + (pix_d - pix_base))                   # [D+1, n_pad]
        aligned = jax.vmap(
            lambda a, l: jnp.zeros((16, N), jnp.float32)
            .at[:, l].add(a, mode="drop"))(aux, lane_d)   # [D+1, 16, N]

        lane_pix = jnp.arange(N, dtype=jnp.int32) % jnp.int32(pc)
        w3 = w_pix[lane_pix].T                            # [3, N]

        # U_0 = per-lane total radiance, folded in depth order (bitwise
        # the forward's sequential accumulation)
        D1 = aligned.shape[0]
        U = (jnp.zeros(N, jnp.float32),) * 3
        for d in range(D1):
            U = tuple(U[c] + aligned[d, _A_RAD + c] for c in range(3))

        def rep_body(carry, dump):
            T, U, acc, ek = carry
            kd = tuple(dump[_A_KD + c] for c in range(3))
            A = tuple(dump[_A_A + c] for c in range(3))
            contrib = tuple(dump[_A_RAD + c] for c in range(3))
            em_scale, sum_scale = dump[_A_EMS], dump[_A_SUMS]
            mesh, contf, inv_p = dump[_A_MESH], dump[_A_CONT], \
                dump[_A_INVP]
            U = tuple(U[c] - contrib[c] for c in range(3))

            p_cont = jnp.maximum(jnp.maximum(kd[0], kd[1]), kd[2])
            ties = [(kd[c] == p_cont).astype(jnp.float32)
                    for c in range(3)]
            tie_n = ties[0] + ties[1] + ties[2]
            wU = w3[0] * U[0] + w3[1] * U[1] + w3[2] * U[2]
            amax_term = -inv_p * wU / jnp.maximum(tie_n, 1.0)
            g_kd = tuple(
                w3[c] * T[c] * A[c]
                + jnp.where(kd[c] > 0.0,
                            w3[c] * U[c] / jnp.maximum(kd[c], 1e-30),
                            0.0)
                + ties[c] * amax_term
                for c in range(3))
            g_ke = tuple(w3[c] * T[c] * em_scale for c in range(3))
            ekd = tuple(w3[c] * T[c] * kd[c] * sum_scale
                        for c in range(3))

            G = jnp.stack(g_kd + g_ke, axis=-1)           # [N, 6]
            acc = acc.at[mesh.astype(jnp.int32)].add(
                jnp.pad(G, ((0, 0), (0, 2))), mode="drop")
            ek = tuple(ek[c] + jnp.sum(ekd[c]) for c in range(3))
            T = tuple(T[c] * kd[c] * inv_p * contf for c in range(3))
            return (T, U, acc, ek), None

        acc0 = jnp.zeros((M_LANES, 8), jnp.float32)
        ek0 = tuple(jnp.zeros((), jnp.float32) for _ in range(3))
        ones = (jnp.ones(N, jnp.float32),) * 3
        (_, _, acc, ek), _ = jax.lax.scan(
            rep_body, (ones, U, acc0, ek0), aligned)
        return sse, acc, jnp.stack(ek)

    ctx = dict(ctx, em_mesh=em_mesh)
    return core, ctx


def make_bounce_train_step(scene: Scene, camera, target, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           ray_block: int = RAY_BLOCK, sort: bool = True,
                           interpret: bool | None = None,
                           dynamic_params: bool = False):
    """MSE train step against `target` over the sorted-wavefront bounce
    pipeline; gradients w.r.t. the material tables in closed form.

    dynamic_params=False: step(key) -> (loss, grads) over the baked
    scene. dynamic_params=True: step(params, key) -> (loss, grads) with
    params over {mat_diffuse} (table rows rebuilt in-graph; tree/bins
    untouched). mat_emissive stays static-only here: the fast-shadow NEE
    bakes the emitter ke as kernel constants, so a traced ke would
    silently decouple from the forward values — the step still RETURNS
    its closed-form gradient."""
    core, ctx = make_bounce_train_core(
        scene, camera, samples=samples, max_depth=max_depth,
        light_samples=light_samples, ray_block=ray_block, sort=sort,
        interpret=interpret)
    H, W = ctx["H"], ctx["W"]
    n_pix = ctx["n_pix"]
    M = int(scene.num_meshes)
    em_mesh = ctx["em_mesh"]
    target_flat = jnp.asarray(target, jnp.float32).reshape(n_pix, 3)
    tab0 = ctx["tab"]

    @jax.jit
    def _impl(seed, tab):
        sse, acc, ek = core(seed, tab, jnp.int32(0), target_flat)
        loss = sse / np.float32(H * W * 3)
        g_kd = acc[:M, 0:3]
        g_ke = acc[:M, 3:6].at[em_mesh].add(ek)
        return loss, {"mat_diffuse": g_kd, "mat_emissive": g_ke}

    if not dynamic_params:
        def step(key):
            return _impl(seed_scalar(key), tab0)

        return step

    # dynamic mat_diffuse: rebuild the table's material rows in-graph
    # (same tree) and thread the traced table through the pipeline.
    # mat_emissive stays static: the fast-shadow NEE bakes ke as kernel
    # constants, so a traced ke would silently decouple from the
    # forward's values — optim routes such fits to the regenerative
    # BVH-PRB step instead.
    update = tab_updater_from_bvh(ctx["bvh"], scene)

    def step_params(params, key):
        bad = set(params) - {"mat_diffuse"}
        if bad:
            raise ValueError(
                f"bounce-PRB differentiates mat_diffuse dynamically "
                f"(fast-shadow ke is baked); got {sorted(bad)}")
        s = dataclasses.replace(scene, **params)
        loss, g = _impl(seed_scalar(key), update(s))
        return loss, {k: g[k] for k in params}

    return step_params


def bounce_train_reference_grads(scene: Scene, camera, target, key, *,
                                 samples: int, max_depth: int,
                                 light_samples: int = 2):
    """Reverse-mode AD oracle: differentiate the identical jnp estimator
    (brute sweep over the same bundled table, LEGACY NEE — value-equal
    to the fast-shadow forward up to the light normal's fp path) w.r.t.
    the material table rows. Mirrors prb_wavefront's oracle."""
    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.ops.pallas_bounce import (_make_bounce_step,
                                             wavefront_rays)
    from orion_tpu.ops.pallas_fused import (_emitters_consts, _make_geom,
                                            camera_vec)

    H, W = camera.yres, camera.xres
    n_pix = H * W

    bvh, _ = build_bvh(np.asarray(scene.tri_v0),
                       np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    update = tab_updater_from_bvh(bvh, scene)
    emitter = _emitters_consts(scene)
    seed = seed_scalar(key)[0]
    cam_v = camera_vec(camera)
    target_ = jnp.asarray(target, jnp.float32)

    def loss_fn(params):
        s = dataclasses.replace(scene, **params)
        tab = update(s)
        tabT = tab.T

        def col(c):
            return tabT[:, c:c + 1]

        def blk():
            return tabT

        _, sweep = _make_geom(col, tabT.shape[0], chunk=None, blk=blk)
        step = _make_bounce_step(sweep, emitter, seed, light_samples,
                                 max_depth)
        pix, samp, o, d = wavefront_rays(seed, cam_v, W, H, samples)
        thr = tuple(jnp.ones_like(o[0]) for _ in range(3))
        alive = jnp.ones(o[0].shape, bool)
        acc = [jnp.zeros_like(o[0]) for _ in range(3)]

        def body(carry, depth):
            o, d, thr, alive, acc = carry
            rad, o, d, thr, alive = step(pix, samp, depth, o, d, thr,
                                         alive)
            acc = [a + r for a, r in zip(acc, rad)]
            return (o, d, thr, alive, acc), None

        (_, _, _, _, acc), _ = jax.lax.scan(
            body, (o, d, thr, alive, acc),
            jnp.arange(max_depth + 1, dtype=jnp.int32))
        lane_rgb = jnp.stack([a[0] for a in acc], axis=-1)
        img = jnp.zeros((n_pix, 3), jnp.float32).at[pix[0]].add(
            lane_rgb) / np.float32(samples)
        diff = img.reshape(H, W, 3) - target_
        return jnp.mean(diff * diff)

    params = {"mat_diffuse": scene.mat_diffuse,
              "mat_emissive": scene.mat_emissive}
    loss, grads = jax.value_and_grad(loss_fn)(params)
    return loss, grads
