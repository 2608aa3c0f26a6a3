"""Path-replay backpropagation over a VMEM-resident BVH: differentiable
path tracing past the brute-sweep gate.

ops/pallas_prb.py computes material gradients (mat_diffuse,
mat_emissive) in closed form by replaying each path inside one Pallas
kernel — but its intersection is the brute table sweep, so training is
gated to FUSED_MAX_TRIS. This module pairs the SAME forward/replay
estimator (pallas_fused._make_regen_body with samp_slots;
pallas_prb.replay_impl) with the BVH-walk sweep of
ops/pallas_bvh_path.py, lifting differentiable rendering to any scene
within the tree's residency cap (~56k bundled rows). The reference has
no analogue at any scale — it computes no gradients at all.

Exactness chain: the BVH sweep returns bit-identical values to the brute
sweep for every non-tied nearest hit (tests/test_bvh_path.py), the
forward and replay use the same sweep (so the remaining-radiance
bookkeeping cancels to exact zeros), and the adjoints are the closed
forms of pallas_prb — so gradients match reverse-mode AD of
pallas_fused.fused_reference_render to float tolerance, which is what
tests/test_bvh_prb.py asserts.

Training with moving MATERIALS only: the tree is built once from the
static geometry; each step substitutes the material rows of the
[32, B_pad] attribute table in-graph (make_bvh_tab_updater), so optax
loops never rebuild the BVH. Geometry parameters still require the brute
path (optim.fit's guard).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.accel.bvh import SAH, build_bvh
from orion_tpu.ops.pallas_bvh_path import (LEAF_WIDTH, RESIDENT_MAX_BUNDLED,
                                           _make_path_sweep,
                                           bvh_path_supported,
                                           pack_bvh_path_table)
from orion_tpu.ops.pallas_bvh_whitted import RAY_BLOCK
from orion_tpu.ops.pallas_fused import (_C_KD, _C_KE,
                                        _emitter_consts, _make_regen_body,
                                        camera_vec, seed_scalar)
from orion_tpu.ops.pallas_prb import (M_LANES, MAX_SAMPLES, _ls_rows,
                                      replay_impl)
from orion_tpu.scene import Scene


def bvh_train_supported(scene: Scene, samples: int = 1) -> bool:
    """Gate: bvh-path scene, <= M_LANES materials, bounded spp, ONE
    emissive mesh (pallas_prb's NEE-adjoint constraint)."""
    return (bvh_path_supported(scene) and scene.num_meshes <= M_LANES
            and samples <= MAX_SAMPLES and scene.num_emissive == 1)


def tab_updater_from_bvh(bvh, scene: Scene):
    """update(scene') -> tab for an ALREADY-BUILT tree: rebuilds ONLY the
    material-dependent rows (kd, ke) of the bundled attribute table
    in-graph — differentiable w.r.t. scene'.mat_diffuse /
    scene'.mat_emissive, geometry rows baked. Shared by the resident-walk
    trainer below and the wavefront PRB trainer (ops/prb_wavefront.py),
    which reuses the binned backend's tree."""
    base = jnp.asarray(pack_bvh_path_table(bvh, scene))
    B_pad = base.shape[1]
    T = int(scene.num_triangles)
    raw = np.asarray(bvh.tri_orig)
    real = np.zeros(B_pad, np.float32)
    real[:raw.shape[0]] = (raw >= 0).astype(np.float32)
    mat = np.zeros(B_pad, np.int64)
    mat[:raw.shape[0]] = np.asarray(scene.tri_mat)[
        np.clip(raw, 0, T - 1)]
    mat_idx = jnp.asarray(mat)
    realf = jnp.asarray(real)

    def update(s: Scene) -> jax.Array:
        kd = s.mat_diffuse[mat_idx] * realf[:, None]      # [B_pad, 3]
        ke = s.mat_emissive[mat_idx] * realf[:, None]
        tab = base
        tab = tab.at[_C_KD:_C_KD + 3, :].set(kd.T)
        tab = tab.at[_C_KE:_C_KE + 3, :].set(ke.T)
        return tab

    return update


def make_bvh_tab_updater(scene: Scene, *, strategy: str = SAH,
                         order_signs=(1.0, 1.0, 1.0),
                         check_cap: bool = True):
    """(node_scalars, num_nodes, update): builds the tree, then
    tab_updater_from_bvh for the in-graph material-row updates."""
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=strategy,
                       leaf_size=LEAF_WIDTH, leaf_width=LEAF_WIDTH,
                       order_signs=order_signs)
    if check_cap and bvh.num_bundled > RESIDENT_MAX_BUNDLED:
        raise ValueError(
            f"{bvh.num_bundled} bundled rows exceed the path attr-table "
            f"residency cap ({RESIDENT_MAX_BUNDLED})")
    update = tab_updater_from_bvh(bvh, scene)

    node_scalars = tuple(
        [jnp.asarray(bvh.node_lo[:, i]) for i in range(3)]
        + [jnp.asarray(bvh.node_hi[:, i]) for i in range(3)]
        + [jnp.asarray(bvh.node_skip), jnp.asarray(bvh.node_start)])
    return node_scalars, bvh.num_nodes, update


def _make_bvh_fwd_ls_kernel(M, W, H, samples, max_depth, light_samples,
                            emitter, n_pix):
    """Forward BVH megakernel that ALSO emits per-sample radiance."""

    def kernel(cam_ref, seed_ref, base_ref, n_lox, n_loy, n_loz,
               n_hix, n_hiy, n_hiz, n_skip, n_start, tab_ref, out_ref,
               ls_ref):
        rb = out_ref.shape[1]
        seed = seed_ref[0]
        node = {"lox": n_lox, "loy": n_loy, "loz": n_loz,
                "hix": n_hix, "hiy": n_hiy, "hiz": n_hiz,
                "skip": n_skip, "start": n_start}

        def cam(i):
            return cam_ref[i]

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        sweep = _make_path_sweep(node, tab_ref, M)
        body, cond, init = _make_regen_body(
            None, cam, seed, pix, n_pix, 0, W, H, samples, max_depth,
            light_samples, emitter, samp_slots=samples, sweep=sweep)
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


def _make_bvh_replay_kernel(M, W, H, samples, max_depth, light_samples,
                            emitter, n_pix):
    def kernel(cam_ref, seed_ref, base_ref, n_lox, n_loy, n_loz,
               n_hix, n_hiy, n_hiz, n_skip, n_start, tab_ref, w_ref,
               ls_ref, out_ref):
        rb = w_ref.shape[1]
        seed = seed_ref[0]
        node = {"lox": n_lox, "loy": n_loy, "loz": n_loz,
                "hix": n_hix, "hiy": n_hiy, "hiz": n_hiz,
                "skip": n_skip, "start": n_start}

        def cam(i):
            return cam_ref[i]

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        sweep = _make_path_sweep(node, tab_ref, M)
        replay_impl(sweep, cam, seed, pix, in_image, w_ref, ls_ref,
                    out_ref, emitter, samples, max_depth, light_samples,
                    W, H)

    return kernel


def build_bvh_fwd_ls_call(M, W, H, samples, max_depth, light_samples,
                          emitter, n_pix, n_pad, ray_block, interpret):
    """Raw call: (cam [12], seed [1], pix_base [1], *node_scalars, tab)
    -> (radiance [8, n_pad], per-sample L [pad8(3S), n_pad])."""
    kernel = _make_bvh_fwd_ls_kernel(M, W, H, samples, max_depth,
                                     light_samples, emitter, n_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
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


def build_bvh_replay_call(M, W, H, samples, max_depth, light_samples,
                          emitter, n_pix, n_pad, ray_block, interpret):
    """Raw call: (cam, seed, pix_base, *node_scalars, tab,
    w_planes [8, n_pad], ls_planes) -> [8, M_LANES] grad accumulator."""
    kernel = _make_bvh_replay_kernel(M, W, H, samples, max_depth,
                                     light_samples, emitter, n_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
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


def make_bvh_train_step(scene: Scene, camera, target, *, samples: int,
                        max_depth: int, light_samples: int = 2,
                        strategy: str = SAH, ray_block: int = RAY_BLOCK,
                        order_signs=(1.0, 1.0, 1.0),
                        interpret: bool | None = None,
                        dynamic_params: bool = False):
    """MSE train step against `target` for scenes past the brute gate:
    one forward BVH megakernel launch (recording per-sample radiance) +
    one regenerative replay launch.

    dynamic_params=False: `step(key) -> (loss, grads)` over the baked
    scene. dynamic_params=True: `step(params, key) -> (loss, grads)`,
    params over {mat_diffuse, mat_emissive} — the attribute table's
    material rows are rebuilt in-graph each call (tree untouched), so an
    optax loop fits materials on 10k+ triangle scenes at megakernel
    speed."""
    if not bvh_train_supported(scene, samples):
        raise ValueError("scene outside the bvh-train gate "
                         "(textures / emitters / materials / spp)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W, n_pix, n_pad = _sizes(camera, ray_block)
    M = int(scene.num_meshes)

    node_scalars, num_nodes, update = make_bvh_tab_updater(
        scene, strategy=strategy, order_signs=order_signs,
        check_cap=not interpret)
    tab0 = update(scene)
    emitter = _emitter_consts(scene)
    args = (num_nodes, W, H, samples, max_depth, light_samples, emitter,
            n_pix, n_pad, ray_block, interpret)
    fwd_call = build_bvh_fwd_ls_call(*args)
    replay_call = build_bvh_replay_call(*args)
    cam_v = camera_vec(camera)
    zero_base = jnp.zeros((1,), jnp.int32)
    target = jnp.asarray(target, jnp.float32)

    def _loss_and_grads(tab, key, wanted):
        seed = seed_scalar(key)
        planes, ls = fwd_call(cam_v, seed, zero_base, *node_scalars, tab)
        img = planes[0:3, :n_pix].T.reshape(H, W, 3)
        diff = img - target
        loss = jnp.mean(diff * diff)
        w = (diff * (2.0 / (H * W * 3 * samples))).reshape(n_pix, 3).T
        w_planes = jnp.zeros((8, n_pad), jnp.float32)
        w_planes = w_planes.at[0:3, :n_pix].set(w)
        out = replay_call(cam_v, seed, zero_base, *node_scalars, tab,
                          w_planes, ls)
        g = {"mat_diffuse": out[0:3, :M].T, "mat_emissive": out[3:6, :M].T}
        return loss, {k: g[k] for k in wanted}

    if not dynamic_params:
        @jax.jit
        def step(key):
            return _loss_and_grads(tab0, key,
                                   ("mat_diffuse", "mat_emissive"))

        return step

    def step_params(params, key):
        bad = set(params) - {"mat_diffuse", "mat_emissive"}
        if bad:
            raise ValueError(f"PRB differentiates material tables only; "
                             f"got {sorted(bad)}")
        s = dataclasses.replace(scene, **params)
        return _loss_and_grads(update(s), key, tuple(params))

    return step_params
