"""Multi-chip megakernel rendering and PRB training: ray data-parallelism
over a jax.sharding.Mesh via shard_map.

The TPU-native scaling story of SURVEY.md §2.4 applied to the fused
kernels: pixels tile across chips (each chip's megakernel walks its own
lane range), the scene table replicates in HBM, and — because the
in-kernel PCG4D stream is a pure function of the GLOBAL pixel index —
the distributed image is BIT-IDENTICAL to the single-chip render: zero
forward collectives, no estimator change. Training adds exactly ONE
collective: a psum of the [8, 128] per-chip gradient accumulators (a
512-byte all-reduce per step, riding ICI), after which every chip holds
the full dLoss/d(materials) — the scene-parameter gradient all-reduce
the reference has no analogue for (it has no gradients and no chips;
its closest mechanism is the OpenMP pixel fan-out, raytracer.cpp:70).

Weak-scaling expectation: forward efficiency == per-chip throughput at
1/n_chips of the pixels (bench.py's scaling_weak_1chip measures the
resident-batch term at 0.91 for 8x on one real chip); the train step
adds one tiny all-reduce, so efficiency is the same to first order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from orion_tpu.ops.pallas_fused import (RAY_BLOCK, _emitter_consts,
                                        _emitters_consts,
                                        fused_chunk_bounds,
                                        build_fused_call, camera_vec,
                                        fused_path_supported,
                                        pack_fused_tri_table,
                                        pack_fused_tri_table_jnp,
                                        seed_scalar)
from orion_tpu.ops.pallas_prb import (M_LANES, _ls_rows,
                                      build_fwd_ls_call, build_replay_call,
                                      fused_train_supported)
from orion_tpu.scene import Scene

AXIS = "rays"


def _mesh(devices=None) -> Mesh:
    devs = jax.devices() if devices is None else list(devices)
    return Mesh(np.array(devs), (AXIS,))


def _tile(n_pix: int, n_chips: int, ray_block: int) -> int:
    """Per-chip lane count: n_pix split over chips, padded to ray_block."""
    per = -(-n_pix // n_chips)
    return -(-max(per, ray_block) // ray_block) * ray_block


def make_fused_render_sharded(scene: Scene, camera, *, samples: int,
                              max_depth: int, light_samples: int = 2,
                              ray_block: int = RAY_BLOCK,
                              devices=None,
                              interpret: bool | None = None):
    """`fn(key) -> [H, W, 3]` rendering with one megakernel per chip.

    Bit-identical to make_fused_path_renderer's single-chip image for
    any chip count (the PCG4D draws hash global pixel ids)."""
    if not fused_path_supported(scene):
        raise ValueError("scene outside the fused-path gate")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _mesh(devices)
    n_chips = mesh.devices.size
    H, W = camera.yres, camera.xres
    n_pix = H * W
    local = _tile(n_pix, n_chips, ray_block)

    tab_np = pack_fused_tri_table(scene)
    lo, hi = fused_chunk_bounds(scene)
    clo, chi = jnp.asarray(lo.ravel()), jnp.asarray(hi.ravel())
    tri_tab = jnp.asarray(tab_np)
    emitter = _emitters_consts(scene)
    call = build_fused_call(tri_tab.shape[0], W, H, samples, max_depth,
                            light_samples, emitter, n_pix, local,
                            ray_block, interpret)
    cam_v = camera_vec(camera)

    def shard_fn(seed):
        base = (jax.lax.axis_index(AXIS) * local).astype(jnp.int32)
        return call(cam_v, seed, base[None], clo, chi,
                    tri_tab)                             # [8, local]

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                        out_specs=P(None, AXIS), check_vma=False)

    @jax.jit
    def _impl(seed):
        out = sharded(seed)                              # [8, n_chips*local]
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    def render_sharded(key) -> jax.Array:
        return _impl(seed_scalar(key))

    return render_sharded


def make_bvh_render_sharded(scene: Scene, camera, *, samples: int,
                            max_depth: int, light_samples: int = 2,
                            mode: str | None = None,
                            strategy=None, ray_block: int | None = None,
                            order_signs=(1.0, 1.0, 1.0),
                            devices=None,
                            interpret: bool | None = None):
    """`fn(key) -> [H, W, 3]` rendering with one BVH megakernel per chip
    (large-scene ray DP: pixels tile across chips, the flattened tree +
    attribute table replicate). Same bit-identity argument as the brute
    sharded renderer — the kernels hash GLOBAL pixel ids, so the image is
    the single-chip megakernel's exactly, for any chip count.

    mode: "path" (ops/pallas_bvh_path.py) or "whitted"
    (ops/pallas_bvh_whitted.py); default picks Whitted iff the scene has
    point lights, matching the engine/render convention."""
    from orion_tpu.accel.bvh import SAH
    from orion_tpu.ops import pallas_bvh_path as pbp
    from orion_tpu.ops import pallas_bvh_whitted as pbw

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mode is None:
        mode = "whitted" if scene.num_lights > 0 else "path"
    if strategy is None:
        strategy = SAH
    mesh = _mesh(devices)
    n_chips = mesh.devices.size
    H, W = camera.yres, camera.xres
    n_pix = H * W

    if mode == "path":
        if not pbp.bvh_path_supported(scene):
            raise ValueError("scene outside the bvh-path gate")
        rb = pbp.RAY_BLOCK if ray_block is None else ray_block
        local = _tile(n_pix, n_chips, rb)
        node_scalars, tab, num_nodes = pbp.bvh_path_device_data(
            scene, strategy=strategy, order_signs=order_signs,
            check_cap=not interpret)
        call = pbp.build_bvh_path_call(
            num_nodes, W, H, samples, max_depth, light_samples,
            _emitters_consts(scene), n_pix, local, rb, interpret)
    elif mode == "whitted":
        from orion_tpu.ops.pallas_whitted import _lights_consts

        if not pbw.bvh_whitted_supported(scene):
            raise ValueError("scene outside the bvh-whitted gate")
        rb = pbw.RAY_BLOCK if ray_block is None else ray_block
        local = _tile(n_pix, n_chips, rb)
        node_scalars, tab, num_nodes = pbw.bvh_whitted_device_data(
            scene, strategy=strategy, order_signs=order_signs,
            check_cap=not interpret)
        call = pbw.build_bvh_whitted_call(
            num_nodes, W, H, samples, max_depth, _lights_consts(scene),
            n_pix, scene.num_emissive > 0, local, rb, interpret)
    else:
        raise ValueError(f"unknown mode {mode!r}")

    cam_v = camera_vec(camera)

    def shard_fn(seed):
        base = (jax.lax.axis_index(AXIS) * local).astype(jnp.int32)
        return call(cam_v, seed, base[None], *node_scalars,
                    tab)                                 # [8, local]

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                        out_specs=P(None, AXIS), check_vma=False)

    @jax.jit
    def _impl(seed):
        out = sharded(seed)                             # [8, n_chips*local]
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    def render_sharded(key) -> jax.Array:
        return _impl(seed_scalar(key))

    return render_sharded


def make_bounce_render_sharded(scene: Scene, camera, *, samples: int,
                               max_depth: int, light_samples: int = 2,
                               ray_block: int | None = None,
                               sort: bool = True,
                               octant_trees: bool = True,
                               devices=None,
                               interpret: bool | None = None):
    """`fn(key) -> [H, W, 3]`: the sorted-wavefront bounce pipeline
    (ops/pallas_bounce.py — the production big-scene path backend) with
    one pipeline per chip. Each chip owns a contiguous pixel tile and
    runs its OWN wavefront end to end — per-chip sorts, per-chip
    compaction ladder, per-chip kernels — with the scene table and
    per-octant trees replicated in HBM; there are ZERO forward
    collectives. Per-ray streams hash global pixel ids, so every ray
    computes the single-chip value exactly; only the per-pixel sample
    ADDITION ORDER matches too (each pixel's 16 sample lanes live on
    one chip in the same relative order), making the sharded image
    bit-identical up to XLA scatter scheduling (tests/test_bounce_shard
    asserts allclose at 1e-6)."""
    from orion_tpu.ops import pallas_bounce as pb

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _mesh(devices)
    n_chips = mesh.devices.size
    H, W = camera.yres, camera.xres
    n_pix = H * W
    per = -(-n_pix // n_chips)
    rb = pb.RAY_BLOCK if ray_block is None else ray_block

    pipeline, ctx = pb.build_forward_pipeline(
        scene, camera, samples=samples, max_depth=max_depth,
        light_samples=light_samples, ray_block=rb, sort=sort,
        octant_trees=octant_trees, interpret=interpret, pix_count=per)
    tab0 = ctx["tab"]

    def shard_fn(seed):
        base = (jax.lax.axis_index(AXIS) * per).astype(jnp.int32)
        st, _ = pipeline(seed, tab0, pix_base=base)
        img = jnp.zeros((per, 3), jnp.float32)
        # padding lanes ride pixel id 0: for chips past the first that
        # is out of tile (dropped); for chip 0 it adds zero radiance
        img = img.at[st[14].astype(jnp.int32) - base].add(
            st[10:13].T, mode="drop")
        return img

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=P(),
                        out_specs=P(AXIS, None), check_vma=False)

    @jax.jit
    def _impl(seed):
        img = sharded(seed)                        # [n_chips*per, 3]
        return img[:n_pix].reshape(H, W, 3) / np.float32(samples)

    def render_sharded(key) -> jax.Array:
        return _impl(seed_scalar(key))

    return render_sharded


def make_bounce_train_step_sharded(scene: Scene, camera, target, *,
                                   samples: int, max_depth: int,
                                   light_samples: int = 2,
                                   ray_block: int | None = None,
                                   sort: bool = True,
                                   devices=None,
                                   interpret: bool | None = None):
    """`step(key) -> (loss, grads)`: the closed-form bounce-PRB trainer
    (ops/pallas_bounce_prb.py) ray-data-parallel across the mesh. Each
    chip runs the full forward pipeline + dump replay on its own pixel
    tile (target tiles along pixels with it); the ONLY collective is
    one psum of the (sse, material-grad accumulator, emitter-ke triple)
    pytree — ~4 KB/step riding ICI — after which every chip holds the
    global loss and dLoss/d(materials), summed exactly (the MSE
    normalization is baked globally into each tile's cotangent)."""
    from orion_tpu.ops import pallas_bounce_prb as pbr

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _mesh(devices)
    n_chips = mesh.devices.size
    H, W = camera.yres, camera.xres
    n_pix = H * W
    per = -(-n_pix // n_chips)
    rb = pbr.RAY_BLOCK if ray_block is None else ray_block
    M = int(scene.num_meshes)

    core, ctx = pbr.make_bounce_train_core(
        scene, camera, samples=samples, max_depth=max_depth,
        light_samples=light_samples, ray_block=rb, sort=sort,
        interpret=interpret, pix_count=per)
    em_mesh = ctx["em_mesh"]
    tab0 = ctx["tab"]
    pad = n_chips * per - n_pix
    target_flat = jnp.pad(
        jnp.asarray(target, jnp.float32).reshape(n_pix, 3),
        ((0, pad), (0, 0)))

    def shard_fn(seed, tgt):
        base = (jax.lax.axis_index(AXIS) * per).astype(jnp.int32)
        sse, acc, ek = core(seed, tab0, base, tgt)
        return jax.lax.psum((sse, acc, ek), AXIS)

    sharded = shard_map(shard_fn, mesh=mesh,
                        in_specs=(P(), P(AXIS, None)),
                        out_specs=P(), check_vma=False)

    @jax.jit
    def _impl(seed):
        sse, acc, ek = sharded(seed, target_flat)
        loss = sse / np.float32(H * W * 3)
        g_kd = acc[:M, 0:3]
        g_ke = acc[:M, 3:6].at[em_mesh].add(ek)
        return loss, {"mat_diffuse": g_kd, "mat_emissive": g_ke}

    def step(key):
        return _impl(seed_scalar(key))

    return step


def make_fused_train_step_sharded(scene: Scene, camera, target, *,
                                  samples: int, max_depth: int,
                                  light_samples: int = 2,
                                  ray_block: int = RAY_BLOCK,
                                  devices=None,
                                  interpret: bool | None = None):
    """`step(params, key) -> (loss, grads)` with forward AND backward ray
    data-parallel across the mesh; grads all-reduce with one psum of the
    [8, 128] accumulator. params: {mat_diffuse, mat_emissive} (any
    subset)."""
    if not fused_train_supported(scene, samples):
        raise ValueError("scene outside the fused-train gate")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mesh = _mesh(devices)
    n_chips = mesh.devices.size
    H, W = camera.yres, camera.xres
    n_pix = H * W
    local = _tile(n_pix, n_chips, ray_block)
    n_pad = n_chips * local
    M = int(scene.num_meshes)

    tri_tab0 = jnp.asarray(pack_fused_tri_table(scene))
    T_pad = tri_tab0.shape[0]
    emitter = _emitter_consts(scene)
    args = (T_pad, W, H, samples, max_depth, light_samples, emitter,
            n_pix, local, ray_block, interpret)
    fwd_call = build_fwd_ls_call(*args)
    replay_call = build_replay_call(*args)
    cam_v = camera_vec(camera)
    target = jnp.asarray(target, jnp.float32)

    def shard_fwd(seed, tab):
        base = (jax.lax.axis_index(AXIS) * local).astype(jnp.int32)
        return fwd_call(cam_v, seed, base[None], tab)

    def shard_replay(seed, tab, w_planes, ls_planes):
        base = (jax.lax.axis_index(AXIS) * local).astype(jnp.int32)
        acc = replay_call(cam_v, seed, base[None], tab, w_planes,
                          ls_planes)
        return jax.lax.psum(acc, AXIS)                   # [8, M_LANES]

    fwd_sh = shard_map(shard_fwd, mesh=mesh, in_specs=(P(), P()),
                       out_specs=(P(None, AXIS), P(None, AXIS)),
                       check_vma=False)
    replay_sh = shard_map(shard_replay, mesh=mesh,
                          in_specs=(P(), P(), P(None, AXIS),
                                    P(None, AXIS)),
                          out_specs=P(), check_vma=False)

    @jax.jit
    def step(params, key):
        s = dataclasses.replace(scene, **params)
        tab = pack_fused_tri_table_jnp(s)
        seed = seed_scalar(key)
        out, ls = fwd_sh(seed, tab)
        img = out[0:3, :n_pix].T.reshape(H, W, 3)
        diff = img - target
        loss = jnp.mean(diff * diff)
        w = (diff * (2.0 / (H * W * 3))).reshape(n_pix, 3).T / samples
        w_planes = jnp.zeros((8, n_pad), jnp.float32).at[0:3, :n_pix].set(w)
        acc = replay_sh(seed, tab, w_planes, ls)
        g = {"mat_diffuse": acc[0:3, :M].T, "mat_emissive": acc[3:6, :M].T}
        return loss, {k: g[k] for k in params}

    return step
