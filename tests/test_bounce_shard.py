"""Sharded bounce pipeline + bounce-PRB trainer (VERDICT r4 next #3):
the production big-scene backend over a device mesh.

Ray DP on an 8-virtual-device CPU mesh: each chip runs its own
wavefront (sorts, compaction, kernels) on its pixel tile; scene/tree
replicated. Per-ray streams hash GLOBAL pixel ids, so every ray
computes the single-chip value exactly — the sharded image must match
single-chip to addition-order noise, and the PRB (loss, grads) must
match to 1e-5 with exactly one psum.

vs the reference: SURVEY §2.4's OpenMP pixel fan-out
(/root/reference/orion/raytracer.cpp:69-88) mapped to chips for the
backend that owns the flagship config.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.parallel.fused_shard import (make_bounce_render_sharded,
                                            make_bounce_train_step_sharded)
from orion_tpu.scene import load_scene, subdivide_scene


@pytest.fixture(scope="module")
def subdiv_scene(assets_dir):
    scene, r = load_scene(assets_dir / "cornell-box.rtc")
    return subdivide_scene(scene, levels=2), r


def _cam(r, res):
    r.xres = r.yres = res
    return camera_from_rtc(r)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_bounce_render_matches_single_chip(subdiv_scene, n_dev):
    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    scene, r = subdiv_scene
    cam = _cam(r, 32)
    key = jax.random.key(7)
    single = np.asarray(make_bounce_path_renderer(
        scene, cam, samples=4, max_depth=3)(key))
    sharded = np.asarray(make_bounce_render_sharded(
        scene, cam, samples=4, max_depth=3,
        devices=jax.devices()[:n_dev])(key))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_bounce_render_octant_trees(subdiv_scene):
    """The octant-tree variant shards identically (per-block direction
    votes are chip-local)."""
    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    scene, r = subdiv_scene
    cam = _cam(r, 32)
    key = jax.random.key(3)
    single = np.asarray(make_bounce_path_renderer(
        scene, cam, samples=4, max_depth=3, octant_trees=True)(key))
    sharded = np.asarray(make_bounce_render_sharded(
        scene, cam, samples=4, max_depth=3, octant_trees=True,
        devices=jax.devices()[:4])(key))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_bounce_render_uneven_tiles(subdiv_scene):
    """36x36 = 1296 pixels over 8 chips (162 per tile, no remainder) and
    over 5 chips (260 per tile, last tile 4 pixels short + padding rows
    past the image) must both reproduce the single-chip image."""
    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    scene, r = subdiv_scene
    cam = _cam(r, 36)
    key = jax.random.key(11)
    single = np.asarray(make_bounce_path_renderer(
        scene, cam, samples=2, max_depth=2)(key))
    for n_dev in (5, 8):
        sharded = np.asarray(make_bounce_render_sharded(
            scene, cam, samples=2, max_depth=2,
            devices=jax.devices()[:n_dev])(key))
        np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_textured_bounce_matches_single_chip(subdiv_scene):
    """Textured path + ray DP compose: the per-bounce texel resolve is
    chip-local (winner rows, uv interp, atlas gathers all per tile)."""
    import dataclasses

    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    scene, r = subdiv_scene
    T = int(np.asarray(scene.tri_v0).shape[0])
    tex = np.zeros((4, 4, 3), np.float32)
    tex[::2, ::2] = (0.9, 0.4, 0.2)
    tex[1::2, 1::2] = (0.2, 0.4, 0.9)
    rng = np.random.default_rng(1)
    uv = rng.random((T, 2), np.float32) * 2 - 0.5
    M = int(np.asarray(scene.mat_diffuse).shape[0])
    scene = dataclasses.replace(
        scene,
        tex_atlas=jnp.asarray(tex),
        tex_off=jnp.zeros((1, 2), jnp.int32),
        tex_hw=jnp.asarray([[4, 4]], jnp.int32),
        mat_map_diffuse=jnp.zeros(M, jnp.int32),
        uv0=jnp.asarray(uv), uv1=jnp.asarray(uv + 0.2),
        uv2=jnp.asarray(uv + 0.4))
    cam = _cam(r, 32)
    key = jax.random.key(9)
    single = np.asarray(make_bounce_path_renderer(
        scene, cam, samples=2, max_depth=3)(key))
    sharded = np.asarray(make_bounce_render_sharded(
        scene, cam, samples=2, max_depth=3,
        devices=jax.devices()[:4])(key))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-7)


def test_sharded_bounce_prb_matches_single_chip(subdiv_scene):
    from orion_tpu.ops.pallas_bounce_prb import make_bounce_train_step

    scene, r = subdiv_scene
    cam = _cam(r, 32)
    key = jax.random.key(5)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((32, 32, 3), np.float32))

    loss1, g1 = make_bounce_train_step(
        scene, cam, target, samples=2, max_depth=3)(key)
    loss8, g8 = make_bounce_train_step_sharded(
        scene, cam, target, samples=2, max_depth=3,
        devices=jax.devices()[:8])(key)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-6)
    for k in ("mat_diffuse", "mat_emissive"):
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-7)


def test_sharded_bounce_prb_psum_is_the_only_collective(subdiv_scene):
    """Measured from the compiled HLO (parallel/distributed.py
    methodology): the train step's collective traffic is the one
    (sse, acc, ek) psum — O(KB), independent of resolution."""
    from orion_tpu.parallel.distributed import measure_collective_bytes

    scene, r = subdiv_scene
    cam = _cam(r, 32)
    target = jnp.zeros((32, 32, 3), jnp.float32)
    step = make_bounce_train_step_sharded(
        scene, cam, target, samples=2, max_depth=2,
        devices=jax.devices()[:8])
    jitted = jax.jit(lambda k: step(k))
    rep = measure_collective_bytes(jitted, jax.random.key(0))
    # (1 + M_LANES*8 + 3) f32 ~= 4 KB; allow slack for layout padding
    assert 0 < rep["bytes_per_call"] <= 64 * 1024, rep
