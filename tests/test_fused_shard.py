"""Multi-chip megakernel rendering/training on the 8-virtual-device mesh.

The in-kernel PCG4D stream hashes GLOBAL pixel ids, so the sharded image
must be bit-identical to the single-chip one; the sharded train step's
gradients match the single-chip PRB step to float tolerance (psum of
per-chip partials reassociates the sum)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_fused import make_fused_path_renderer
from orion_tpu.ops.pallas_prb import make_fused_train_step
from orion_tpu.parallel.fused_shard import (make_fused_render_sharded,
                                            make_fused_train_step_sharded)

SAMPLES, DEPTH, LS = 2, 3, 2


@pytest.fixture(scope="module")
def setup(cornell_scene):
    scene, rtc = cornell_scene
    rtc.xres, rtc.yres = 40, 24
    cam = camera_from_rtc(rtc)
    return scene, cam, jax.random.key(11)


def test_needs_virtual_mesh():
    assert jax.device_count() >= 8, "conftest provides 8 virtual devices"


def test_sharded_render_bit_identical(setup):
    scene, cam, key = setup
    single = make_fused_path_renderer(scene, cam, samples=SAMPLES,
                                      max_depth=DEPTH, light_samples=LS,
                                      ray_block=128)
    sharded = make_fused_render_sharded(scene, cam, samples=SAMPLES,
                                        max_depth=DEPTH, light_samples=LS,
                                        ray_block=128)
    a = np.asarray(single(key))
    b = np.asarray(sharded(key))
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
    assert a.max() > 0


def test_sharded_train_step_matches_single(setup):
    scene, cam, key = setup
    target = jnp.zeros((cam.yres, cam.xres, 3), jnp.float32)
    params = {"mat_diffuse": scene.mat_diffuse,
              "mat_emissive": scene.mat_emissive}
    single = make_fused_train_step(scene, cam, target, samples=SAMPLES,
                                   max_depth=DEPTH, light_samples=LS,
                                   ray_block=128, dynamic_params=True)
    sharded = make_fused_train_step_sharded(scene, cam, target,
                                            samples=SAMPLES,
                                            max_depth=DEPTH,
                                            light_samples=LS,
                                            ray_block=128)
    l_s, g_s = single(params, key)
    l_m, g_m = sharded(params, key)
    assert float(l_s) == pytest.approx(float(l_m), rel=1e-6)
    for name in params:
        np.testing.assert_allclose(np.asarray(g_m[name]),
                                   np.asarray(g_s[name]),
                                   rtol=1e-5, atol=1e-9)
    assert float(np.abs(np.asarray(g_s["mat_diffuse"])).max()) > 0


def test_sharded_bvh_path_bit_identical(cornell_scene):
    """Large-scene ray DP: the BVH path megakernel sharded over the mesh
    must reproduce the single-chip megakernel image exactly."""
    from orion_tpu.ops.pallas_bvh_path import make_bvh_path_renderer
    from orion_tpu.parallel.fused_shard import make_bvh_render_sharded
    from orion_tpu.scene import subdivide_scene

    scene, rtc = cornell_scene
    scene = subdivide_scene(scene, levels=1)   # 144 tris, a real tree
    rtc.xres, rtc.yres = 40, 24
    cam = camera_from_rtc(rtc)
    key = jax.random.key(4)
    single = make_bvh_path_renderer(scene, cam, samples=2, max_depth=2,
                                    light_samples=2, ray_block=128)
    sharded = make_bvh_render_sharded(scene, cam, samples=2, max_depth=2,
                                      light_samples=2, mode="path",
                                      ray_block=128)
    a = np.asarray(single(key))
    b = np.asarray(sharded(key))
    np.testing.assert_array_equal(a, b)
    assert a.max() > 0


def test_sharded_bvh_whitted_bit_identical():
    from orion_tpu.camera import Camera
    from orion_tpu.ops.pallas_bvh_whitted import make_bvh_whitted_renderer
    from orion_tpu.parallel.fused_shard import make_bvh_render_sharded
    from orion_tpu.scene import make_synthetic_scene

    scene = make_synthetic_scene(600, seed=3)
    cam = Camera(origin=jnp.asarray([0.0, 0.0, 35.0]),
                 front=jnp.asarray([0.0, 0.0, -1.0]),
                 right=jnp.asarray([1.0, 0.0, 0.0]),
                 up=jnp.asarray([0.0, 1.0, 0.0]), xres=40, yres=24)
    key = jax.random.key(4)
    single = make_bvh_whitted_renderer(scene, cam, samples=2, max_depth=1,
                                       ray_block=128)
    sharded = make_bvh_render_sharded(scene, cam, samples=2, max_depth=1,
                                      mode="whitted", ray_block=128)
    a = np.asarray(single(key))
    b = np.asarray(sharded(key))
    np.testing.assert_array_equal(a, b)
    assert a.max() > 0
