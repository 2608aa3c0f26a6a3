"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.parallel.sharding import (make_mesh, make_train_step,
                                         render_sharded, scene_params,
                                         apply_params)
from orion_tpu.render import render


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(devs[:8])


def test_sharded_matches_single_device(cornell_scene, mesh8):
    """Same key => same image (float tolerance) on 1 device and on 8 (determinism
    across shardings — the structural race-freedom test, SURVEY.md §5)."""
    scene, rtc = cornell_scene
    rtc.xres, rtc.yres = 24, 16
    cam = camera_from_rtc(rtc)
    key = jax.random.key(42)
    img1 = np.asarray(render(scene, cam, key, samples=2, max_depth=3,
                             light_samples=1))
    img8 = np.asarray(render_sharded(scene, cam, key, mesh=mesh8, samples=2,
                                     max_depth=3, light_samples=1))
    np.testing.assert_allclose(img1, img8, rtol=1e-5, atol=1e-7)


def test_sharded_whitted(view_test_scene, mesh8):
    scene, rtc = view_test_scene
    rtc.xres, rtc.yres = 30, 20  # N=600 not divisible by 8: exercises padding
    cam = camera_from_rtc(rtc)
    key = jax.random.key(0)
    img1 = np.asarray(render(scene, cam, key, samples=1, max_depth=1))
    img8 = np.asarray(render_sharded(scene, cam, key, mesh=mesh8, samples=1,
                                     max_depth=1))
    np.testing.assert_allclose(img1, img8, rtol=1e-5, atol=1e-7)


def test_train_step_runs_and_descends(cornell_scene, mesh8):
    """One SGD step on the sharded path tracer reduces pixel MSE."""
    scene, rtc = cornell_scene
    rtc.xres, rtc.yres = 16, 8
    cam = camera_from_rtc(rtc)
    key = jax.random.key(1)

    target = render_sharded(scene, cam, key, mesh=mesh8, samples=1,
                            max_depth=2, light_samples=1)

    # perturb the diffuse colors, then descend toward the target
    wrong = dataclasses.replace(scene, mat_diffuse=scene.mat_diffuse * 0.5)
    step = make_train_step(wrong, cam, samples=1, max_depth=2,
                           light_samples=1, lr=0.5, mesh=mesh8)
    params = scene_params(wrong)
    losses = []
    for i in range(3):
        params, loss = step(params, key, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_train_grads_match_unsharded(cornell_scene, mesh8):
    """Gradients of the sharded loss == gradients of the unsharded loss
    (the automatic psum is exact, not an approximation)."""
    scene, rtc = cornell_scene
    rtc.xres, rtc.yres = 16, 8
    cam = camera_from_rtc(rtc)
    key = jax.random.key(2)
    target = jnp.zeros((8, 16, 3), jnp.float32)

    def loss_unsharded(kd):
        s = dataclasses.replace(scene, mat_diffuse=kd)
        img = render(s, cam, key, samples=1, max_depth=2, light_samples=1)
        return jnp.mean((img - target) ** 2)

    from orion_tpu.parallel.sharding import _render_sharded_impl

    def loss_sharded(kd):
        s = dataclasses.replace(scene, mat_diffuse=kd)
        img = _render_sharded_impl(s, cam, key, samples=1, max_depth=2,
                                   light_samples=1, mode=None, mesh=mesh8)
        return jnp.mean((img - target) ** 2)

    g1 = np.asarray(jax.grad(loss_unsharded)(scene.mat_diffuse))
    g8 = np.asarray(jax.grad(loss_sharded)(scene.mat_diffuse))
    np.testing.assert_allclose(g1, g8, rtol=1e-4, atol=1e-8)
