"""Wavefront PRB trainer (ops/prb_wavefront.py) vs reverse-mode AD.

The oracle is jax.grad of the IDENTICAL estimator evaluated with the
brute jnp sweep over the same bundled table (differentiable through
tab_updater_from_bvh's material rows) — same PCG4D streams, same NEE/
RR/bounce math, same winner semantics, so the closed-form replay must
match to float tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bounce import _make_bounce_step, wavefront_rays
from orion_tpu.ops.pallas_bvh_prb import tab_updater_from_bvh
from orion_tpu.ops.pallas_fused import (_emitters_consts, _make_geom,
                                        camera_vec, seed_scalar)
from orion_tpu.ops.prb_wavefront import (make_binned_train_step,
                                         wavefront_train_supported)
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def cornell():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    return scene, rtc


def _ad_loss_and_grads(scene, bvh, camera, target, key, *, samples,
                       max_depth, light_samples):
    """Reverse-mode AD of the estimator the wavefront trainer replays."""
    update = tab_updater_from_bvh(bvh, scene)
    emitter = _emitters_consts(scene)
    cam_v = camera_vec(camera)
    H, W = camera.yres, camera.xres
    n_pix = H * W
    seed = seed_scalar(key)[0]
    target = jnp.asarray(target, jnp.float32)

    def loss_fn(params):
        s = dataclasses.replace(scene, **params)
        tab = update(s)
        tabT = tab.T
        B_pad = tab.shape[1]
        _, sweep = _make_geom(lambda c: tabT[:, c:c + 1], B_pad,
                              chunk=None, blk=lambda: tabT)
        pix, samp, o, d = wavefront_rays(seed, cam_v, W, H, samples)
        step = _make_bounce_step(sweep, emitter, seed, light_samples,
                                 max_depth)
        ones = jnp.ones_like(o[0])
        carry = (o, d, (ones, ones, ones),
                 jnp.ones(o[0].shape, bool),
                 tuple(jnp.zeros_like(o[0]) for _ in range(3)))

        def body(carry, depth):
            o, d, thr, alive, acc = carry
            rad, o, d, thr, alive = step(pix, samp, depth, o, d, thr,
                                         alive)
            acc = tuple(a + r for a, r in zip(acc, rad))
            return (o, d, thr, alive, acc), None

        (_, _, _, _, acc), _ = jax.lax.scan(
            body, carry, jnp.arange(max_depth + 1, dtype=jnp.int32))
        lane_rgb = jnp.stack([c[0] for c in acc], axis=-1)
        img = jnp.zeros((n_pix, 3), jnp.float32).at[pix[0]].add(
            lane_rgb) / np.float32(samples)
        diff = img.reshape(H, W, 3) - target
        return jnp.mean(diff * diff)

    params = {"mat_diffuse": scene.mat_diffuse,
              "mat_emissive": scene.mat_emissive}
    return loss_fn(params), jax.grad(loss_fn)(params)


def _check_scene(scene, rtc, *, res=16, samples=2, max_depth=3,
                 light_samples=2, seed=5, rtol=2e-4):
    from orion_tpu.ops.pallas_binned import binned_device_data

    rtc.xres = rtc.yres = res
    cam = camera_from_rtc(rtc)
    key = jax.random.key(seed)
    H, W = cam.yres, cam.xres
    target = jnp.zeros((H, W, 3), jnp.float32)

    step = make_binned_train_step(scene, cam, target, samples=samples,
                                  max_depth=max_depth,
                                  light_samples=light_samples)
    loss, g = step(key)

    _, _, bvh = binned_device_data(scene)
    loss_ad, g_ad = _ad_loss_and_grads(
        scene, bvh, cam, target, key, samples=samples,
        max_depth=max_depth, light_samples=light_samples)

    np.testing.assert_allclose(float(loss), float(loss_ad), rtol=1e-5)
    for k in ("mat_diffuse", "mat_emissive"):
        scale = np.abs(np.asarray(g_ad[k])).max()
        assert scale > 0, f"AD oracle grad {k} is all zero"
        np.testing.assert_allclose(np.asarray(g[k]),
                                   np.asarray(g_ad[k]),
                                   rtol=rtol, atol=rtol * scale,
                                   err_msg=k)
    return loss, g


def test_gate(cornell):
    scene, _ = cornell
    assert wavefront_train_supported(scene)


def test_grads_match_ad_cornell(cornell):
    scene, rtc = cornell
    _check_scene(scene, rtc)


def test_grads_match_ad_subdivided(cornell):
    """Multi-bin table: the scatter routing and U bookkeeping at >2k
    triangles."""
    scene, rtc = cornell
    scene = subdivide_scene(scene, levels=3)
    _check_scene(scene, rtc, res=8, samples=2, max_depth=2, seed=9)


def test_dynamic_params_step(cornell):
    """step(params, key) recomputes the table in-graph: perturbing
    mat_diffuse changes loss and grads (an optax loop would converge)."""
    scene, rtc = cornell
    rtc.xres = rtc.yres = 8
    cam = camera_from_rtc(rtc)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    step = make_binned_train_step(scene, cam, target, samples=2,
                                  max_depth=2, dynamic_params=True)
    key = jax.random.key(0)
    p0 = {"mat_diffuse": scene.mat_diffuse,
          "mat_emissive": scene.mat_emissive}
    l0, g0 = step(p0, key)
    p1 = {"mat_diffuse": scene.mat_diffuse * 0.5,
          "mat_emissive": scene.mat_emissive}
    l1, g1 = step(p1, key)
    assert float(l0) != float(l1)
    assert np.isfinite(np.asarray(g1["mat_diffuse"])).all()
