"""Closed-form bounce-PRB trainer (ops/pallas_bounce_prb.py) vs
reverse-mode AD.

Oracle: jax.grad of the equivalent jnp estimator (brute sweep over the
same bundled table, LEGACY NEE — live ke). The trainer's forward runs
the fast-shadow NEE whose light normal takes a different fp path
(sampled barycentrics vs recomputed Woop u,v), so values agree to
~1e-6 relative, not bitwise; the closed-form adjoints inherit that
delta. Tolerances below are set accordingly (and are far inside the
1e-3 gradient-accuracy bar of VERDICT r3 #4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bounce_prb import (bounce_train_reference_grads,
                                             make_bounce_train_step)
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def cornell():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    return scene, rtc


def _check_scene(scene, rtc, *, res=16, samples=2, max_depth=3,
                 light_samples=2, seed=5, rtol=3e-4, sort=True):
    rtc.xres = rtc.yres = res
    cam = camera_from_rtc(rtc)
    key = jax.random.key(seed)
    target = jnp.zeros((res, res, 3), jnp.float32)

    step = make_bounce_train_step(scene, cam, target, samples=samples,
                                  max_depth=max_depth,
                                  light_samples=light_samples, sort=sort)
    loss, g = step(key)

    loss_ad, g_ad = bounce_train_reference_grads(
        scene, cam, target, key, samples=samples, max_depth=max_depth,
        light_samples=light_samples)

    np.testing.assert_allclose(float(loss), float(loss_ad), rtol=1e-4)
    for k in ("mat_diffuse", "mat_emissive"):
        scale = np.abs(np.asarray(g_ad[k])).max()
        assert scale > 0, f"AD oracle grad {k} is all zero"
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(g_ad[k]),
                                   rtol=rtol, atol=rtol * scale,
                                   err_msg=k)
    return loss, g


def test_grads_match_ad_cornell(cornell):
    scene, rtc = cornell
    _check_scene(scene, rtc)


def test_grads_match_ad_cornell_unsorted(cornell):
    """sort=False path (no compaction, scattered live lanes): the dump
    realignment must be permutation-proof."""
    scene, rtc = cornell
    _check_scene(scene, rtc, res=8, samples=2, max_depth=2, seed=3,
                 sort=False)


def test_grads_match_ad_subdivided(cornell):
    """Multi-leaf tree + compaction switches at >2k triangles: the
    per-depth zero-padded dumps and rider realignment."""
    scene, rtc = cornell
    scene = subdivide_scene(scene, levels=3)
    _check_scene(scene, rtc, res=8, samples=2, max_depth=2, seed=9)


def test_loss_matches_renderer(cornell):
    """The trainer's forward IS the bounce renderer: loss == MSE of its
    image (to compiler-fusion fp noise — the aux-dumping kernel variant
    is a different XLA program, so ulp-level reassociation differs)."""
    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    scene, rtc = cornell
    rtc.xres = rtc.yres = 16
    cam = camera_from_rtc(rtc)
    key = jax.random.key(11)
    target = jnp.full((16, 16, 3), 0.25, jnp.float32)

    step = make_bounce_train_step(scene, cam, target, samples=2,
                                  max_depth=3)
    loss, _ = step(key)
    img = make_bounce_path_renderer(scene, cam, samples=2,
                                    max_depth=3)(key)
    want = jnp.mean((img - target) ** 2)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
