"""Fused path-tracing megakernel (ops/pallas_fused.py), interpret mode.

The fused kernel is a different RNG stream over the same estimator, so
CPU checks are statistical (mean / correlation vs the wavefront path
tracer) plus exact determinism.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_fused import (fused_path_supported,
                                        make_fused_path_renderer)
from orion_tpu.render import render
from orion_tpu.scene import load_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def cornell():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    rtc.xres, rtc.yres = 48, 28
    return scene, camera_from_rtc(rtc)


def test_gate():
    scene, _ = load_scene(f"{ASSETS}/cornell-box.rtc")
    assert fused_path_supported(scene)
    textured, _ = load_scene(f"{ASSETS}/view_test.rtc")
    assert not fused_path_supported(textured)


def test_fused_matches_wavefront_statistically(cornell):
    scene, cam = cornell
    fn = make_fused_path_renderer(scene, cam, samples=16, max_depth=4,
                                  light_samples=2, ray_block=256)
    img_f = np.asarray(fn(jax.random.key(0)))
    img_w = np.asarray(render(scene, cam, jax.random.key(1), samples=16,
                              max_depth=4, light_samples=2, mode="path"))
    assert np.isfinite(img_f).all()
    corr = float((img_f * img_w).sum()
                 / (np.linalg.norm(img_f) * np.linalg.norm(img_w) + 1e-20))
    assert corr > 0.93, corr
    assert img_f.mean() == pytest.approx(img_w.mean(), rel=0.15)


def test_fused_deterministic(cornell):
    scene, cam = cornell
    fn = make_fused_path_renderer(scene, cam, samples=4, max_depth=3,
                                  light_samples=1, ray_block=256)
    a = np.asarray(fn(jax.random.key(7)))
    b = np.asarray(fn(jax.random.key(7)))
    c = np.asarray(fn(jax.random.key(8)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
