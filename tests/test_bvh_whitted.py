"""BVH Whitted megakernel (ops/pallas_bvh_whitted.py), interpret mode.

The exact oracle is the BRUTE Whitted megakernel (ops/pallas_whitted.py):
both draw the same PCG4D streams from the same seeds, so on the same
scene their images must agree to float rounding — any larger difference
is a traversal or attribute-picking bug, not estimator variance. The
wavefront comparison is statistical (different jitter stream).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import Camera
from orion_tpu.ops.pallas_bvh_whitted import (
    bvh_whitted_deferred_supported, bvh_whitted_supported,
    make_bvh_whitted_deferred, make_bvh_whitted_renderer)
from orion_tpu.ops.pallas_whitted import make_fused_whitted_renderer
from orion_tpu.render import render
from orion_tpu.scene import load_scene, make_synthetic_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def soup():
    scene = make_synthetic_scene(1500, seed=3)
    # nonzero Ks so the mirror-continuation path runs
    scene = dataclasses.replace(
        scene, mat_specular=jnp.asarray(np.full((1, 3), 0.25, np.float32)))
    cam = Camera(origin=jnp.asarray([0.0, 0.0, 35.0]),
                 front=jnp.asarray([0.0, 0.0, -1.0]),
                 right=jnp.asarray([1.0, 0.0, 0.0]),
                 up=jnp.asarray([0.0, 1.0, 0.0]), xres=48, yres=32)
    return scene, cam


def test_gate(soup):
    scene, _ = soup
    assert bvh_whitted_supported(scene)
    textured = dataclasses.replace(
        scene, mat_map_diffuse=jnp.zeros(1, jnp.int32))
    assert not bvh_whitted_supported(textured)  # texture maps
    no_light, _ = load_scene(f"{ASSETS}/cornell-box.rtc")
    assert not bvh_whitted_supported(no_light)  # no point lights


def test_matches_brute_megakernel_exactly(soup):
    scene, cam = soup
    key = jax.random.key(0)
    img_b = np.asarray(make_bvh_whitted_renderer(
        scene, cam, samples=4, max_depth=2)(key))
    img_f = np.asarray(make_fused_whitted_renderer(
        scene, cam, samples=4, max_depth=2)(key))
    np.testing.assert_allclose(img_b, img_f, atol=5e-5, rtol=1e-4)
    assert img_b.mean() > 0.01  # non-vacuous


def test_matches_wavefront_statistically(soup):
    scene, cam = soup
    img_k = np.asarray(make_bvh_whitted_renderer(
        scene, cam, samples=8, max_depth=2)(jax.random.key(0)))
    img_w = np.asarray(render(scene, cam, jax.random.key(1), samples=8,
                              max_depth=2, light_samples=1,
                              mode="whitted"))
    assert np.isfinite(img_k).all()
    corr = float((img_k * img_w).sum()
                 / (np.linalg.norm(img_k) * np.linalg.norm(img_w) + 1e-20))
    assert corr > 0.9, corr
    assert img_k.mean() == pytest.approx(img_w.mean(), rel=0.15)


def test_deterministic(soup):
    scene, cam = soup
    fn = make_bvh_whitted_renderer(scene, cam, samples=2, max_depth=1)
    a = np.asarray(fn(jax.random.key(7)))
    b = np.asarray(fn(jax.random.key(7)))
    c = np.asarray(fn(jax.random.key(8)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


# ---------------------------------------------------------------------
# deferred texturing (make_bvh_whitted_deferred)
# ---------------------------------------------------------------------

def _with_checker_texture(scene, side=8):
    """Attach an 8x8 red/green checkerboard as every material's diffuse
    map, with random per-corner UVs so the lookup actually varies."""
    rng = np.random.default_rng(11)
    T = scene.uv0.shape[0]
    atlas = np.zeros((side, side, 3), np.float32)
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    check = ((xx + yy) % 2).astype(np.float32)
    atlas[..., 0] = check
    atlas[..., 1] = 1.0 - check
    return dataclasses.replace(
        scene,
        uv0=jnp.asarray(rng.random((T, 2), np.float32)),
        uv1=jnp.asarray(rng.random((T, 2), np.float32)),
        uv2=jnp.asarray(rng.random((T, 2), np.float32)),
        mat_map_diffuse=jnp.zeros(scene.mat_diffuse.shape[0], jnp.int32),
        tex_atlas=jnp.asarray(atlas),
        tex_off=jnp.zeros((1, 2), jnp.int32),
        tex_hw=jnp.full((1, 2), side, jnp.int32))


def test_deferred_gate(soup):
    from orion_tpu.ops.pallas_bvh_whitted import MAX_DEFERRED_DEPTH

    scene, _ = soup
    assert bvh_whitted_deferred_supported(scene, 0)
    assert bvh_whitted_deferred_supported(scene, 1)  # round 4: mirrors
    assert bvh_whitted_deferred_supported(scene, MAX_DEFERRED_DEPTH)
    assert not bvh_whitted_deferred_supported(scene,
                                              MAX_DEFERRED_DEPTH + 1)
    no_light, _ = load_scene(f"{ASSETS}/cornell-box.rtc")
    assert not bvh_whitted_deferred_supported(no_light, 0)


def test_deferred_matches_solid_kernel_exactly(soup):
    """On an untextured scene the deferred kernel + epilogue computes the
    SAME estimator from the SAME PCG4D streams as the solid megakernel —
    any difference beyond float re-association is a record/epilogue bug."""
    scene, cam = soup
    key = jax.random.key(0)
    img_d = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=4)(key))
    img_s = np.asarray(make_bvh_whitted_renderer(
        scene, cam, samples=4, max_depth=0)(key))
    np.testing.assert_allclose(img_d, img_s, atol=5e-5, rtol=1e-4)
    assert img_d.mean() > 0.01


def test_deferred_constant_texture_equals_solid(soup):
    """A 4x4 texture holding the material's solid diffuse color in every
    texel must render EXACTLY like the solid material (same streams)."""
    scene, cam = soup
    kd = np.asarray(scene.mat_diffuse)[0]
    atlas = np.broadcast_to(kd, (4, 4, 3)).astype(np.float32)
    textured = dataclasses.replace(
        scene,
        mat_map_diffuse=jnp.zeros(1, jnp.int32),
        tex_atlas=jnp.asarray(atlas),
        tex_off=jnp.zeros((1, 2), jnp.int32),
        tex_hw=jnp.full((1, 2), 4, jnp.int32))
    key = jax.random.key(3)
    img_t = np.asarray(make_bvh_whitted_deferred(
        textured, cam, samples=2)(key))
    img_s = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=2)(key))
    np.testing.assert_allclose(img_t, img_s, atol=1e-6)


def test_deferred_varying_texture_vs_wavefront(soup):
    """Checkerboard diffuse map with random UVs: the deferred kernel must
    agree with the wavefront (which samples textures per bounce) — the
    jitter streams differ, so the comparison is statistical."""
    scene, cam = soup
    textured = _with_checker_texture(scene)
    img_k = np.asarray(make_bvh_whitted_deferred(
        textured, cam, samples=32)(jax.random.key(0)))
    img_w = np.asarray(render(textured, cam, jax.random.key(1), samples=32,
                              max_depth=0, light_samples=1,
                              mode="whitted"))
    assert np.isfinite(img_k).all()
    corr = float((img_k * img_w).sum()
                 / (np.linalg.norm(img_k) * np.linalg.norm(img_w) + 1e-20))
    assert corr > 0.95, corr
    assert img_k.mean() == pytest.approx(img_w.mean(), rel=0.15)
    # the checkerboard must actually show up (not the solid color)
    solid = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=32)(jax.random.key(0)))
    assert not np.allclose(img_k, solid, atol=1e-3)


def test_deferred_multibounce_matches_solid_kernel(soup):
    """Depth-2 mirror chains, untextured: the deferred records + ks-chain
    epilogue must reproduce the solid megakernel's estimator from the
    same PCG4D streams (round-4 VERDICT #7 — the depth gate lift)."""
    scene, cam = soup
    key = jax.random.key(2)
    img_d = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=4, max_depth=2)(key))
    img_s = np.asarray(make_bvh_whitted_renderer(
        scene, cam, samples=4, max_depth=2)(key))
    np.testing.assert_allclose(img_d, img_s, atol=5e-5, rtol=1e-4)
    # mirrors must contribute (otherwise this test proves nothing)
    img_0 = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=4, max_depth=0)(key))
    assert np.abs(img_d - img_0).max() > 1e-4


def test_deferred_multibounce_textured_vs_wavefront(soup):
    """Textured depth-2: per-bounce texels enter both the local shading
    and the ks mirror chain; statistical parity with the wavefront."""
    scene, cam = soup
    textured = _with_checker_texture(soup[0])
    img_k = np.asarray(make_bvh_whitted_deferred(
        textured, cam, samples=32, max_depth=2)(jax.random.key(0)))
    img_w = np.asarray(render(textured, cam, jax.random.key(1),
                              samples=32, max_depth=2, light_samples=1,
                              mode="whitted"))
    assert np.isfinite(img_k).all()
    corr = float((img_k * img_w).sum()
                 / (np.linalg.norm(img_k) * np.linalg.norm(img_w) + 1e-20))
    assert corr > 0.95, corr
    assert img_k.mean() == pytest.approx(img_w.mean(), rel=0.15)


def test_deferred_sample_chunking_composes(soup, monkeypatch):
    """Chunked launches (samples > MAX_REC_GROUPS // (depth+1)) must
    bit-compose: global sample indices key the RNG streams."""
    import orion_tpu.ops.pallas_bvh_whitted as mod

    scene, cam = soup
    key = jax.random.key(5)
    img_one = np.asarray(make_bvh_whitted_deferred(
        scene, cam, samples=6, max_depth=1)(key))
    monkeypatch.setattr(mod, "MAX_REC_GROUPS", 4)  # force 3 chunks of 2
    img_chunked = np.asarray(mod.make_bvh_whitted_deferred(
        scene, cam, samples=6, max_depth=1)(key))
    np.testing.assert_allclose(img_chunked, img_one, atol=1e-6)
