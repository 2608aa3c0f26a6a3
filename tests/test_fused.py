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


def _corr(a, b):
    return float((a * b).sum()
                 / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-20))


def test_chunked_sweep_matches_unchunked(cornell):
    """Midpoint subdivision preserves the surfaces exactly, so the
    chunked fori_loop sweep (T_pad 1024 > FUSED_CHUNK) must reproduce the
    single-slice render of the ORIGINAL geometry up to float rounding in
    the re-tessellated interpolants."""
    from orion_tpu.ops.pallas_fused import FUSED_CHUNK, _fused_t_pad
    from orion_tpu.scene import subdivide_scene

    scene, cam = cornell
    s2 = subdivide_scene(scene, levels=2)
    assert _fused_t_pad(s2.num_triangles) > FUSED_CHUNK
    assert fused_path_supported(s2)

    fn0 = make_fused_path_renderer(scene, cam, samples=4, max_depth=3,
                                   light_samples=1, ray_block=256)
    fn2 = make_fused_path_renderer(s2, cam, samples=4, max_depth=3,
                                   light_samples=1, ray_block=256)
    img0 = np.asarray(fn0(jax.random.key(0)))
    img2 = np.asarray(fn2(jax.random.key(0)))
    assert np.isfinite(img2).all()
    assert _corr(img0, img2) > 0.99
    assert img2.mean() == pytest.approx(img0.mean(), rel=0.05)


def test_multi_emitter_matches_wavefront(cornell):
    """A second emissive mesh routes through the per-mesh NEE loop; the
    wavefront path tracer is the independent estimator to match."""
    import dataclasses

    scene, cam = cornell
    counts = np.asarray(scene.mesh_tri_count)
    em0 = int(np.asarray(scene.emissive_mesh_ids)[0])
    m2 = next(m for m in range(scene.num_meshes)
              if m != em0 and counts[m] <= 8)
    ke = np.asarray(scene.mat_emissive).copy()
    ke[m2] = (0.5, 0.4, 0.3)
    s2 = dataclasses.replace(
        scene, mat_emissive=jnp.asarray(ke),
        emissive_mesh_ids=jnp.asarray(np.array([em0, m2], np.int32)),
        num_emissive=2)
    assert fused_path_supported(s2)

    fn = make_fused_path_renderer(s2, cam, samples=16, max_depth=4,
                                  light_samples=2, ray_block=256)
    img_f = np.asarray(fn(jax.random.key(0)))
    img_w = np.asarray(render(s2, cam, jax.random.key(1), samples=16,
                              max_depth=4, light_samples=2, mode="path"))
    assert np.isfinite(img_f).all()
    assert _corr(img_f, img_w) > 0.95
    assert img_f.mean() == pytest.approx(img_w.mean(), rel=0.15)


def test_gate_limits():
    from orion_tpu.ops.pallas_fused import FUSED_MAX_TRIS
    from orion_tpu.scene import subdivide_scene

    scene, _ = load_scene(f"{ASSETS}/cornell-box.rtc")
    # 34 * 4^5 + 2 = 34818: one level past the 16k brute gate
    s_big = subdivide_scene(scene, levels=5)
    assert s_big.num_triangles > FUSED_MAX_TRIS
    assert not fused_path_supported(s_big)
