"""Pallas kernel tests (interpret mode on CPU; compiled path covered by
bench runs on real TPU hardware).

Oracle: the jnp brute-force backend (ops/intersect.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.accel.bvh import SAH, build_bvh
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.ops.intersect import intersect_brute
from orion_tpu.ops.pallas_bvh import make_bvh_intersect_pallas
from orion_tpu.ops.pallas_intersect import intersect_brute_pallas
from orion_tpu.scene import load_scene


def _scene_rays(assets_dir, name, xres=32, yres=24):
    scene, rtc = load_scene(assets_dir / f"{name}.rtc", load_textures=False)
    rtc.xres, rtc.yres = xres, yres
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.001, 0.001)
    return scene, orig, dirs


def _assert_hits_match(scene, h, h_ref):
    np.testing.assert_array_equal(np.asarray(h.mask), np.asarray(h_ref.mask))
    m = np.asarray(h_ref.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(h.t), 0.0),
                               np.where(m, np.asarray(h_ref.t), 0.0),
                               rtol=1e-4, atol=1e-5)
    diff = np.asarray(h.tri_id != h_ref.tri_id) & m
    if diff.any():  # exact-t ties (duplicate faces) must shade identically
        np.testing.assert_allclose(np.asarray(h.t)[diff],
                                   np.asarray(h_ref.t)[diff],
                                   rtol=1e-6, atol=1e-7)
        mats = np.asarray(scene.tri_mat)
        np.testing.assert_array_equal(mats[np.asarray(h.tri_id)[diff]],
                                      mats[np.asarray(h_ref.tri_id)[diff]])


@pytest.mark.parametrize("scene_name", ["view_test", "cornell-box", "nanosuit"])
def test_pallas_brute_interpret(assets_dir, scene_name):
    scene, orig, dirs = _scene_rays(assets_dir, scene_name)
    h_ref = intersect_brute(scene, orig, dirs)
    h = intersect_brute_pallas(scene, orig, dirs)
    _assert_hits_match(scene, h, h_ref)


@pytest.mark.parametrize("scene_name", ["view_test", "cornell-box", "nanosuit"])
def test_pallas_bvh_interpret(assets_dir, scene_name):
    scene, orig, dirs = _scene_rays(assets_dir, scene_name)
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    h_ref = intersect_brute(scene, orig, dirs)
    h = make_bvh_intersect_pallas(bvh, scene)(scene, orig, dirs)
    _assert_hits_match(scene, h, h_ref)


@pytest.mark.parametrize("scene_name", ["view_test", "cornell-box",
                                        "nanosuit"])
def test_pallas_bvh_any_hit_occlusion(assets_dir, scene_name):
    """The any-hit variant's mask must equal the closest-hit mask (it may
    report a different triangle, and t is occlusion-only)."""
    scene, orig, dirs = _scene_rays(assets_dir, scene_name)
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    h_ref = intersect_brute(scene, orig, dirs)
    h = make_bvh_intersect_pallas(bvh, scene, any_hit=True)(scene, orig,
                                                            dirs)
    np.testing.assert_array_equal(np.asarray(h.mask), np.asarray(h_ref.mask))
    # reported ids are real intersections: re-test the reported triangle
    from orion_tpu.ops.intersect import mt_test

    ids = np.asarray(h.tri_id)
    m = np.asarray(h.mask)
    t_all = np.asarray(mt_test(orig, dirs, scene.tri_v0, scene.tri_e1,
                               scene.tri_e2, scene.tri_valid))
    assert np.isfinite(t_all[m, ids[m]]).all()


@pytest.mark.parametrize("scene_name", ["cornell-box", "nanosuit"])
def test_pallas_alive_mask(assets_dir, scene_name):
    """alive-masked intersects: live lanes match the oracle, dead lanes
    report miss (both kernels + the jnp backends' protocol arg)."""
    scene, orig, dirs = _scene_rays(assets_dir, scene_name)
    N = orig.shape[0]
    alive = (jnp.arange(N) % 3) != 0  # mixed live/dead pattern
    h_ref = intersect_brute(scene, orig, dirs)

    if scene_name == "cornell-box":
        h = intersect_brute_pallas(scene, orig, dirs, alive=alive)
    else:
        bvh, _ = build_bvh(np.asarray(scene.tri_v0),
                           np.asarray(scene.tri_e1),
                           np.asarray(scene.tri_e2),
                           np.asarray(scene.tri_valid), strategy=SAH,
                           leaf_size=128, leaf_width=128)
        h = make_bvh_intersect_pallas(bvh, scene)(scene, orig, dirs,
                                                  alive=alive)
    a = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(h.mask)[a],
                                  np.asarray(h_ref.mask)[a])
    np.testing.assert_allclose(np.asarray(h.t)[a & np.asarray(h_ref.mask)],
                               np.asarray(h_ref.t)[a & np.asarray(h_ref.mask)],
                               rtol=1e-4, atol=1e-5)
    assert not np.asarray(h.mask)[~a].any()  # dead lanes miss

    # fully-dead batch: every backend returns all-miss
    h0 = (intersect_brute_pallas(scene, orig, dirs,
                                 alive=jnp.zeros(N, bool))
          if scene_name == "cornell-box" else
          make_bvh_intersect_pallas(bvh, scene)(
              scene, orig, dirs, alive=jnp.zeros(N, bool)))
    assert not np.asarray(h0.mask).any()


def test_pallas_brute_under_grad(assets_dir):
    """The Pallas backend must compose with jax.grad (ids are detached;
    hit_attributes recomputes differentiably)."""
    from orion_tpu.ops.intersect import hit_attributes

    scene, orig, dirs = _scene_rays(assets_dir, "cornell-box", 16, 12)

    def loss(v0):
        import dataclasses

        s = dataclasses.replace(scene, tri_v0=v0)
        h = intersect_brute_pallas(s, orig, dirs)
        a = hit_attributes(s, orig, dirs, h)
        return jnp.sum(jnp.where(h.mask, a.t, 0.0))

    g = jax.grad(loss)(scene.tri_v0)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0.0
