"""BVH build + traversal tests.

Oracle: brute-force all-triangles intersection (ops/intersect.py).
Counter methodology mirrors the reference's BVH-quality comparison
(/root/reference/benchmarks.md:16-32).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.accel.bvh import MEDIAN, MIDDLE, SAH, build_bvh
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.ops.bvh_traverse import make_bvh_intersect, traverse
from orion_tpu.ops.intersect import intersect_brute
from orion_tpu.scene import load_scene

STRATEGIES = (MEDIAN, MIDDLE, SAH)


@pytest.fixture(scope="module")
def nanosuit_scene(assets_dir):
    return load_scene(assets_dir / "nanosuit.rtc", load_textures=False)


def _rays(scene, rtc, xres=64, yres=48):
    rtc.xres, rtc.yres = xres, yres
    cam = camera_from_rtc(rtc)
    return primary_rays(cam, 0.001, 0.001)


def _scene_tris(scene):
    return (np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
            np.asarray(scene.tri_e2), np.asarray(scene.tri_valid))


@pytest.mark.parametrize("strategy", STRATEGIES)
@pytest.mark.parametrize("scene_name", ["view_test", "cornell-box", "nanosuit"])
def test_bvh_matches_brute(assets_dir, scene_name, strategy):
    scene, rtc = load_scene(assets_dir / f"{scene_name}.rtc",
                            load_textures=False)
    orig, dirs = _rays(scene, rtc)
    v0, e1, e2, valid = _scene_tris(scene)
    bvh, stats = build_bvh(v0, e1, e2, valid, strategy=strategy)

    h_ref = intersect_brute(scene, orig, dirs)
    h = make_bvh_intersect(bvh)(scene, orig, dirs)

    # same hit/miss classification
    np.testing.assert_array_equal(np.asarray(h.mask), np.asarray(h_ref.mask))
    # ids may differ only on exact-t ties (duplicated faces exist in the
    # cornell OBJ); t must agree everywhere that hits
    m = np.asarray(h_ref.mask)
    t_ref = np.asarray(h_ref.t)[m]
    t_got = np.asarray(h.t)[m]
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-4, atol=1e-5)
    diff = np.asarray(h.tri_id != h_ref.tri_id) & m
    if diff.any():
        np.testing.assert_allclose(np.asarray(h.t)[diff],
                                   np.asarray(h_ref.t)[diff],
                                   rtol=1e-6, atol=1e-7)
        # tied ids must shade identically (same material)
        mats = np.asarray(scene.tri_mat)
        np.testing.assert_array_equal(mats[np.asarray(h.tri_id)[diff]],
                                      mats[np.asarray(h_ref.tri_id)[diff]])


def test_bvh_structure_invariants(nanosuit_scene):
    scene, _ = nanosuit_scene
    v0, e1, e2, valid = _scene_tris(scene)
    bvh, stats = build_bvh(v0, e1, e2, valid, strategy=SAH)
    M = bvh.num_nodes
    skip = np.asarray(bvh.node_skip)
    start = np.asarray(bvh.node_start)
    count = np.asarray(bvh.node_count)
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    orig_ids = np.asarray(bvh.tri_orig)

    # skip pointers: strictly forward, within bounds, root covers everything
    assert skip[0] == M
    assert np.all(skip > np.arange(M))
    assert np.all(skip <= M)

    # every leaf fits exactly one padded bundle
    leaves = start >= 0
    assert np.all(count[leaves] == bvh.leaf_width)
    assert np.all(count[~leaves] == 0)

    # child AABBs nest inside parents (internal node i has child i+1)
    internal = ~leaves
    child = np.arange(M)[internal] + 1
    assert np.all(lo[internal] <= lo[child] + 1e-6)
    assert np.all(hi[internal] >= hi[child] - 1e-6)

    # every valid triangle appears exactly once in the bundles
    real = orig_ids[orig_ids >= 0]
    assert len(real) == int(valid.sum())
    assert len(np.unique(real)) == len(real)

    # padding rows are degenerate (can never report a hit)
    pad = orig_ids < 0
    assert np.all(np.asarray(bvh.tri_e1)[pad] == 0.0)
    assert np.all(np.asarray(bvh.tri_e2)[pad] == 0.0)


def test_bvh_quality_ordering(nanosuit_scene):
    """SAH must beat MEDIAN on work counters, as in benchmarks.md:28-32."""
    scene, rtc = nanosuit_scene
    orig, dirs = _rays(scene, rtc)
    v0, e1, e2, valid = _scene_tris(scene)
    counts = {}
    for strategy in STRATEGIES:
        bvh, _ = build_bvh(v0, e1, e2, valid, strategy=strategy)
        _, _, st = traverse(bvh, orig, dirs, with_stats=True)
        counts[strategy] = (float(st.box_tests), float(st.tri_tests))
    assert counts[SAH][0] < counts[MEDIAN][0]
    assert counts[SAH][1] < counts[MEDIAN][1]
    # and the tree beats brute force by a wide margin on a 19k-tri scene
    n_rays = orig.shape[0]
    brute_tests = n_rays * scene.num_triangles
    assert counts[SAH][1] < brute_tests / 20


def test_bvh_render_equivalence(assets_dir):
    """Path-traced cornell render with the BVH backend matches brute force."""
    import jax

    from orion_tpu.render import render

    scene, rtc = load_scene(assets_dir / "cornell-box.rtc")
    rtc.xres, rtc.yres = 48, 32
    cam = camera_from_rtc(rtc)
    v0, e1, e2, valid = _scene_tris(scene)
    bvh, _ = build_bvh(v0, e1, e2, valid, strategy=SAH)

    key = jax.random.key(7)
    img_ref = render(scene, cam, key, samples=2, max_depth=3,
                     intersect=intersect_brute)
    img_bvh = render(scene, cam, key, samples=2, max_depth=3,
                     intersect=make_bvh_intersect(bvh))
    np.testing.assert_allclose(np.asarray(img_bvh), np.asarray(img_ref),
                               rtol=1e-3, atol=1e-4)


def test_camera_octant_ordering_reduces_work(nanosuit_scene):
    """Near-first child order baked for the camera octant must cut leaf
    tests on coherent primary rays (measured ~40%)."""
    scene, rtc = nanosuit_scene
    orig, dirs = _rays(scene, rtc)
    v0, e1, e2, valid = _scene_tris(scene)
    signs = tuple(np.sign(np.asarray(dirs).mean(axis=0)).tolist())
    signs = tuple(s if s != 0 else 1.0 for s in signs)

    bvh_plain, _ = build_bvh(v0, e1, e2, valid, strategy=SAH)
    bvh_ord, _ = build_bvh(v0, e1, e2, valid, strategy=SAH,
                           order_signs=signs)
    _, _, st_plain = traverse(bvh_plain, orig, dirs, with_stats=True)
    _, _, st_ord = traverse(bvh_ord, orig, dirs, with_stats=True)
    assert float(st_ord.tri_tests) < 0.8 * float(st_plain.tri_tests)

    # and identical hits, of course
    h_plain = make_bvh_intersect(bvh_plain)(scene, orig, dirs)
    h_ord = make_bvh_intersect(bvh_ord)(scene, orig, dirs)
    np.testing.assert_array_equal(np.asarray(h_ord.mask),
                                  np.asarray(h_plain.mask))
    m = np.asarray(h_plain.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(h_ord.t), 0.0),
                               np.where(m, np.asarray(h_plain.t), 0.0),
                               rtol=1e-5, atol=1e-6)
