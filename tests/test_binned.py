"""Binned dense-traversal backend (ops/pallas_binned.py), interpret mode.

The binned sweep shares the bounce kernel's estimator (same PCG4D
streams, same NEE/RR/bounce math via _make_bounce_step) and its winner
semantics (min t, ties by bundled row), so rendered images must match
the pure-jnp replica bit-for-bit up to nearest-hit ties — on the base
cornell AND on a subdivided scene big enough to exercise multi-bin
coverage (VERDICT r3 next #2).
"""

import jax
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_binned import (binned_device_data, make_bins,
                                         make_binned_path_renderer)
from orion_tpu.ops.pallas_bounce import bounce_reference_render
from orion_tpu.ops.pallas_bvh_whitted import LEAF_WIDTH
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def cornell():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    return scene, rtc


@pytest.fixture(scope="module")
def cornell_subdiv(cornell):
    scene, rtc = cornell
    return subdivide_scene(scene, levels=3), rtc  # 2,178 triangles


def test_make_bins_partitions_bundled_rows(cornell_subdiv):
    """Bins tile [0, bundled_rows) disjointly, 128-aligned, in row order
    (the round kernel's dense scan depends on exactly this)."""
    scene, _ = cornell_subdiv
    bins, tab, bvh = binned_device_data(scene, max_rows=512)
    assert bins.k >= 2, "subdivided scene should produce multiple bins"
    # +1 sentinel bin with zero bundles for dead/retired lanes
    assert bins.row0.shape == (bins.k + 1,)
    assert bins.n_bundles[-1] == 0
    spans = sorted(
        (int(r0), int(nb) * LEAF_WIDTH)
        for r0, nb in zip(bins.row0[:-1], bins.n_bundles[:-1]))
    cur = 0
    for r0, rows in spans:
        assert r0 == cur, "bins must be disjoint and gap-free"
        assert r0 % LEAF_WIDTH == 0
        assert rows > 0
        cur += rows
    assert cur == bvh.num_bundled, "bins must cover every bundled row"


def test_make_bins_respects_max_rows(cornell_subdiv):
    scene, _ = cornell_subdiv
    bins, _, _ = binned_device_data(scene, max_rows=512)
    # a bin may exceed max_rows only when it IS a single leaf (the cut
    # cannot go deeper); leaf width is 128 <= 512, so none may here
    rows = np.asarray(bins.n_bundles[:-1]) * LEAF_WIDTH
    assert (rows <= 512).all()


def _render_pair(scene, rtc, *, res=16, samples=4, max_depth=3, seed=3,
                 max_rows=512):
    rtc.xres = rtc.yres = res
    cam = camera_from_rtc(rtc)
    key = jax.random.key(seed)
    fn = make_binned_path_renderer(scene, cam, samples=samples,
                                   max_depth=max_depth, light_samples=2,
                                   max_rows=max_rows)
    img_b = np.asarray(fn(key))
    img_r = np.asarray(bounce_reference_render(
        scene, cam, key, samples=samples, max_depth=max_depth,
        light_samples=2))
    return img_b, img_r


def test_binned_matches_replica_base(cornell):
    scene, rtc = cornell
    img_b, img_r = _render_pair(scene, rtc)
    assert np.isfinite(img_b).all()
    assert img_b.max() > 0
    np.testing.assert_allclose(img_b, img_r, rtol=1e-5, atol=1e-6)


def test_binned_matches_replica_subdivided(cornell_subdiv):
    """>=2k-triangle scene: multi-bin table, near-far bin retirement and
    the post-hoc winner-row attribute gather all get real coverage."""
    scene, rtc = cornell_subdiv
    img_b, img_r = _render_pair(scene, rtc, samples=2, max_depth=2,
                                seed=7)
    assert np.isfinite(img_b).all()
    assert img_b.max() > 0
    np.testing.assert_allclose(img_b, img_r, rtol=1e-5, atol=1e-6)


def test_binned_small_bins_invariant(cornell_subdiv):
    """The image must not depend on the bin cut (max_rows): bins are a
    traversal order, not an estimator change."""
    scene, rtc = cornell_subdiv
    img_a, _ = _render_pair(scene, rtc, res=8, samples=2, max_depth=2,
                            seed=5, max_rows=256)
    img_b, _ = _render_pair(scene, rtc, res=8, samples=2, max_depth=2,
                            seed=5, max_rows=1024)
    np.testing.assert_allclose(img_a, img_b, rtol=1e-5, atol=1e-6)
