"""BVH path megakernel (ops/pallas_bvh_path.py) vs the fused replica.

The kernel reuses pallas_fused's _make_regen_body verbatim with a
BVH-walk sweep injected, so its image must match fused_reference_render
(the jnp replica of the brute megakernel) BIT-FOR-BIT up to nearest-hit
ties — same estimator, same PCG4D streams, same winner semantics.
"""

import jax
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bvh_path import (bvh_path_supported,
                                           make_bvh_path_renderer,
                                           pack_bvh_path_table)
from orion_tpu.ops.pallas_fused import fused_reference_render
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def cornell():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    return scene, rtc


def test_gate(cornell):
    scene, _ = cornell
    assert bvh_path_supported(scene)


def test_pack_table_layout(cornell):
    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.ops.pallas_fused import _C_KD, _C_MESH, _C_WOOP

    scene, _ = cornell
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    tab = pack_bvh_path_table(bvh, scene)
    assert tab.shape[0] == 32 and tab.shape[1] % 128 == 0
    pad = np.asarray(bvh.tri_orig) < 0
    # padding rows carry the always-miss Woop transform (zero M rows,
    # c = (0, 0, 1), |n|^2 = 0) and zero material
    assert (tab[_C_WOOP:_C_WOOP + 9, :len(pad)][:, pad] == 0).all()
    assert (tab[_C_WOOP + 11, :len(pad)][pad] == 1.0).all()
    assert (tab[_C_WOOP + 12, :len(pad)][pad] == 0).all()
    assert (tab[_C_KD:_C_KD + 3, :len(pad)][:, pad] == 0).all()
    # real rows carry their original triangle's material identity
    real = ~pad
    orig = np.asarray(bvh.tri_orig)[real]
    np.testing.assert_array_equal(
        tab[_C_MESH, :len(pad)][real],
        np.asarray(scene.tri_mat)[orig].astype(np.float32))


def test_matches_fused_replica_cornell(cornell):
    scene, rtc = cornell
    rtc.xres = rtc.yres = 24
    cam = camera_from_rtc(rtc)
    fn = make_bvh_path_renderer(scene, cam, samples=2, max_depth=3,
                                light_samples=2)
    img = np.asarray(fn(jax.random.key(0)))
    ref = np.asarray(fused_reference_render(scene, cam, jax.random.key(0),
                                            samples=2, max_depth=3,
                                            light_samples=2))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-7)


def test_matches_fused_replica_subdivided(cornell):
    """A real tree (546 tris, several leaves deep) and a non-trivial
    walk order must still reproduce the estimator exactly."""
    scene, rtc = cornell
    scene = subdivide_scene(scene, levels=2)
    rtc.xres = rtc.yres = 16
    cam = camera_from_rtc(rtc)
    fn = make_bvh_path_renderer(scene, cam, samples=2, max_depth=2,
                                light_samples=2)
    img = np.asarray(fn(jax.random.key(3)))
    ref = np.asarray(fused_reference_render(scene, cam, jax.random.key(3),
                                            samples=2, max_depth=2,
                                            light_samples=2))
    np.testing.assert_allclose(img, ref, rtol=1e-6, atol=1e-7)


def test_cli_routes_past_fused_gate_to_big_path(monkeypatch, tmp_path):
    """A path scene beyond FUSED_MAX_TRIS must route to the best
    big-scene megakernel (engine.BIG_PATH_ORDER — the sorted-wavefront
    bounce kernel since round 4), not fall to the wavefront."""
    import argparse

    import orion_tpu.ops.pallas_fused as pf
    from orion_tpu.cli import _maybe_fused
    from orion_tpu.engine import BIG_PATH_ORDER, prepare

    monkeypatch.setattr(pf, "FUSED_MAX_TRIS", 16)  # cornell (36) > gate
    ps = prepare(f"{ASSETS}/cornell-box.rtc", xres=16, yres=16)
    args = argparse.Namespace(backend=None, normal_maps=False, mode=None,
                              samples=1, light_samples=1, strategy="sah")
    fn, name = _maybe_fused(ps, args, max_depth=1)
    assert name == {"bounce": "bounce-pallas", "binned": "binned-pallas",
                    "walk": "bvh-path-pallas"}[BIG_PATH_ORDER[0]]
    img = np.asarray(fn(jax.random.key(0)))
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()


def test_camera_override(cornell):
    """The camera rides scalar memory: overriding it must change the
    image without rebuilding (the viewer's fly path)."""
    import dataclasses

    scene, rtc = cornell
    rtc.xres = rtc.yres = 16
    cam = camera_from_rtc(rtc)
    fn = make_bvh_path_renderer(scene, cam, samples=1, max_depth=1,
                                light_samples=1)
    a = np.asarray(fn(jax.random.key(0)))
    moved = dataclasses.replace(
        cam, origin=tuple(np.asarray(cam.origin) + np.float32(0.1)))
    b = np.asarray(fn(jax.random.key(0), camera_override=moved))
    assert not np.allclose(a, b)


def test_reflatten_octant_structure(cornell):
    """Every per-octant flattening (round 5) is a VALID skip-pointer
    tree over the SAME nodes and leaves: identical multiset of
    (lo, hi, start), consistent skip pointers (DFS subtrees stay
    contiguous), and near-first ordering actually flips children
    between opposite octants."""
    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.ops.pallas_bvh_path import reflatten_octant
    from orion_tpu.scene import subdivide_scene

    scene, _ = cornell
    scene = subdivide_scene(scene, levels=2)
    bvh, _ = build_bvh(np.asarray(scene.tri_v0),
                       np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=64, leaf_width=64)
    lo, hi = np.asarray(bvh.node_lo), np.asarray(bvh.node_hi)
    skip, start = np.asarray(bvh.node_skip), np.asarray(bvh.node_start)
    M = lo.shape[0]

    def canon(lo_, hi_, start_):
        rows = np.concatenate([lo_, hi_, start_[:, None]], axis=1)
        return np.sort(rows.view([("", rows.dtype)] * rows.shape[1]),
                       axis=0)

    base = canon(lo, hi, start)
    orders = []
    for o in range(8):
        signs = tuple(1.0 if (o >> a) & 1 else -1.0 for a in range(3))
        lo2, hi2, skip2, start2 = reflatten_octant(lo, hi, skip, start,
                                                   signs)
        assert lo2.shape[0] == M
        # same node multiset
        np.testing.assert_array_equal(canon(lo2, hi2, start2), base)
        # structural validity: root covers all; every internal node's
        # first child is the next slot; skips are increasing and bounded
        assert skip2[0] == M
        for i in range(M):
            assert i < skip2[i] <= M
            if start2[i] < 0:            # internal: subtree has >= 2 slots
                assert skip2[i] > i + 1
        orders.append(start2.copy())
    # opposite octants must order some children differently
    assert any(not np.array_equal(orders[0], orders[7])
               for _ in range(1)), "octant 0 and 7 emitted identically"
