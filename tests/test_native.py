"""Native (C++) host-runtime parity tests vs the Python implementations.

Skipped wholesale when the toolchain can't build native/_orion_native.so.
"""

import numpy as np
import pytest

from orion_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


@pytest.fixture(scope="module")
def nanosuit_tris(assets_dir):
    from orion_tpu.scene import load_scene

    scene, _ = load_scene(assets_dir / "nanosuit.rtc", load_textures=False)
    return (np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
            np.asarray(scene.tri_e2), np.asarray(scene.tri_valid))


@pytest.mark.parametrize("strategy", ["median", "middle", "sah"])
def test_native_bvh_matches_oracle(assets_dir, nanosuit_tris, strategy):
    """Native-built tree must produce identical nearest hits to brute."""
    from orion_tpu.accel.bvh import build_bvh
    from orion_tpu.camera import camera_from_rtc, primary_rays
    from orion_tpu.ops.bvh_traverse import make_bvh_intersect
    from orion_tpu.ops.intersect import intersect_brute
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene(assets_dir / "nanosuit.rtc", load_textures=False)
    rtc.xres, rtc.yres = 48, 36
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.001, 0.001)
    v0, e1, e2, valid = nanosuit_tris

    bvh, stats = build_bvh(v0, e1, e2, valid, strategy=strategy,
                           builder="native")
    assert stats.nodes > 100
    h = make_bvh_intersect(bvh)(scene, orig, dirs)
    h_ref = intersect_brute(scene, orig, dirs)
    np.testing.assert_array_equal(np.asarray(h.mask), np.asarray(h_ref.mask))
    m = np.asarray(h_ref.mask)
    np.testing.assert_allclose(np.where(m, np.asarray(h.t), 0.0),
                               np.where(m, np.asarray(h_ref.t), 0.0),
                               rtol=1e-4, atol=1e-5)


def test_native_bvh_structure(nanosuit_tris):
    from orion_tpu.accel.bvh import build_bvh

    v0, e1, e2, valid = nanosuit_tris
    bvh, stats = build_bvh(v0, e1, e2, valid, strategy="sah",
                           builder="native")
    M = bvh.num_nodes
    skip = np.asarray(bvh.node_skip)
    start = np.asarray(bvh.node_start)
    count = np.asarray(bvh.node_count)
    orig_ids = np.asarray(bvh.tri_orig)

    assert skip[0] == M
    assert np.all(skip > np.arange(M)) and np.all(skip <= M)
    leaves = start >= 0
    assert np.all(count[leaves] == bvh.leaf_width)
    real = orig_ids[orig_ids >= 0]
    assert len(real) == int(valid.sum())
    assert len(np.unique(real)) == len(real)


def test_native_bvh_comparable_quality(nanosuit_tris):
    """Native and NumPy SAH trees should do comparable traversal work."""
    import jax.numpy as jnp

    from orion_tpu.accel.bvh import build_bvh
    from orion_tpu.ops.bvh_traverse import traverse

    v0, e1, e2, valid = nanosuit_tris
    rng = np.random.default_rng(0)
    orig = jnp.asarray(rng.normal(0, 5, (512, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 1, (512, 3)).astype(np.float32))

    work = {}
    for builder in ("native", "numpy"):
        bvh, _ = build_bvh(v0, e1, e2, valid, strategy="sah",
                           builder=builder)
        _, _, st = traverse(bvh, orig, dirs, with_stats=True)
        work[builder] = float(st.tri_tests)
    assert work["native"] < work["numpy"] * 1.5
    assert work["numpy"] < work["native"] * 1.5


def test_native_obj_matches_python(assets_dir):
    from orion_tpu.io.obj import load_obj

    for name in ("cornell-box/cornell-box.obj", "view_test.obj",
                 "nanosuit2/nanosuit2.obj"):
        nat = load_obj(assets_dir / name, parser="native")
        py = load_obj(assets_dir / name, parser="python")
        assert len(nat.meshes) == len(py.meshes)
        for mn, mp in zip(nat.meshes, py.meshes):
            assert mn.material.name == mp.material.name
            assert mn.num_triangles == mp.num_triangles
            np.testing.assert_allclose(mn.positions, mp.positions, atol=1e-6)
            np.testing.assert_allclose(mn.normals, mp.normals, atol=1e-6)
            np.testing.assert_allclose(mn.uvs, mp.uvs, atol=1e-6)
        assert set(nat.materials) >= set(
            m.material.name for m in py.meshes if m.material.name != "<default>")


def test_native_obj_speed(assets_dir):
    """The native parser should be decisively faster on the big asset."""
    import time

    from orion_tpu.io.obj import load_obj

    path = assets_dir / "nanosuit2/nanosuit2.obj"
    t0 = time.perf_counter()
    load_obj(path, parser="native")
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    load_obj(path, parser="python")
    t_python = time.perf_counter() - t0
    assert t_native < t_python
