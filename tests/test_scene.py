"""Tests for the SoA Scene builder."""

import numpy as np
import pytest


def test_cornell_scene_tables(cornell_scene):
    scene, rtc = cornell_scene
    assert scene.num_triangles == 36
    assert scene.padded_triangles % 128 == 0
    assert scene.num_meshes == 8
    assert scene.num_emissive == 1
    assert scene.num_lights == 0  # cornell's only L line is commented out
    assert int(np.sum(np.asarray(scene.tri_valid))) == 36
    # padding triangles are degenerate
    e1 = np.asarray(scene.tri_e1)[36:]
    assert np.all(e1 == 0.0)
    # light mesh area: 2 triangles spanning a ~0.47 x 0.38 quad
    em = int(np.asarray(scene.emissive_mesh_ids)[0])
    area = float(np.asarray(scene.mesh_area)[em])
    assert 0.1 < area < 0.3
    # material of the light mesh
    ke = np.asarray(scene.mat_emissive)[em]
    np.testing.assert_allclose(ke, [4.0, 3.5, 3.0])
    # mesh ranges tile the triangle array
    starts = np.asarray(scene.mesh_tri_start)
    counts = np.asarray(scene.mesh_tri_count)
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], (starts + counts)[:-1])
    assert starts[-1] + counts[-1] == 36


def test_view_test_scene_lights(view_test_scene):
    scene, rtc = view_test_scene
    assert scene.num_lights == 1
    np.testing.assert_allclose(np.asarray(scene.light_pos)[0], [0.5, 0.5, 0.5])
    np.testing.assert_allclose(
        np.asarray(scene.light_color)[0], [1.0, 1.0, 250 / 255], rtol=1e-6
    )
    assert float(np.asarray(scene.light_intensity)[0]) == 32.0
    assert scene.num_emissive == 0


def test_triangle_area_correct(cornell_scene):
    # floor mesh: two triangles covering a ~2.01 x 2.03 quad -> area ~4.08
    scene, _ = cornell_scene
    area = float(np.asarray(scene.mesh_area)[0])
    assert area == pytest.approx(4.08, rel=0.05)


def test_scene_is_pytree(cornell_scene):
    import jax

    scene, _ = cornell_scene
    leaves = jax.tree_util.tree_leaves(scene)
    assert len(leaves) > 20
    # static fields are not leaves
    assert all(not isinstance(l, int) for l in leaves)


def test_subdivide_scene_preserves_geometry():
    """4-to-1 midpoint subdivision: same surfaces, 4x the triangles
    (emissive meshes skipped), per-mesh area sums preserved, child
    normals parallel to parents."""
    import numpy as np

    from orion_tpu.scene import load_scene, subdivide_scene, triangle_areas

    scene, _ = load_scene("/root/reference/assets/cornell-box.rtc")
    s2 = subdivide_scene(scene, levels=1)

    counts = np.asarray(scene.mesh_tri_count)
    counts2 = np.asarray(s2.mesh_tri_count)
    em = set(int(i) for i in np.asarray(scene.emissive_mesh_ids) if i >= 0)
    for m in range(scene.num_meshes):
        expect = counts[m] if m in em else 4 * counts[m]
        assert counts2[m] == expect

    def mesh_area(s, m):
        st = int(np.asarray(s.mesh_tri_start)[m])
        c = int(np.asarray(s.mesh_tri_count)[m])
        e1 = np.asarray(s.tri_e1)[st:st + c]
        e2 = np.asarray(s.tri_e2)[st:st + c]
        return float(triangle_areas(e1, e2).sum())

    for m in range(scene.num_meshes):
        assert mesh_area(s2, m) == pytest.approx(mesh_area(scene, m),
                                                 rel=1e-5)

    # children lie in the parent plane: normals parallel, area quartered
    e1 = np.asarray(scene.tri_e1)[:scene.num_triangles]
    e2 = np.asarray(scene.tri_e2)[:scene.num_triangles]
    parent_n = np.cross(e1, e2)
    st0 = int(np.asarray(scene.mesh_tri_start)[0])
    st2 = int(np.asarray(s2.mesh_tri_start)[0])
    c1 = np.asarray(s2.tri_e1)[st2:st2 + 4]
    c2 = np.asarray(s2.tri_e2)[st2:st2 + 4]
    child_n = np.cross(c1, c2)
    for k in range(4):
        cosang = (child_n[k] @ parent_n[st0]) / (
            np.linalg.norm(child_n[k]) * np.linalg.norm(parent_n[st0]))
        assert cosang == pytest.approx(1.0, abs=1e-5)
        assert np.linalg.norm(child_n[k]) == pytest.approx(
            np.linalg.norm(parent_n[st0]) / 4.0, rel=1e-5)
