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
