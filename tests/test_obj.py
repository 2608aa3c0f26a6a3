"""Tests for the OBJ/MTL loader against the bundled reference assets."""

import numpy as np
import pytest

from orion_tpu.io.obj import load_obj, parse_mtl


def test_view_test_obj(assets_dir):
    scene = load_obj(assets_dir / "view_test.obj")
    # two materials -> two meshes (red checkerboard half, blue half)
    assert len(scene.meshes) == 2
    names = [m.material.name for m in scene.meshes]
    assert names == ["red", "blue"]
    for m in scene.meshes:
        assert m.num_triangles == 2
        # all vn are +z
        np.testing.assert_allclose(m.normals, np.broadcast_to([0, 0, 1.0], m.normals.shape))
    red = scene.meshes[0].material
    np.testing.assert_allclose(red.diffuse, [0.9, 0.0, 0.0])
    np.testing.assert_allclose(red.specular, [0.2, 0.2, 0.2])
    assert red.opacity == pytest.approx(0.5)
    assert red.shininess == pytest.approx(10.0)
    assert not red.is_emissive


def test_cornell_obj(assets_dir):
    scene = load_obj(assets_dir / "cornell-box" / "cornell-box.obj")
    # 8 per-material meshes: 5 walls, shortBox, tallBox, light
    assert len(scene.meshes) == 8
    total_tris = sum(m.num_triangles for m in scene.meshes)
    assert total_tris == 36  # 18 quads fan-triangulated (5 walls + 6+6 box faces + light)
    by_mat = {m.material.name: m for m in scene.meshes}
    assert by_mat["floor"].num_triangles == 2
    assert by_mat["shortBox"].num_triangles == 12  # box incl. bottom face
    light = by_mat["light"]
    assert light.material.is_emissive
    np.testing.assert_allclose(light.material.emissive, [4.0, 3.5, 3.0])
    # no vn in file -> generated flat normals, unit length
    lens = np.linalg.norm(by_mat["floor"].normals, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-6)
    # floor normal points up (+y): CCW winding viewed from above
    np.testing.assert_allclose(by_mat["floor"].normals[0, 0], [0, 1, 0], atol=1e-2)


def test_negative_indices(tmp_path):
    p = tmp_path / "neg.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    scene = load_obj(p)
    assert len(scene.meshes) == 1
    np.testing.assert_allclose(
        scene.meshes[0].positions[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    )


def test_quad_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    scene = load_obj(p)
    assert scene.meshes[0].num_triangles == 2
    # fan: (0,1,2), (0,2,3)
    np.testing.assert_allclose(scene.meshes[0].positions[1, 1], [1, 1, 0])


def test_uv_flip(tmp_path):
    p = tmp_path / "uv.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.25 0.75\nvt 1 1\nvt 0 0\n"
        "f 1/1 2/2 3/3\n"
    )
    scene = load_obj(p)
    uvs = scene.meshes[0].uvs[0]
    np.testing.assert_allclose(uvs[0], [0.25, 0.25])  # v flipped (model.cpp:28)
    np.testing.assert_allclose(uvs[1], [1.0, 0.0])


def test_nanosuit_mtl(assets_dir):
    mats = parse_mtl(assets_dir / "nanosuit2" / "nanosuit2.mtl")
    assert "Helmet" in mats
    helmet = mats["Helmet"]
    assert helmet.map_diffuse == "helmet_dif.png"
    assert helmet.map_specular == "helmet_showroom_spec.png"
    assert helmet.map_bump == "helmet_showroom_ddn.png"
    assert helmet.shininess == pytest.approx(96.0)


def test_nanosuit_obj_loads(assets_dir):
    scene = load_obj(assets_dir / "nanosuit2" / "nanosuit2.obj")
    total = sum(m.num_triangles for m in scene.meshes)
    assert total == 19058  # one triangle per 'f' line (all triangulated already)
    assert len(scene.meshes) >= 5
