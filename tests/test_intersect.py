"""Möller-Trumbore intersection tests: unit cases + NumPy scalar oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from orion_tpu.ops.intersect import Hit, hit_attributes, intersect_brute, mt_test
from orion_tpu.scene import Scene, build_scene
from orion_tpu.io.obj import ObjScene, ObjMesh, MTLMaterial


def scene_from_triangles(tris: np.ndarray, pad_to: int = 128) -> Scene:
    """Build a minimal single-mesh Scene from [F,3,3] triangle vertices."""
    F = tris.shape[0]
    normals = np.zeros((F, 3, 3), np.float32)
    for i in range(F):
        n = np.cross(tris[i, 1] - tris[i, 0], tris[i, 2] - tris[i, 0])
        ln = np.linalg.norm(n)
        normals[i, :, :] = n / ln if ln > 0 else n
    mesh = ObjMesh(name="m", material=MTLMaterial(name="m",
                                                  diffuse=np.array([0.5, 0.5, 0.5], np.float32)),
                   positions=tris.astype(np.float32), normals=normals,
                   uvs=np.zeros((F, 3, 2), np.float32))
    obj = ObjScene(meshes=[mesh], materials={}, directory=None)
    return build_scene(obj, None, pad_to=pad_to, load_textures=False)


def mt_scalar(orig, dirs, v0, v1, v2):
    """Scalar NumPy Möller-Trumbore, straight from the math (geometry.hpp:80-136)."""
    eps = 1e-6
    e1, e2 = v1 - v0, v2 - v0
    pvec = np.cross(dirs, e2)
    det = np.dot(e1, pvec)
    if -eps < det < eps:
        return None
    inv_det = 1.0 / det
    tvec = orig - v0
    u = np.dot(tvec, pvec) * inv_det
    if u < 0 or u > 1:
        return None
    qvec = np.cross(tvec, e1)
    v = np.dot(dirs, qvec) * inv_det
    if v < 0 or u + v > 1:
        return None
    t = np.dot(e2, qvec) * inv_det
    if t < 0:
        return None
    return t, u, v


UNIT_TRI = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)


def test_single_hit():
    scene = scene_from_triangles(UNIT_TRI)
    orig = jnp.array([[0.25, 0.25, 1.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect_brute(scene, orig, dirs)
    assert bool(hit.mask[0])
    assert int(hit.tri_id[0]) == 0
    assert float(hit.t[0]) == pytest.approx(1.0)
    attrs = hit_attributes(scene, orig, dirs, hit)
    assert float(attrs.u[0]) == pytest.approx(0.25)
    assert float(attrs.v[0]) == pytest.approx(0.25)
    np.testing.assert_allclose(np.asarray(attrs.point[0]), [0.25, 0.25, 0.0], atol=1e-6)


def test_miss_outside():
    scene = scene_from_triangles(UNIT_TRI)
    hit = intersect_brute(scene, jnp.array([[0.9, 0.9, 1.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    assert not bool(hit.mask[0])
    assert float(hit.t[0]) == np.inf
    assert int(hit.tri_id[0]) == -1


def test_behind_ray_misses():
    scene = scene_from_triangles(UNIT_TRI)
    hit = intersect_brute(scene, jnp.array([[0.25, 0.25, -1.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    assert not bool(hit.mask[0])


def test_two_sided():
    # hit from behind the triangle: det < 0 branch must still intersect
    scene = scene_from_triangles(UNIT_TRI)
    hit = intersect_brute(scene, jnp.array([[0.25, 0.25, -1.0]]), jnp.array([[0.0, 0.0, 1.0]]))
    assert bool(hit.mask[0])
    assert float(hit.t[0]) == pytest.approx(1.0)


def test_parallel_ray_misses():
    scene = scene_from_triangles(UNIT_TRI)
    hit = intersect_brute(scene, jnp.array([[0.25, 0.25, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    assert not bool(hit.mask[0])


def test_nearest_of_two():
    tris = np.array([
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],     # z=0
        [[0, 0, 0.5], [1, 0, 0.5], [0, 1, 0.5]],  # z=0.5 (nearer from z=1 going -z)
    ], np.float32)
    scene = scene_from_triangles(tris)
    hit = intersect_brute(scene, jnp.array([[0.2, 0.2, 1.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    assert int(hit.tri_id[0]) == 1
    assert float(hit.t[0]) == pytest.approx(0.5)


def test_unnormalized_direction_t_scaling():
    scene = scene_from_triangles(UNIT_TRI)
    hit = intersect_brute(scene, jnp.array([[0.25, 0.25, 1.0]]), jnp.array([[0.0, 0.0, -4.0]]))
    assert float(hit.t[0]) == pytest.approx(0.25)  # t in units of |dir|


def test_against_scalar_oracle_random():
    rng = np.random.default_rng(0)
    F, N = 37, 200
    tris = rng.normal(size=(F, 3, 3)).astype(np.float32)
    scene = scene_from_triangles(tris)
    orig = rng.normal(size=(N, 3)).astype(np.float32) * 2
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    hit = intersect_brute(scene, jnp.asarray(orig), jnp.asarray(dirs))
    t_jax = np.asarray(hit.t)
    id_jax = np.asarray(hit.tri_id)
    for i in range(N):
        best_t, best_id = np.inf, -1
        for f in range(F):
            r = mt_scalar(orig[i], dirs[i], tris[f, 0], tris[f, 1], tris[f, 2])
            if r is not None and r[0] < best_t:
                best_t, best_id = r[0], f
        if best_id < 0:
            assert id_jax[i] == -1, i
        else:
            assert id_jax[i] == best_id, i
            assert t_jax[i] == pytest.approx(best_t, rel=1e-4), i


def test_chunked_equals_unchunked():
    rng = np.random.default_rng(1)
    tris = rng.normal(size=(10, 3, 3)).astype(np.float32)
    scene = scene_from_triangles(tris)
    orig = jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(1000, 3)).astype(np.float32))
    h1 = intersect_brute(scene, orig, dirs, chunk=256)
    h2 = intersect_brute(scene, orig, dirs, chunk=4096)
    np.testing.assert_array_equal(np.asarray(h1.tri_id), np.asarray(h2.tri_id))
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-6)
