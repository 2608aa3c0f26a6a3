"""Primitive (triangle) sharding — the TP analogue (SURVEY.md §2.4).

Runs on the 8-virtual-device CPU mesh (conftest). The merged Hit must be
bit-identical to single-device brute force (global ids, argmin
tie-break); Whitted renders draw no per-ray randoms, so the TP render
must match the single-device image to float tolerance, including its
gradients.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from orion_tpu.engine import prepare
from orion_tpu.ops.intersect import intersect_brute
from orion_tpu.parallel.primitive_sharding import (make_mesh_2d,
                                                   make_tp_intersect,
                                                   render_tp)
from orion_tpu.render import render

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def ps():
    return prepare(f"{ASSETS}/view_test.rtc", xres=64, yres=64,
                   force_backend="brute-jnp")


def test_tp_intersect_matches_brute(ps):
    mesh = make_mesh_2d(1, 8)
    fn = make_tp_intersect(8)

    key = jax.random.key(7)
    k1, k2 = jax.random.split(key)
    orig = jax.random.uniform(k1, (256, 3), minval=-3.0, maxval=3.0)
    dirs = jax.random.normal(k2, (256, 3))

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P(), P()),
             out_specs=P(), check_vma=False)
    def run(scene, o, d):
        h = fn(scene, o, d)
        return h.t, h.tri_id

    t, tri = run(ps.scene, orig, dirs)
    ref = intersect_brute(ps.scene, orig, dirs)
    assert jnp.array_equal(tri, ref.tri_id)
    hit = ref.tri_id >= 0
    assert jnp.allclose(jnp.where(hit, t, 0.0),
                        jnp.where(hit, ref.t, 0.0), rtol=1e-6)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_tp_whitted_matches_single_device(ps, shape):
    mesh = make_mesh_2d(*shape)
    key = jax.random.key(3)
    img_tp = render_tp(ps.scene, ps.camera, key, mesh=mesh, samples=2,
                       max_depth=2, light_samples=1, mode="whitted")

    # single-device equivalent: same jitter keys, same per-tile trace key
    # derivation (fold_in(k_trace, tile)); with ONE ray tile that is just
    # fold_in(k_trace, 0) — reproduce it by calling render_tp on a
    # (1, 8) mesh, which the first parametrization pins against below
    img_ref = render_tp(ps.scene, ps.camera, key, mesh=make_mesh_2d(1, 8),
                        samples=2, max_depth=2, light_samples=1,
                        mode="whitted")
    # Whitted traces draw no per-ray randoms, and ray-tile keys only feed
    # (unused) path-mode draws — every mesh shape must agree exactly
    assert jnp.allclose(img_tp, img_ref, atol=1e-5)
    assert bool(jnp.isfinite(img_tp).all())
    # and the image must be non-trivial
    assert float(jnp.max(img_tp)) > 0.01


def test_tp_whitted_matches_plain_render(ps):
    """(1, 8) TP whitted == unsharded render, modulo the per-tile key fold
    (whitted consumes no per-ray randoms, so images match exactly)."""
    key = jax.random.key(11)
    img_tp = render_tp(ps.scene, ps.camera, key, mesh=make_mesh_2d(1, 8),
                       samples=1, max_depth=2, light_samples=1,
                       mode="whitted")
    img = render(ps.scene, ps.camera, key, samples=1, max_depth=2,
                 light_samples=1, mode="whitted", intersect=intersect_brute)
    assert jnp.allclose(img_tp, img, atol=1e-5)


def test_tp_gradients_match_single_device(ps):
    mesh = make_mesh_2d(2, 4)
    key = jax.random.key(5)
    target = jnp.zeros((64, 64, 3), jnp.float32)

    def loss_tp(diff):
        import dataclasses
        s = dataclasses.replace(ps.scene, mat_diffuse=diff)
        img = render_tp(s, ps.camera, key, mesh=mesh, samples=1,
                        max_depth=1, light_samples=1, mode="whitted")
        return jnp.mean((img - target) ** 2)

    def loss_ref(diff):
        import dataclasses
        s = dataclasses.replace(ps.scene, mat_diffuse=diff)
        img = render(s, ps.camera, key, samples=1, max_depth=1,
                     light_samples=1, mode="whitted",
                     intersect=intersect_brute)
        return jnp.mean((img - target) ** 2)

    g_tp = jax.grad(loss_tp)(ps.scene.mat_diffuse)
    g_ref = jax.grad(loss_ref)(ps.scene.mat_diffuse)
    assert bool(jnp.isfinite(g_tp).all())
    assert jnp.allclose(g_tp, g_ref, rtol=1e-4, atol=1e-7)
