"""Woop unit-triangle transform vs the Möller-Trumbore oracle.

The Woop formulation (ops/woop.py) is the shared inner loop of every
intersection backend; MT (ops/intersect.py mt_test) is kept as the
independent cross-check. Same predicate semantics are asserted here:
|d'_w| * |n|^2 == |det_MT| makes the eps test identical, not merely
equivalent.
"""

import numpy as np
import jax.numpy as jnp

from orion_tpu.ops.intersect import MT_EPS as MT_EPS_I
from orion_tpu.ops.intersect import F_INF, mt_test
from orion_tpu.ops.woop import (MT_EPS, _BIG, woop_rows, woop_tuv)


def _rand(seed, T=64, N=128):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return v0, e1, e2, o, d


def _woop_planes(o, d, w13):
    oc = tuple(jnp.asarray(o[:, i, None]) for i in range(3))
    dc = tuple(jnp.asarray(d[:, i, None]) for i in range(3))
    wc = tuple(w13[None, :, i] for i in range(13))
    return woop_tuv(oc, dc, wc)


def test_eps_constants_agree():
    assert MT_EPS == MT_EPS_I


def test_matches_mt_on_random():
    v0, e1, e2, o, d = _rand(0)
    valid = np.ones(v0.shape[0], bool)
    t_mt = np.asarray(mt_test(jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(v0), jnp.asarray(e1),
                              jnp.asarray(e2), jnp.asarray(valid)))
    for xp in (np, jnp):
        w13 = jnp.asarray(woop_rows(v0, e1, e2, xp=xp))
        t_w, u_w, v_w = (np.asarray(x) for x in _woop_planes(o, d, w13))
        hit_mt = np.isfinite(t_mt)
        hit_w = t_w < float(_BIG)
        np.testing.assert_array_equal(hit_w, hit_mt)
        np.testing.assert_allclose(t_w[hit_w], t_mt[hit_mt],
                                   rtol=2e-5, atol=1e-6)
        # u/v stay inside the window on hits
        assert (u_w[hit_w] >= 0).all() and (v_w[hit_w] >= 0).all()
        assert (u_w[hit_w] + v_w[hit_w] <= 1.0 + 1e-6).all()


def test_uv_match_mt_uv():
    # recompute MT u/v directly for hit pairs and compare
    v0, e1, e2, o, d = _rand(1, T=16, N=64)
    w13 = jnp.asarray(woop_rows(v0, e1, e2, xp=np))
    t_w, u_w, v_w = (np.asarray(x) for x in _woop_planes(o, d, w13))
    hits = np.argwhere(t_w < float(_BIG))
    assert hits.size > 0
    for (i, j) in hits[:50]:
        p = np.cross(d[i], e2[j])
        det = float(np.dot(e1[j], p))
        tv = o[i] - v0[j]
        u = float(np.dot(tv, p)) / det
        v = float(np.dot(d[i], np.cross(tv, e1[j]))) / det
        assert abs(u - u_w[i, j]) < 1e-4
        assert abs(v - v_w[i, j]) < 1e-4


def test_degenerate_triangle_always_misses():
    v0 = np.zeros((1, 3), np.float32)
    e1 = np.array([[1.0, 0, 0]], np.float32)
    e2 = np.array([[2.0, 0, 0]], np.float32)   # colinear: n = 0
    for xp in (np, jnp):
        w13 = jnp.asarray(woop_rows(v0, e1, e2, xp=xp))
        o = np.array([[0.2, 0.1, 1.0]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        t, u, v = _woop_planes(o, d, w13)
        assert float(t[0, 0]) == float(_BIG)
        assert not np.isnan(np.asarray(u)).any()


def test_invalid_rows_always_miss():
    v0, e1, e2, o, d = _rand(2, T=8, N=32)
    valid = np.zeros(8, bool)
    valid[0] = True
    w13 = jnp.asarray(woop_rows(v0, e1, e2, jnp.asarray(valid)))
    t, _, _ = _woop_planes(o, d, w13)
    t = np.asarray(t)
    assert (t[:, 1:] == float(_BIG)).all()


def test_intersect_brute_still_matches_mt_oracle():
    # the converted brute sweep against a full MT sweep + argmin
    from orion_tpu.ops.intersect import intersect_brute
    from tests.test_intersect import scene_from_triangles

    rng = np.random.default_rng(3)
    tris = rng.normal(size=(21, 3, 3)).astype(np.float32)
    scene = scene_from_triangles(tris)
    o = jnp.asarray(rng.normal(size=(333, 3)).astype(np.float32) * 2)
    d = jnp.asarray(rng.normal(size=(333, 3)).astype(np.float32))
    h = intersect_brute(scene, o, d)
    t_all = np.asarray(mt_test(o, d, scene.tri_v0, scene.tri_e1,
                               scene.tri_e2, scene.tri_valid))
    best = t_all.argmin(axis=1)
    t_ref = t_all[np.arange(t_all.shape[0]), best]
    m = np.isfinite(t_ref)
    np.testing.assert_array_equal(np.asarray(h.mask), m)
    np.testing.assert_array_equal(np.asarray(h.tri_id)[m], best[m])
    np.testing.assert_allclose(np.asarray(h.t)[m], t_ref[m],
                               rtol=2e-5, atol=1e-6)
