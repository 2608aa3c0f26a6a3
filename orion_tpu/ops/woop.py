"""Woop unit-triangle transform: the shared intersection formulation.

Every intersection sweep in the framework (jnp brute oracle, Pallas
brute/BVH/megakernel leaves) tests batches of [W, RB] ray-triangle
pairs. Round 1/2 used branchless Möller-Trumbore from (v0, e1, e2) —
the reference's own inner loop, /root/reference/orion/avx/geometry.hpp:
86-142, eight AVX lanes at a time. Measured on this chip
(experiments/exp_mt_variants.py), MT runs the leaf plane at 8.0 G
tests/s; the Woop formulation below runs the SAME test at 28.2 G
tests/s (3.5x) at equal f32 accuracy (~5e-7 rel-t error vs a float64
oracle), because the per-triangle setup work (two cross products and
the determinant) moves into a once-per-scene precompute and the
per-ray-pair work collapses to six FMA chains plus one divide.

Precompute per triangle: with A = [e1 | e2 | n] (columns), n = e1 x e2,
the inverse has the closed form
    A^-1 = [ cross(e2, n) ; cross(n, e1) ; n ] / (n . n)
(rows), so a point p's barycentric/height coordinates are
M (p - v0) = M p + c with c = -M v0. A ray (o, d) hits the triangle's
plane at t = -o'_w / d'_w where o' = M o + c, d' = M d, and the
barycentrics are u = o'_u + t d'_u, v = o'_v + t d'_v.

Semantics parity with the MT sweep it replaces (same predicate, not
just equivalent): det_MT = -(d . n) and d'_w = (d . n)/|n|^2, so
|d'_w| * |n|^2 == |det_MT| exactly — the eps test, two-sidedness,
u/v window, and t >= 0 carry over unchanged. Degenerate triangles
(|n|^2 <= WOOP_DEGEN, incl. padding rows with e1 = e2 = 0) get the
always-miss transform (M = 0, c = (0, 0, 1), n2 = 0): o'_w = 1,
d'_w = 0 => the eps test rejects every ray.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# the reference's determinant epsilon (geometry.hpp:84). Defined here
# rather than imported: ops.intersect imports this module, and its own
# MT_EPS must stay equal (asserted by tests/test_woop.py).
MT_EPS = 1e-6

WOOP_ROWS = 13     # 9 (M row-major: u,v,w rows x xyz) + 3 (c) + 1 (|n|^2)
# |n| <= 1e-6 is rejected by the MT eps test for any unit-length
# direction; below this the transform itself is emitted as always-miss
WOOP_DEGEN = 1e-12
_BIG = np.float32(3.0e38)


def woop_rows(v0, e1, e2, valid=None, xp=jnp):
    """[T, 13] transform rows from [T, 3] triangle data.

    `xp=jnp` is traceable (used under jit when geometry is a traced
    array); pass `xp=np` for host packing — NumPy promotes to float64
    through the cross products and division, recovering the extra
    precision of a float64 precompute for free. Rows where `valid` is
    False get the always-miss transform (replaces mt_test's
    `& valid[None, :]` term).
    """
    if xp is np:
        v0 = np.asarray(v0, np.float64)
        e1 = np.asarray(e1, np.float64)
        e2 = np.asarray(e2, np.float64)
    n = xp.cross(e1, e2)
    n2 = xp.sum(n * n, axis=1, keepdims=True)              # [T, 1]
    ok = n2 > WOOP_DEGEN
    if valid is not None:
        ok = ok & valid[:, None]
    safe = xp.where(ok, n2, 1.0)
    mu = xp.cross(e2, n) / safe
    mv = xp.cross(n, e1) / safe
    mw = n / safe
    m = xp.where(ok, xp.concatenate([mu, mv, mw], axis=1), 0.0)  # [T, 9]
    c = -xp.stack([xp.sum(mu * v0, axis=1), xp.sum(mv * v0, axis=1),
                   xp.sum(mw * v0, axis=1)], axis=1)       # [T, 3]
    c = xp.where(ok, c, xp.asarray([0.0, 0.0, 1.0]))
    n2 = xp.where(ok, n2, 0.0)
    out = xp.concatenate([m, c, n2], axis=1)               # [T, 13]
    return out.astype(np.float32) if xp is np else out.astype(jnp.float32)


def woop_tuv(o, d, w):
    """Masked (t, u, v) planes from broadcast components.

    o, d: 3-tuples of ray components; w: 13-tuple of transform
    components (the columns of woop_rows, in order). Orientation-
    agnostic like mt_plane: [W, 1] triangles vs [1, RB] rays gives
    [W, RB] planes, or the transpose. Misses carry t = _BIG, u = v = 0
    (degenerate rows would otherwise poison winner select-reduces with
    0 * inf = NaN).
    """
    ou = w[0] * o[0] + w[1] * o[1] + w[2] * o[2] + w[9]
    ov = w[3] * o[0] + w[4] * o[1] + w[5] * o[2] + w[10]
    ow = w[6] * o[0] + w[7] * o[1] + w[8] * o[2] + w[11]
    du = w[0] * d[0] + w[1] * d[1] + w[2] * d[2]
    dv = w[3] * d[0] + w[4] * d[1] + w[5] * d[2]
    dw = w[6] * d[0] + w[7] * d[1] + w[8] * d[2]
    t = -ow / dw
    u = ou + t * du
    v = ov + t * dv
    # |d'_w| * |n|^2 == |det_MT|: bitwise-identical eps semantics
    ok = (jnp.abs(dw) * w[12] > MT_EPS) & (u >= 0.0) & (u <= 1.0) \
        & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    return (jnp.where(ok, t, _BIG), jnp.where(ok, u, 0.0),
            jnp.where(ok, v, 0.0))


def woop_t(o, d, w):
    """Masked t plane only (any-hit / nearest-t sweeps)."""
    return woop_tuv(o, d, w)[0]


def woop_t2(o, d0, d1, w):
    """Masked t planes for TWO rays sharing one origin (the fused
    dual-sample NEE shadow walk): the origin transform (ou, ov, ow —
    ~half the per-leaf ops) is computed once and shared; per-ray work
    is the direction transform + the hit mask. Bit-identical to two
    woop_t calls (same expressions, same order)."""
    ou = w[0] * o[0] + w[1] * o[1] + w[2] * o[2] + w[9]
    ov = w[3] * o[0] + w[4] * o[1] + w[5] * o[2] + w[10]
    ow = w[6] * o[0] + w[7] * o[1] + w[8] * o[2] + w[11]

    def one(d):
        du = w[0] * d[0] + w[1] * d[1] + w[2] * d[2]
        dv = w[3] * d[0] + w[4] * d[1] + w[5] * d[2]
        dw = w[6] * d[0] + w[7] * d[1] + w[8] * d[2]
        t = -ow / dw
        u = ou + t * du
        v = ov + t * dv
        ok = (jnp.abs(dw) * w[12] > MT_EPS) & (u >= 0.0) & (u <= 1.0) \
            & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
        return jnp.where(ok, t, _BIG)

    return one(d0), one(d1)
