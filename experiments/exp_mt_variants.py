"""Microbenchmark: Möller-Trumbore vs Woop unit-triangle transform.

The leaf/sweep inner loop of every megakernel is a [W, RB] batch of
ray-triangle tests (W = 128 triangles against RB = 256 rays). The
current formulation is branchless Möller-Trumbore from (v0, e1, e2)
rows — ~45 VPU plane-ops per leaf (the reference's own inner loop,
/root/reference/orion/avx/geometry.hpp:86-142, is the same algebra 8
lanes at a time).

Woop's unit-triangle transform (precompute per triangle the affine map
A^-1 with A = [e1 e2 n], n = e1 x e2) turns the per-leaf work into
  local_o = M @ o + c,  local_d = M @ d
  t = -o'_w / d'_w,  u = o'_u + t d'_u,  v = o'_v + t d'_v
which is EITHER ~33 VPU ops (fma chains, variant B) OR one small MXU
matmul [4, 3W]^T @ [4, 2RB] -> [3W, 2RB] plus a ~17-op epilogue
(variant C) — the first time the MXU can carry the intersection math
itself rather than sitting idle.

Run on TPU: `python experiments/exp_mt_variants.py`. Prints JSON lines
with per-variant wall time over the same leaf-visit sequence, plus max
|t - t_f64| correctness vs a float64 host oracle.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W = 128          # leaf width (triangles per bundle)
RB = 256         # ray block
NLEAVES = 64     # resident bundles cycled through
REPS = 400       # leaf visits per timed launch = NLEAVES * REPS
MT_EPS = 1e-6
BIG = 3.0e38


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    B = NLEAVES * W
    v0 = rng.uniform(-1, 1, (B, 3))
    e1 = rng.uniform(-1, 1, (B, 3))
    e2 = rng.uniform(-1, 1, (B, 3))
    o = rng.uniform(-2, 2, (RB, 3))
    d = rng.normal(size=(RB, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return v0, e1, e2, o, d


def woop_table(v0, e1, e2):
    """[13, B] f64->f32 rows: M (9, u/v/w rows of [e1 e2 n]^-1), c = -M v0
    (3), |n|^2 (1). Degenerate tris get the always-miss transform."""
    B = v0.shape[0]
    n = np.cross(e1, e2)
    n2 = np.einsum("ij,ij->i", n, n)
    A = np.stack([e1, e2, n], axis=2)            # [B, 3, 3] columns
    ok = n2 > 1e-30
    M = np.zeros((B, 3, 3))
    M[ok] = np.linalg.inv(A[ok])
    c = -np.einsum("bij,bj->bi", M, v0)
    c[~ok] = (0.0, 0.0, 1.0)                      # o'_w = 1, d'_w = 0
    tab = np.zeros((13, B), np.float32)
    tab[0:9] = M.reshape(B, 9).T
    tab[9:12] = c.T
    tab[12] = n2
    return tab


def mt_f64(v0, e1, e2, o, d):
    """Host float64 oracle: min-t per ray over all B triangles."""
    p = np.cross(d[:, None, :], e2[None, :, :])            # [RB, B, 3]
    det = np.einsum("bj,rbj->rb", e1, p)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        tvec = o[:, None, :] - v0[None, :, :]
        u = np.einsum("rbj,rbj->rb", tvec, p) * inv
        q = np.cross(tvec, e1[None, :, :])
        v = np.einsum("rj,rbj->rb", d, q)
        v = np.einsum("rbj,rj->rb", q, d) * inv
        t = np.einsum("bj,rbj->rb", e2, q) * inv
    ok = ((np.abs(det) > MT_EPS) & (u >= 0) & (u <= 1) & (v >= 0)
          & (u + v <= 1) & (t >= 0))
    t = np.where(ok, t, BIG)
    return t.min(axis=1)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v0, e1, e2, o, d = make_data()
    t_ref = mt_f64(v0, e1, e2, o, d)

    # resident tables
    mt_tab = np.zeros((9, NLEAVES * W), np.float32)
    mt_tab[0:3] = v0.T
    mt_tab[3:6] = e1.T
    mt_tab[6:9] = e2.T
    wp_tab = woop_table(v0, e1, e2)
    # MXU layout: [4, 3B] — per bundle b, columns [3W b : 3W (b+1)] are
    # [u-rows (W), v-rows (W), w-rows (W)]; sublanes = (M.0, M.1, M.2, c)
    lhs = np.zeros((4, 3 * NLEAVES * W), np.float32)
    M9 = wp_tab[0:9].reshape(3, 3, -1)  # [row(u/v/w), col, B]
    c3 = wp_tab[9:12]
    for b in range(NLEAVES):
        s = slice(b * W, (b + 1) * W)
        for r in range(3):
            cs = slice(3 * W * b + r * W, 3 * W * b + (r + 1) * W)
            lhs[0:3, cs] = M9[r][:, s]
            lhs[3, cs] = c3[r, s]

    o_pl = [np.broadcast_to(o[:, i], (1, RB)).astype(np.float32)
            for i in range(3)]
    d_pl = [np.broadcast_to(d[:, i], (1, RB)).astype(np.float32)
            for i in range(3)]

    def leaf_mt(tab_ref, off, op, dp):
        blk = tab_ref[:, pl.ds(off, W)]
        bt = blk.T
        tv0 = (bt[:, 0:1], bt[:, 1:2], bt[:, 2:3])
        te1 = (bt[:, 3:4], bt[:, 4:5], bt[:, 5:6])
        te2 = (bt[:, 6:7], bt[:, 7:8], bt[:, 8:9])
        px = dp[1] * te2[2] - dp[2] * te2[1]
        py = dp[2] * te2[0] - dp[0] * te2[2]
        pz = dp[0] * te2[1] - dp[1] * te2[0]
        det = te1[0] * px + te1[1] * py + te1[2] * pz
        inv_det = 1.0 / det
        tx = op[0] - tv0[0]
        ty = op[1] - tv0[1]
        tz = op[2] - tv0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * te1[2] - tz * te1[1]
        qy = tz * te1[0] - tx * te1[2]
        qz = tx * te1[1] - ty * te1[0]
        v = (dp[0] * qx + dp[1] * qy + dp[2] * qz) * inv_det
        t = (te2[0] * qx + te2[1] * qy + te2[2] * qz) * inv_det
        ok = (jnp.abs(det) > MT_EPS) & (u >= 0.0) & (u <= 1.0) \
            & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
        return jnp.where(ok, t, BIG)

    def leaf_woop_vpu(tab_ref, off, op, dp):
        blk = tab_ref[:, pl.ds(off, W)]
        bt = blk.T                                   # [W, 13]
        r = [bt[:, i:i + 1] for i in range(13)]
        ou = r[0] * op[0] + r[1] * op[1] + r[2] * op[2] + r[9]
        ov = r[3] * op[0] + r[4] * op[1] + r[5] * op[2] + r[10]
        ow = r[6] * op[0] + r[7] * op[1] + r[8] * op[2] + r[11]
        du = r[0] * dp[0] + r[1] * dp[1] + r[2] * dp[2]
        dv = r[3] * dp[0] + r[4] * dp[1] + r[5] * dp[2]
        dw = r[6] * dp[0] + r[7] * dp[1] + r[8] * dp[2]
        t = -ow / dw
        u = ou + t * du
        v = ov + t * dv
        ok = (jnp.abs(dw) * r[12] > MT_EPS) & (u >= 0.0) & (u <= 1.0) \
            & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
        return jnp.where(ok, t, BIG)

    def make_leaf_woop_mxu(precision):
        def leaf(lhs_ref, n2_ref, off3, off, rhs):
            lblk = lhs_ref[:, pl.ds(off3, 3 * W)]        # [4, 3W]
            out = jax.lax.dot_general(
                lblk, rhs, (((0,), (0,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32)      # [3W, 2RB]
            ou = out[0:W, 0:RB]
            ov = out[W:2 * W, 0:RB]
            ow = out[2 * W:3 * W, 0:RB]
            du = out[0:W, RB:2 * RB]
            dv = out[W:2 * W, RB:2 * RB]
            dw = out[2 * W:3 * W, RB:2 * RB]
            n2 = n2_ref[:, pl.ds(off, W)].T              # [W, 1]
            t = -ow / dw
            u = ou + t * du
            v = ov + t * dv
            ok = (jnp.abs(dw) * n2 > MT_EPS) & (u >= 0.0) & (u <= 1.0) \
                & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
            return jnp.where(ok, t, BIG)
        return leaf

    interpret = jax.default_backend() != "tpu"

    def build_mt(tab, leaf_fn, rows):
        def kernel(tab_ref, o0, o1, o2, d0, d1, d2, out_ref):
            op = (o0[:], o1[:], o2[:])
            dp = (d0[:], d1[:], d2[:])

            def body(i, t_b):
                off = pl.multiple_of((i % NLEAVES) * W, W)
                t = leaf_fn(tab_ref, off, op, dp)
                return jnp.minimum(t_b, jnp.min(t, axis=0, keepdims=True))

            out_ref[:] = jax.lax.fori_loop(
                0, NLEAVES * REPS, body, jnp.full((1, RB), BIG))

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, RB), jnp.float32),
            interpret=interpret,
        )

    def build_mxu(precision):
        leaf = make_leaf_woop_mxu(precision)

        def kernel(lhs_ref, n2_ref, o0, o1, o2, d0, d1, d2, out_ref):
            one = jnp.ones((1, RB), jnp.float32)
            zero = jnp.zeros((1, RB), jnp.float32)
            rhs = jnp.concatenate([
                jnp.concatenate([o0[:], o1[:], o2[:], one], axis=0),
                jnp.concatenate([d0[:], d1[:], d2[:], zero], axis=0),
            ], axis=1)                                   # [4, 2RB]

            def body(i, t_b):
                off = pl.multiple_of((i % NLEAVES) * W, W)
                off3 = pl.multiple_of((i % NLEAVES) * 3 * W, 3 * W)
                t = leaf(lhs_ref, n2_ref, off3, off, rhs)
                return jnp.minimum(t_b, jnp.min(t, axis=0, keepdims=True))

            out_ref[:] = jax.lax.fori_loop(
                0, NLEAVES * REPS, body, jnp.full((1, RB), BIG))

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, RB), jnp.float32),
            interpret=interpret,
        )

    n2_row = wp_tab[12:13]
    variants = {
        "mt_vpu": (build_mt(mt_tab, leaf_mt, 9),
                   (jnp.asarray(mt_tab),)),
        "woop_vpu": (build_mt(wp_tab, leaf_woop_vpu, 13),
                     (jnp.asarray(wp_tab),)),
    }
    for name, prec in (("woop_mxu_default", jax.lax.Precision.DEFAULT),
                       ("woop_mxu_highest", jax.lax.Precision.HIGHEST)):
        variants[name] = (build_mxu(prec),
                          (jnp.asarray(lhs), jnp.asarray(n2_row)))

    args_rays = tuple(jnp.asarray(x) for x in o_pl + d_pl)
    results = {}
    for name, (call, tabs) in variants.items():
        fn = jax.jit(lambda *a, _c=call: _c(*a))
        t_min = np.asarray(fn(*tabs, *args_rays))[0]
        err = float(np.max(np.abs(t_min - np.minimum(t_ref, BIG))
                           / np.maximum(np.abs(t_ref), 1.0)))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = fn(*tabs, *args_rays)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        tests = NLEAVES * REPS * W * RB
        results[name] = dt
        print(json.dumps({"variant": name, "seconds": round(dt, 5),
                          "gtests_per_s": round(tests / dt / 1e9, 2),
                          "rel_t_err_vs_f64": err}), flush=True)

    base = results["mt_vpu"]
    for name, dt in results.items():
        if name != "mt_vpu":
            print(json.dumps({"speedup_vs_mt": name,
                              "x": round(base / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
