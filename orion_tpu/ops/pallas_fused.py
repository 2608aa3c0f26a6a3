"""Pallas TPU megakernel: the ENTIRE regenerative path tracer in VMEM.

The wavefront renderers (render.py, regen.py) express each bounce as a
chain of XLA ops over [N]-sized arrays: every step reads and writes the
whole ray state from HBM a few dozen times (state, RNG, NEE stacks,
masks), which measurement shows dominates cornell-class scenes — the
brute intersection kernel itself is only ~1/3 of the step. This kernel
fuses the full sample loop — primary-ray generation, Möller-Trumbore
sweep, emissive hit term, next-event estimation with shadow sweeps,
Russian roulette, cosine-weighted bounce, and regeneration onto the next
sample — into ONE kernel launch whose per-ray state never leaves VMEM.

Scope (the engine gates on this): path mode, brute-force intersection
(T <= FUSED_MAX_TRIS after padding; tables beyond one FUSED_CHUNK sweep
run as a fori_loop over fixed row slices), solid materials (no texture
maps), <= FUSED_MAX_EMITTERS emissive meshes of <= FUSED_MAX_EMITTER_TRIS
triangles each. This covers the Cornell-class scenes of BASELINE configs
2 and 5 plus mid-size untextured scenes (subdivide_scene stress shapes).
Everything else renders through the composable wavefront path.

Estimator parity: identical to regen.py / render.py's path mode — the
reference estimator of raytracer.cpp:105-194 with NEE per PARITY.md —
but with its own counter-based RNG stream (PCG4D hashes of
(pixel, sample, depth, site) replace threefry; images agree at the
noise level, exactly like the sort_bounces / fold_samples variants).

In-kernel RNG: PCG4D (Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020 — public domain construction) on int32 planes with
wrapping arithmetic; stateless, so every draw is a pure function of
(pixel, sample, depth, site) and the image is deterministic per seed
regardless of block scheduling. The shared sub-pixel jitter pattern
(raytracer.cpp:53-63) falls out for free: the jitter draw hashes only
(sample, seed), so every pixel of a sample shares one offset.

Reference provenance for the estimator stages is cited inline; the
design (lane-major [1, RB] state planes, [T_pad, RB] sweep planes,
winner attribute select-reduce) follows the measured layout rules of
ops/pallas_intersect.py.

Structure note: the estimator math lives in `_make_geom` /
`_make_primary` / `_make_nee` / `_make_regen_body` — builders over an
abstract column accessor `col(c)`, so the SAME code runs as (a) the
Pallas kernel body (col = ref slice), (b) the pure-jnp differentiable
replica `fused_reference_render` (col = array slice; the gradient
oracle for ops/pallas_prb.py), and (c) the path-replay backprop kernel
(ops/pallas_prb.py), which replays bounces with these builders and
accumulates parameter gradients in closed form.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from orion_tpu.scene import Scene

FUSED_CHUNK = 512             # rows per statically-shaped sweep slice
# gate: total rows (chunked fori_loop sweep). Measured routing (2026-08,
# subdiv-cornell, one chip): the chunk-culled brute sweep beats BOTH the
# BVH megakernel and the wavefront up to at least ~9k tris (0.53 vs 0.31
# vs 0.23 M rays/s at 8.7k); past the gate the CLI falls to the BVH path
# megakernel (ops/pallas_bvh_path.py). Table residency is 128 B/row —
# 2 MB at this cap.
FUSED_MAX_TRIS = 16384
FUSED_MAX_EMITTER_TRIS = 8    # per-mesh unrolled select chain
FUSED_MAX_EMITTERS = 8        # emissive meshes (NEE loops per mesh)
RAY_BLOCK = 512
BIAS = 1e-3                   # raytracer.cpp:118

_BIG = np.float32(3.0e38)
_U01 = np.float32(1.0 / 16777216.0)  # 24-bit mantissa uniform


def _pcg4d(a, b, c, d):
    """PCG4D hash: 4 int32 planes -> 4 well-mixed int32 planes.

    Wrapping int32 arithmetic == uint32 mod 2^32 bit-for-bit; shifts are
    logical. One call yields 4 independent 24-bit uniforms via _u01.
    """
    mul = jnp.int32(1664525)
    inc = jnp.int32(1013904223)
    a = a * mul + inc
    b = b * mul + inc
    c = c * mul + inc
    d = d * mul + inc
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ jax.lax.shift_right_logical(a, 16)
    b = b ^ jax.lax.shift_right_logical(b, 16)
    c = c ^ jax.lax.shift_right_logical(c, 16)
    d = d ^ jax.lax.shift_right_logical(d, 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _u01(bits):
    """int32 plane -> uniform [0, 1) from the low 24 bits."""
    return (bits & jnp.int32(0xFFFFFF)).astype(jnp.float32) * _U01


def _norm3(x, y, z, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, eps))
    return x * inv, y * inv, z * inv


# triangle-table column map ([T_pad, 32] resident rows). Geometry is the
# 13-float Woop transform (ops/woop.py; 3.5x the MT planes it replaced).
# Two former columns are DERIVED rather than stored, keeping the table at
# 32 columns: the geometric normal is the transform's w-row rescaled
# (gn = m_w * sqrt(|n|^2), since m_w = n/|n|^2 — see _gn_from_got) and
# the RR continuation probability is max(kd) recomputed on the winner.
_C_WOOP = 0
_C_N0, _C_N1, _C_N2 = 13, 16, 19
_C_KD, _C_KE = 22, 25
_C_AREA, _C_MESH = 28, 29


def _fused_t_pad(T: int) -> int:
    """Table row padding: multiples of 8 (sublane tile) while one sweep
    slice suffices; multiples of FUSED_CHUNK once the sweep is chunked
    (the fori_loop slices fixed [FUSED_CHUNK, 1] columns)."""
    T_pad = ((max(T, 8) + 7) // 8) * 8
    if T_pad > FUSED_CHUNK:
        T_pad = ((T_pad + FUSED_CHUNK - 1) // FUSED_CHUNK) * FUSED_CHUNK
    return T_pad


def pack_fused_tri_table(scene: Scene) -> np.ndarray:
    """Host-side [T_pad, 32] table: geometry + shading + emitter columns.

    Geometry columns are the Woop transform (float64 precompute on the
    host); padding rows carry the always-miss transform.
    """
    from orion_tpu.ops.woop import woop_rows

    T = int(scene.num_triangles)
    T_pad = _fused_t_pad(T)
    tab = np.zeros((T_pad, 32), np.float32)

    v0 = np.asarray(scene.tri_v0)[:T]
    e1 = np.asarray(scene.tri_e1)[:T]
    e2 = np.asarray(scene.tri_e2)[:T]
    tab[:T, _C_WOOP:_C_WOOP + 13] = woop_rows(v0, e1, e2, xp=np)
    tab[T:, _C_WOOP + 11] = 1.0   # padding: c_w = 1, d'_w = 0 => miss
    tab[:T, _C_N0:_C_N0 + 3] = np.asarray(scene.n0)[:T]
    tab[:T, _C_N1:_C_N1 + 3] = np.asarray(scene.n1)[:T]
    tab[:T, _C_N2:_C_N2 + 3] = np.asarray(scene.n2)[:T]

    mat = np.asarray(scene.tri_mat)[:T]
    kd = np.asarray(scene.mat_diffuse)[mat]
    ke = np.asarray(scene.mat_emissive)[mat]
    tab[:T, _C_KD:_C_KD + 3] = kd
    tab[:T, _C_KE:_C_KE + 3] = ke
    tab[:T, _C_AREA] = np.asarray(scene.mesh_area)[mat]
    tab[:T, _C_MESH] = mat.astype(np.float32)
    return tab


def fused_chunk_bounds(scene: Scene):
    """Per-FUSED_CHUNK AABBs of the scene's packed order: (lo, hi [n,3]).

    OBJ triangle order is mesh-grouped and therefore spatially coherent,
    so natural-order chunks bound tight regions; the kernel's chunk loop
    slab-tests each box against the live segment [0, t_best) and skips
    chunks no lane can improve in (a one-level hierarchy over the brute
    sweep — the fused path's answer to the BVH's node culling). Computed
    from raw geometry (the table itself carries Woop transforms, not
    vertices); padding rows anchor at the last real vertex so tails stay
    tight.
    """
    T = int(scene.num_triangles)
    T_pad = _fused_t_pad(T)
    v0 = np.asarray(scene.tri_v0)[:T]
    e1 = np.asarray(scene.tri_e1)[:T]
    e2 = np.asarray(scene.tri_e2)[:T]
    n = max(T_pad // FUSED_CHUNK, 1)
    pts = np.empty((T_pad, 3, 3), np.float32)
    pts[:T, 0] = v0
    pts[:T, 1] = v0 + e1
    pts[:T, 2] = v0 + e2
    if T_pad > T and T > 0:
        pts[T:] = pts[T - 1, 0]
    pts = pts.reshape(n, -1, 3)
    return (pts.min(axis=1).astype(np.float32),
            pts.max(axis=1).astype(np.float32))


def pack_fused_tri_table_jnp(scene: Scene) -> jax.Array:
    """Differentiable (jnp) table pack: gradients flow from table columns
    back to scene.mat_diffuse / scene.mat_emissive (the PRB oracle path
    and anything that wants end-to-end AD through the replica).

    Geometry columns are BAKED from concrete arrays with the same float64
    host precompute as every kernel pack — bitwise-identical transform
    rows are what keeps the jnp replica's hits/RR decisions exactly equal
    to the megakernels' (tests/test_bvh_path.py rtol 1e-6). PRB
    differentiates material tables only, so geometry needs no trace; a
    scene with traced geometry must use the wavefront path instead."""
    from orion_tpu.ops.woop import woop_rows

    T = int(scene.num_triangles)
    T_pad = _fused_t_pad(T)
    tab = jnp.zeros((T_pad, 32), jnp.float32)

    geom = woop_rows(np.asarray(scene.tri_v0)[:T],
                     np.asarray(scene.tri_e1)[:T],
                     np.asarray(scene.tri_e2)[:T], xp=np)
    tab = tab.at[:T, _C_WOOP:_C_WOOP + 13].set(jnp.asarray(geom))
    tab = tab.at[T:, _C_WOOP + 11].set(1.0)
    tab = tab.at[:T, _C_N0:_C_N0 + 3].set(scene.n0[:T])
    tab = tab.at[:T, _C_N1:_C_N1 + 3].set(scene.n1[:T])
    tab = tab.at[:T, _C_N2:_C_N2 + 3].set(scene.n2[:T])

    mat = scene.tri_mat[:T]
    kd = scene.mat_diffuse[mat]
    ke = scene.mat_emissive[mat]
    tab = tab.at[:T, _C_KD:_C_KD + 3].set(kd)
    tab = tab.at[:T, _C_KE:_C_KE + 3].set(ke)
    tab = tab.at[:T, _C_AREA].set(scene.mesh_area[mat])
    tab = tab.at[:T, _C_MESH].set(mat.astype(jnp.float32))
    return tab


def _emitter_consts(scene: Scene, index: int = 0):
    """Python constants for one emissive mesh's triangles. Trailing
    fields (corner normals, material ke) serve _make_nee's fast-shadow
    path; indices 0..5 are stable for older call sites."""
    em = int(np.asarray(scene.emissive_mesh_ids)[index])
    start = int(np.asarray(scene.mesh_tri_start)[em])
    count = int(np.asarray(scene.mesh_tri_count)[em])
    v0 = np.asarray(scene.tri_v0)[start:start + count]
    e1 = np.asarray(scene.tri_e1)[start:start + count]
    e2 = np.asarray(scene.tri_e2)[start:start + count]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    # sample weight == triArea * triCount (mesh.hpp:178-184 importance
    # bias, shade.sample_mesh_point parity)
    weight = area * count
    try:
        n0 = np.asarray(scene.n0)[start:start + count]
        n1 = np.asarray(scene.n1)[start:start + count]
        n2 = np.asarray(scene.n2)[start:start + count]
        ke = np.asarray(scene.mat_emissive)[em]
    except jax.errors.TracerArrayConversionError:
        # traced scene (an AD oracle differentiating scene fields):
        # the fast-shadow consts are unused there — legacy NEE reads
        # ke/normals from the live attribute table
        n0 = n1 = n2 = ke = None
    return em, count, v0, e1, e2, weight, n0, n1, n2, ke


def _emitters_consts(scene: Scene):
    """All emissive meshes' constants (the reference's NEE loops every
    emissive mesh, raytracer.cpp:133-159)."""
    return [_emitter_consts(scene, i) for i in range(scene.num_emissive)]


# ---------------------------------------------------------------------------
# shared estimator builders (kernel body == jnp replica == PRB replay)
# ---------------------------------------------------------------------------

# winner columns from which the geometric normal is derived:
# gn = m_w * sqrt(|n|^2) (the w-row of the Woop transform is n/|n|^2)
_GN_ATTRS = (_C_WOOP + 6, _C_WOOP + 7, _C_WOOP + 8, _C_WOOP + 12)


def _gn_from_got(got):
    """Unit geometric normal of the winner from its gathered Woop rows."""
    s = jnp.sqrt(got[_C_WOOP + 12])
    return (got[_C_WOOP + 6] * s, got[_C_WOOP + 7] * s,
            got[_C_WOOP + 8] * s)


def _mt_planes_at(colk, o, d):
    """Woop intersection planes over one table slice via accessor
    `colk(c)` ([rows, 1] column): (t_masked, u, v) [rows, RB] planes.
    (Name kept from the Möller-Trumbore generation for the PRB call
    sites; the math is ops/woop.py's.)"""
    from orion_tpu.ops.woop import woop_tuv

    w = tuple(colk(_C_WOOP + i) for i in range(13))
    return woop_tuv(o, d, w)


def _make_geom(col, T_pad, *, chunk=None, col_dyn=None, chunk_box=None,
               blk=None, blk_dyn=None):
    """Geometry sweeps over the triangle table via the accessor `col(c)`
    ([T_pad, 1] column). Returns (mt_planes, sweep); `sweep.any_hit(o, d)`
    is the occlusion-only form ([1, RB] bool).

    chunk/col_dyn: when T_pad > chunk, sweeps run as a lax.fori_loop over
    fixed [chunk, RB] row slices instead of one [T_pad, RB] plane set
    (whose VMEM cost scales with T). col_dyn(off, c) must return the
    [chunk, 1] column slice starting at row `off` (Pallas:
    tri_ref[pl.ds(off, chunk), c:c+1]; jnp replica: lax.dynamic_slice).
    In chunked mode `mt_planes` is None — full-table planes would defeat
    the point — so callers needing occlusion use sweep.any_hit.

    chunk_box(k) -> ((lox, loy, loz), (hix, hiy, hiz)) scalar accessor of
    chunk k's AABB (fused_chunk_bounds rows via scalar-prefetch refs):
    when given, each chunk is slab-tested against every lane's live
    segment [0, t_best) and the MT sweep is skipped when no lane can
    improve — value-identical, since a skipped chunk contains no
    triangle any lane could hit nearer than its current winner.

    blk() -> [T_pad, 32] / blk_dyn(off) -> [chunk, 32] whole-table block
    accessors: when given, the CHUNKED sweep gathers winner attributes by
    ONE one-hot MXU contraction per chunk (tab^T @ onehot -> [32, RB])
    instead of per-column VPU select-reduces (measured 1.37x on the
    subdiv-2k bench config; the resident sweep measured a small LOSS at
    cornell's 40 rows and keeps select-reduce — blk() is reserved). The select-reduce costs 3 plane-ops per attribute
    ([rows, RB] broadcast + where + sum) — 63 plane-ops for the bounce's
    21 columns, MORE than the MT math itself; the contraction replaces
    all of it with one [rows, 32] x [rows, RB] matmul on the otherwise
    idle MXU. BIT-EXACT: a one-hot f32 product selects the f32 row value
    exactly (Precision.HIGHEST), and accumulating zeros is exact in any
    order.
    """
    chunked = chunk is not None and T_pad > chunk
    if chunked:
        assert T_pad % chunk == 0 and col_dyn is not None
        n_chunks = T_pad // chunk
        rows = chunk
    else:
        rows = T_pad
    row_f = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)

    def _slice_sweep(colk, o, d, attr_cols, blk_arr=None):
        """One slice: (t_min, u, v, got) with winner picked in-slice."""
        t, u, v = _mt_planes_at(colk, o, d)
        t_min = jnp.min(t, axis=0, keepdims=True)
        row_min = jnp.min(jnp.where(t == t_min, row_f, jnp.int32(2**30)),
                          axis=0, keepdims=True)
        sel = row_f == row_min                         # [rows, RB]

        def pick_plane(p):
            return jnp.sum(jnp.where(sel, p, 0.0), axis=0, keepdims=True)

        if blk_arr is None:
            got = {c: pick_plane(jnp.broadcast_to(colk(c), t.shape))
                   for c in attr_cols}
        else:
            # winner gather as an MXU one-hot contraction (bit-exact)
            got_all = jax.lax.dot_general(
                blk_arr, sel.astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)    # [32, RB]
            got = {c: got_all[c:c + 1, :] for c in attr_cols}
        return t_min, pick_plane(u), pick_plane(v), got

    if not chunked:
        def mt_planes(o, d):
            return _mt_planes_at(col, o, d)

        def sweep(o, d, attr_cols, alive=None, t_init=None):
            """Nearest hit + winner attributes.

            Returns (t [1,RB], hit [1,RB] bool, u, v, {col: [1,RB]}).
            `alive` is advisory (work-skipping only) — a single-slice
            sweep has no control flow to save, so it is ignored here.
            t_init: optional scalar cap — hits at t >= t_init are
            reported as misses (NEE's segment-bounded shadow walks).

            The resident (single-slice) sweep keeps VPU select-reduce
            picks: measured on cornell (T_pad 40), the one-hot MXU
            gather costs more than it saves below ~a full chunk of rows
            (47.3 -> 44.6 M rays/s); the chunked sweep below uses it.
            """
            del alive
            cap = _BIG if t_init is None else np.float32(t_init)
            t_min, u, v, got = _slice_sweep(col, o, d, attr_cols)
            return t_min, t_min < cap, u, v, got

        def any_hit(o, d, alive=None):
            del alive
            t, _, _ = mt_planes(o, d)
            return jnp.min(t, axis=0, keepdims=True) < _BIG

        def shadow_em(o, d, alive=None, t_cap=None, em_mesh=0):
            """Lean NEE visibility: the nearest (t < cap) hit lands on
            em_mesh. EXACTLY the attribute sweep's winner semantics
            (min t, ties by row) with no attribute planes carried."""
            cap = _BIG if t_cap is None else np.float32(t_cap)
            t, _, _ = mt_planes(o, d)                 # [T_pad, RB]
            t = jnp.where(t < cap, t, _BIG)
            t_min = jnp.min(t, axis=0, keepdims=True)
            row_min = jnp.min(
                jnp.where(t == t_min, row_f, jnp.int32(2**30)),
                axis=0, keepdims=True)
            is_em = jnp.broadcast_to(
                col(_C_MESH) == np.float32(em_mesh), t.shape)
            em_win = jnp.sum(
                jnp.where(row_f == row_min, is_em.astype(jnp.float32),
                          0.0), axis=0, keepdims=True) > 0.0
            vis = (t_min < cap) & em_win
            if alive is not None:
                vis = vis & alive
            return vis

        sweep.any_hit = any_hit
        sweep.shadow_em = shadow_em
        return mt_planes, sweep

    def _box_reachable(k, o, d, t_b):
        """[1, RB] could-improve mask of chunk k's AABB vs each lane's
        live segment (slab test; flat boxes hit via >=)."""
        lo, hi = chunk_box(k)
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        tx0 = (lo[0] - o[0]) * inv[0]
        tx1 = (hi[0] - o[0]) * inv[0]
        ty0 = (lo[1] - o[1]) * inv[1]
        ty1 = (hi[1] - o[1]) * inv[1]
        tz0 = (lo[2] - o[2]) * inv[2]
        tz1 = (hi[2] - o[2]) * inv[2]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                       jnp.minimum(ty0, ty1)),
                           jnp.minimum(tz0, tz1))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                       jnp.maximum(ty0, ty1)),
                           jnp.maximum(tz0, tz1))
        return (tmax >= tmin) & (tmax > 0.0) & (tmin < t_b)

    def sweep(o, d, attr_cols, alive=None, t_init=None):
        attr_cols = tuple(attr_cols)
        cap = _BIG if t_init is None else np.float32(t_init)
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        zero = jnp.zeros(shape, jnp.float32)

        def body(k, carry):
            def do_sweep(carry):
                t_b, u_b, v_b, got_b = carry
                off = k * chunk

                def colk(c):
                    return col_dyn(off, c)

                t_min, u, v, got = _slice_sweep(
                    colk, o, d, attr_cols,
                    blk_arr=None if blk_dyn is None else blk_dyn(off))
                better = t_min < t_b
                new_got = tuple(jnp.where(better, got[c], g)
                                for c, g in zip(attr_cols, got_b))
                return (jnp.where(better, t_min, t_b),
                        jnp.where(better, u, u_b),
                        jnp.where(better, v, v_b), new_got)

            if chunk_box is None:
                return do_sweep(carry)
            # dead lanes never vote for a chunk (live segment is empty):
            # value-identical for live lanes — a skipped chunk contains
            # nothing that could improve any of them
            t_gate = (carry[0] if alive is None
                      else jnp.where(alive, carry[0], -_BIG))
            return jax.lax.cond(
                jnp.any(_box_reachable(k, o, d, t_gate)),
                do_sweep, lambda c: c, carry)

        init = (jnp.full(shape, cap), zero, zero,
                tuple(zero for _ in attr_cols))
        t_b, u_b, v_b, got_b = jax.lax.fori_loop(0, n_chunks, body, init)
        return (t_b, t_b < cap, u_b, v_b,
                dict(zip(attr_cols, got_b)))

    def any_hit(o, d, alive=None):
        # occlusion rides the fori carry as f32 0/1 (Mosaic rejects i1
        # vectors as loop/cond carries)
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)

        def body(k, occ):
            def do_sweep(occ):
                off = k * chunk
                t, _, _ = _mt_planes_at(lambda c: col_dyn(off, c), o, d)
                hit = jnp.min(t, axis=0, keepdims=True) < _BIG
                return jnp.maximum(occ, hit.astype(jnp.float32))

            if chunk_box is None:
                return do_sweep(occ)
            # skip iff every lane is already occluded, dead, or misses
            big = jnp.where(occ > 0.0, -_BIG, _BIG)  # occluded lanes
            if alive is not None:
                big = jnp.where(alive, big, -_BIG)
            return jax.lax.cond(jnp.any(_box_reachable(k, o, d, big)),
                                do_sweep, lambda c: c, occ)

        occ = jax.lax.fori_loop(0, n_chunks, body,
                                jnp.zeros(shape, jnp.float32))
        return occ > 0.0

    sweep.any_hit = any_hit
    return None, sweep


def _interp_n(u, v, got, c0, c1, c2):
    w = 1.0 - u - v
    out = []
    for k in range(3):
        out.append(w * got[c0 + k] + u * got[c1 + k]
                   + v * got[c2 + k])
    return _norm3(*out)


def _make_primary(cam, seed, pix, W, H):
    """Camera-ray generator for per-lane sample index `samp` (shared
    jitter: the draw hashes only (sample, seed), raytracer.cpp:53-63).
    `cam(i)` is a scalar accessor over the 12-float camera vector."""
    pix_f = pix.astype(jnp.float32)
    inv_w = np.float32(1.0 / W)
    inv_h = np.float32(1.0 / H)
    px_sz = np.float32(2.0 / W)
    py_sz = np.float32(2.0 / H)

    def primary(samp):
        jb0, jb1, _, _ = _pcg4d(samp, jnp.broadcast_to(seed, samp.shape),
                                jnp.full_like(samp, 0x4A17),
                                jnp.full_like(samp, 0x7E57))
        jx = _u01(jb0) * px_sz
        jy = _u01(jb1) * py_sz
        # row index: floor((pix + 0.5)/W) is exact under f32 rounding
        # for any W (pix*(1/W) alone mis-rows multiples of W when 1/W
        # is inexact, e.g. W=1920)
        i = jnp.floor((pix_f + 0.5) * inv_w)          # image row
        j = pix_f - i * np.float32(W)                 # image column
        x = 2.0 * (j * inv_w) - 1.0 + jx
        y = -(2.0 * (i * inv_h) - 1.0 + jy)
        dx = cam(3) + x * cam(6) + y * cam(9)
        dy = cam(4) + x * cam(7) + y * cam(10)
        dz = cam(5) + x * cam(8) + y * cam(11)
        ox = jnp.broadcast_to(cam(0), x.shape)
        oy = jnp.broadcast_to(cam(1), x.shape)
        oz = jnp.broadcast_to(cam(2), x.shape)
        return ox, oy, oz, dx, dy, dz

    return primary


NEE_T_CAP = np.float32(1.05)   # shadow-segment cap (see sweep call below)


def _make_nee(sweep, emitter, seed, pix, light_samples,
              fast_shadow=False, vis_planes=None, vis_only=False):
    """NEE against the emissive meshes (raytracer.cpp:133-159): one shadow
    sweep per (mesh, light sample); contribution iff the NEAREST shadow
    hit lands on the sampled mesh.

    `emitter` is one _emitter_consts tuple or a list of them (the
    reference loops every emissive mesh, sampling L points from each).

    Returns nee(samp, depth, h, gn, sn, hit) -> (A3, sum_scale):
      A_ch      = sum_{mesh,ls} ske_ch * scale   (NEE radiance sans the
                  surface kd factor: r_nee_ch = kd_ch * A_ch)
      sum_scale = sum scale                      (d r_nee_ch / d ske_ch —
                  the PRB kernel's mat_emissive adjoint; only meaningful
                  under PRB's single-emitter gate)

    fast_shadow=True (the bounce-family estimator, round 4): the shadow
    sweep carries NO winner attributes — the light normal interpolates
    the SAMPLED triangle's corner normals at the sampled barycentrics
    (consts) and the emitted color is the emitter material's ke (consts,
    value-identical to the winner's ke row). Visibility uses
    sweep.shadow_em when available — a lean walk carrying only
    (nearest-em t, nearest-non-em t), measured ~2x cheaper than the
    attribute walk — falling back to a mesh-column closest sweep.
    Estimator deltas vs the legacy path: the light normal's fp path
    (sampled (a, b) vs the walk's recomputed Woop (u, v) — ~1e-6), and
    nearest-hit ties ACROSS meshes resolving pro-emitter instead of by
    bundled row. NOTE: ke rides as a baked constant — material-training
    paths keep fast_shadow=False so d/d(mat_emissive) stays live.

    vis_planes=(v0, v1): precomputed fused-pair visibility (f32 0/1
    planes from a standalone vis kernel — see vis_only) consumed
    instead of walking; single-emitter ls==2 fast path only.
    vis_only=True: nee(...) instead RETURNS the pair visibility planes
    (f32) after the fused walk and skips all contribution math — the
    standalone producer for vis_planes."""
    emitters = emitter if isinstance(emitter, list) else [emitter]
    inv_ls = np.float32(1.0 / light_samples)
    if (vis_planes is not None or vis_only) and not (
            fast_shadow and light_samples == 2 and len(emitters) == 1):
        raise ValueError("split NEE visibility needs the fast-shadow "
                         "single-emitter ls==2 pair path")

    def nee(samp, depth, h, gn, sn, hit):
        hx, hy, hz = h
        gnx, gny, gnz = gn
        snx, sny, snz = sn
        sox = hx + BIAS * gnx
        soy = hy + BIAS * gny
        soz = hz + BIAS * gnz
        A = [jnp.zeros_like(hx) for _ in range(3)]
        sum_scale = jnp.zeros_like(hx)
        shadow_em2 = getattr(sweep, "shadow_em2", None)
        for mi, em in enumerate(emitters):
            if (fast_shadow and light_samples == 2
                    and (shadow_em2 is not None
                         or vis_planes is not None)):
                # FUSED dual-sample visibility: both light samples of
                # this mesh share one walk (one scalar chain, two
                # t-carries) — value-identical to two shadow_em walks
                d0 = draw_fast(samp, depth, (hx, hy, hz),
                               (snx, sny, snz), hit, em,
                               0 + light_samples * mi)
                d1 = draw_fast(samp, depth, (hx, hy, hz),
                               (snx, sny, snz), hit, em,
                               1 + light_samples * mi)
                if vis_planes is not None:
                    vis0 = vis_planes[0] > 0.0
                    vis1 = vis_planes[1] > 0.0
                else:
                    vis0, vis1 = shadow_em2(
                        (sox, soy, soz), d0["sd"], d1["sd"],
                        alive0=d0["need"], alive1=d1["need"],
                        t_cap=NEE_T_CAP, em_mesh=d0["em_mesh"])
                    vis0 = vis0 & d0["need"]
                    vis1 = vis1 & d1["need"]
                if vis_only:
                    return (vis0.astype(jnp.float32),
                            vis1.astype(jnp.float32))
                for dd, vis in ((d0, vis0), (d1, vis1)):
                    scale = jnp.where(
                        vis, dd["geom"] * dd["lwt"] / (1.0 + dd["d2"])
                        * inv_ls, 0.0)
                    A[0] += dd["ske"][0] * scale
                    A[1] += dd["ske"][1] * scale
                    A[2] += dd["ske"][2] * scale
                    sum_scale += scale
                continue
            for ls in range(light_samples):
                A, sum_scale = one_mesh_sample(
                    samp, depth, (hx, hy, hz), (sox, soy, soz),
                    (snx, sny, snz), hit, A, sum_scale, em,
                    # RNG site: mi == 0 keeps round-1/2 streams bitwise
                    ls + light_samples * mi)
        return A, sum_scale

    def draw_light(samp, depth, h, em, site):
        """RNG draws + sampled light point for one (mesh, sample) site;
        shared by the looped and fused paths (identical streams)."""
        (em_mesh, em_count, em_v0, em_e1, em_e2, em_weight,
         em_n0, em_n1, em_n2, em_ke) = em
        hx, hy, hz = h
        u0_, u1_, u2_, _ = _pcg4d(
            pix, samp * jnp.int32(131071) + depth,
            jnp.full_like(pix, 0x11 + 0x101 * site),
            jnp.broadcast_to(seed, pix.shape))
        ut, ua, ub = _u01(u0_), _u01(u1_), _u01(u2_)
        # triangle choice: uniform by count (mesh.hpp:178-184)
        sel_t = jnp.minimum((ut * em_count).astype(jnp.int32),
                            em_count - 1)
        lv0x = jnp.zeros_like(ut)
        lv0y, lv0z = jnp.zeros_like(ut), jnp.zeros_like(ut)
        le1x, le1y, le1z = (jnp.zeros_like(ut),) * 3
        le2x, le2y, le2z = (jnp.zeros_like(ut),) * 3
        lwt = jnp.zeros_like(ut)
        lns = ([jnp.zeros_like(ut) for _ in range(3)],
               [jnp.zeros_like(ut) for _ in range(3)],
               [jnp.zeros_like(ut) for _ in range(3)])
        for k in range(em_count):
            m = (sel_t == k).astype(jnp.float32)
            lv0x += m * np.float32(em_v0[k, 0])
            lv0y += m * np.float32(em_v0[k, 1])
            lv0z += m * np.float32(em_v0[k, 2])
            le1x += m * np.float32(em_e1[k, 0])
            le1y += m * np.float32(em_e1[k, 1])
            le1z += m * np.float32(em_e1[k, 2])
            le2x += m * np.float32(em_e2[k, 0])
            le2y += m * np.float32(em_e2[k, 1])
            le2z += m * np.float32(em_e2[k, 2])
            lwt += m * np.float32(em_weight[k])
            if fast_shadow:
                for ci, nsrc in enumerate((em_n0, em_n1, em_n2)):
                    for c in range(3):
                        lns[ci][c] += m * np.float32(nsrc[k, c])
        # parallelogram fold (geometry.hpp:159-171)
        flip = (ua + ub) > 1.0
        a = jnp.where(flip, 1.0 - ua, ua)
        b = jnp.where(flip, 1.0 - ub, ub)
        tx_ = lv0x + a * le1x + b * le2x
        ty_ = lv0y + a * le1y + b * le2y
        tz_ = lv0z + a * le1z + b * le2z
        sd = (tx_ - hx, ty_ - hy, tz_ - hz)
        return sd, a, b, lwt, lns

    def fast_consts(sd, sn, hit, a, b, lns, em):
        """Consts-derived light normal, cosines, and pre-walk gate
        (fast-shadow path; see the nee docstring)."""
        em_ke = em[9]
        snx, sny, snz = sn
        sdx, sdy, sdz = sd
        w_ = 1.0 - a - b
        lnx, lny, lnz = _norm3(
            w_ * lns[0][0] + a * lns[1][0] + b * lns[2][0],
            w_ * lns[0][1] + a * lns[1][1] + b * lns[2][1],
            w_ * lns[0][2] + a * lns[1][2] + b * lns[2][2])
        ske = tuple(np.float32(em_ke[c]) for c in range(3))
        ldx, ldy, ldz = _norm3(sdx, sdy, sdz)
        cos_s = snx * ldx + sny * ldy + snz * ldz
        cos_l = -(lnx * ldx + lny * ldy + lnz * ldz)
        need = hit & (cos_s * cos_l > 0.0)
        geom = jnp.maximum(cos_s * cos_l, 0.0)
        d2 = sdx * sdx + sdy * sdy + sdz * sdz
        return ske, need, geom, d2

    def draw_fast(samp, depth, h, sn, hit, em, site):
        sd, a, b, lwt, lns = draw_light(samp, depth, h, em, site)
        ske, need, geom, d2 = fast_consts(sd, sn, hit, a, b, lns, em)
        return {"sd": sd, "lwt": lwt, "ske": ske, "need": need,
                "geom": geom, "d2": d2, "em_mesh": em[0]}

    def one_mesh_sample(samp, depth, h, so, sn, hit, A, sum_scale,
                        em, site):
        em_mesh = em[0]
        sox, soy, soz = so
        snx, sny, snz = sn
        (sdx, sdy, sdz), a, b, lwt, lns = draw_light(samp, depth, h,
                                                     em, site)
        # the sampled point sits at t == 1 of the UNNORMALIZED shadow
        # direction, so the walk's live segment is capped at 1 + eps:
        # subtrees past the light never open. Semantics-preserving — a
        # nearest hit beyond the cap could only be "visible" if the ray
        # grazed THROUGH its own sample point (fp measure zero)
        if fast_shadow:
            # light normal + both cosines are consts-derived, so the
            # geometry term is known BEFORE the walk; lanes with
            # geom == 0 (e.g. ceiling hits facing away from the light)
            # contribute 0 regardless of visibility and skip the shadow
            # walk entirely (their t_b rides -_BIG: no subtree votes)
            ske, need, geom, d2 = fast_consts(
                (sdx, sdy, sdz), sn, hit, a, b, lns, em)
            shadow_em = getattr(sweep, "shadow_em", None)
            if shadow_em is not None:
                visible = need & shadow_em(
                    (sox, soy, soz), (sdx, sdy, sdz), alive=need,
                    t_cap=NEE_T_CAP, em_mesh=em_mesh)
            else:
                _, s_hit, _, _, s_got = sweep(
                    (sox, soy, soz), (sdx, sdy, sdz), (_C_MESH,),
                    alive=need, t_init=NEE_T_CAP)
                visible = (s_hit & need
                           & (s_got[_C_MESH] == np.float32(em_mesh)))
        else:
            _, s_hit, su, sv, s_got = sweep(
                (sox, soy, soz), (sdx, sdy, sdz),
                tuple(range(_C_N0, _C_N0 + 9))
                + (_C_KE, _C_KE + 1, _C_KE + 2, _C_MESH),
                alive=hit, t_init=NEE_T_CAP)
            visible = (s_hit & hit
                       & (s_got[_C_MESH] == np.float32(em_mesh)))
            lnx, lny, lnz = _interp_n(su, sv, s_got,
                                      _C_N0, _C_N1, _C_N2)
            ske = (s_got[_C_KE], s_got[_C_KE + 1], s_got[_C_KE + 2])
        # brdf_eval (material.hpp:95-105): two-cosine geometry
        # term, 1/(1+d^2) falloff, weight = triArea*triCount
        if not fast_shadow:
            d2 = sdx * sdx + sdy * sdy + sdz * sdz
            ldx, ldy, ldz = _norm3(sdx, sdy, sdz)
            cos_s = snx * ldx + sny * ldy + snz * ldz
            cos_l = -(lnx * ldx + lny * ldy + lnz * ldz)
            geom = jnp.maximum(cos_s * cos_l, 0.0)
        scale = jnp.where(visible,
                          geom * lwt / (1.0 + d2) * inv_ls, 0.0)
        A[0] += ske[0] * scale
        A[1] += ske[1] * scale
        A[2] += ske[2] * scale
        sum_scale += scale
        return A, sum_scale

    return nee


def _rr_bounce_draws(seed, pix, samp, depth):
    """The bounce-site RNG draws (shared by forward and PRB replay)."""
    b0, b1, b2, _ = _pcg4d(pix,
                           samp * jnp.int32(131071) + depth,
                           jnp.full_like(pix, 0x5EED),
                           jnp.broadcast_to(seed, pix.shape))
    return _u01(b0), _u01(b1), _u01(b2)


def _cosine_bounce(sn, u1, psi01):
    """Cosine-weighted hemisphere sample about sn; tangent frame from
    cross(n,(0,1,0)) with cross(n,(0,0,1)) fallback
    (raytracer.cpp:173-192; normalized per PARITY)."""
    snx, sny, snz = sn
    sin_th = jnp.sqrt(u1)
    cos_th = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    psi = psi01 * np.float32(2.0 * np.pi)
    t1x, t1y, t1z = snz, jnp.zeros_like(snz), -snx
    deg = (t1x * t1x + t1z * t1z) == 0.0
    t1x = jnp.where(deg, -sny, t1x)
    t1y = jnp.where(deg, snx, t1y)
    t1x, t1y, t1z = _norm3(t1x, t1y, t1z)
    btx = sny * t1z - snz * t1y
    bty = snz * t1x - snx * t1z
    btz = snx * t1y - sny * t1x
    ca = sin_th * jnp.cos(psi)
    cb = sin_th * jnp.sin(psi)
    bdx = ca * t1x + cb * btx + cos_th * snx
    bdy = ca * t1y + cb * bty + cos_th * sny
    bdz = ca * t1z + cb * btz + cos_th * snz
    return bdx, bdy, bdz


# winner attribute columns each bounce reads (gn derives from _GN_ATTRS;
# the RR probability is max(kd) recomputed on the winner)
_BOUNCE_ATTRS = (tuple(range(_C_N0, _C_N0 + 9))
                 + tuple(range(_C_KD, _C_MESH + 1)) + _GN_ATTRS)


def _make_regen_body(col, cam, seed, pix, n_pix, T_pad, W, H, samples,
                     max_depth, light_samples, emitter, samp_slots=0,
                     col_dyn=None, chunk_box=None, sweep=None,
                     blk=None, blk_dyn=None, fast_shadow=False):
    """The regenerative estimator step shared by the Pallas kernel and the
    jnp replica: carry -> carry. Terminated lanes regenerate as their next
    sample; lanes past `samples` idle with zero throughput (the body is a
    no-op for them, so running it a fixed S*(max_depth+1) times equals
    running the while_loop to quiescence — which is how the replica stays
    reverse-differentiable).

    samp_slots > 0 appends 3*samp_slots per-SAMPLE radiance planes to the
    carry (one-hot accumulated by the lane's current sample index): the
    L_s record the PRB replay kernel initializes its remaining-radiance
    state from at each sample regeneration (ops/pallas_prb.py).

    col_dyn: dynamic row-slice accessor enabling the chunked sweep for
    T_pad > FUSED_CHUNK (see _make_geom).

    sweep: a prebuilt geometry sweep with _make_geom's interface
    (sweep(o, d, attr_cols, alive=None) -> (t, hit, u, v, {col: plane})).
    This is how the BVH path megakernel (ops/pallas_bvh_path.py) reuses
    this EXACT estimator over tree traversal instead of brute sweeps —
    col/T_pad/col_dyn/chunk_box are ignored when it is given."""
    if sweep is None:
        _, sweep = _make_geom(col, T_pad, chunk=FUSED_CHUNK,
                              col_dyn=col_dyn, chunk_box=chunk_box,
                              blk=blk, blk_dyn=blk_dyn)
    primary = _make_primary(cam, seed, pix, W, H)
    # fast_shadow: forward renderers only — the lean consts-sourced NEE
    # (no winner-attribute shadow sweep; see _make_nee). The jnp replica
    # and the PRB trainers stay legacy: ke must remain a live table
    # value for gradients, and the replica is the AD oracle.
    nee = _make_nee(sweep, emitter, seed, pix, light_samples,
                    fast_shadow=fast_shadow)
    S = jnp.int32(samples)

    def body(carry):
        (ox, oy, oz, dx, dy, dz, tr, tg, tb,
         ar, ag, ab, depth, samp) = carry[:14]
        ls_planes = carry[14:]

        t, hit, u, v, got = sweep((ox, oy, oz), (dx, dy, dz),
                                  _BOUNCE_ATTRS, alive=samp < S)
        hitf = hit.astype(jnp.float32)

        # hit point + normals
        hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
        snx, sny, snz = _interp_n(u, v, got, _C_N0, _C_N1, _C_N2)
        gn = _gn_from_got(got)

        kdr, kdg, kdb = got[_C_KD], got[_C_KD + 1], got[_C_KD + 2]

        # depth-0 emissive term: Ke * meshArea * dot(norm(d), -s_n)
        # (raytracer.cpp:127-128)
        ndx, ndy, ndz = _norm3(dx, dy, dz)
        cosv = -(ndx * snx + ndy * sny + ndz * snz)
        em_scale = jnp.where((depth == 0) & hit,
                             got[_C_AREA] * cosv, 0.0)
        rr_ = got[_C_KE] * em_scale
        rg_ = got[_C_KE + 1] * em_scale
        rb_ = got[_C_KE + 2] * em_scale

        A, _ = nee(samp, depth, (hx, hy, hz), gn,
                   (snx, sny, snz), hit)
        rr_ += kdr * A[0]
        rg_ += kdg * A[1]
        rb_ += kdb * A[2]

        ar += tr * rr_ * hitf
        ag += tg * rg_ * hitf
        ab += tb * rb_ * hitf
        if samp_slots:
            contrib = (tr * rr_ * hitf, tg * rg_ * hitf, tb * rb_ * hitf)
            new_ls = []
            for s in range(samp_slots):
                sel = (samp == s).astype(jnp.float32)
                for c in range(3):
                    new_ls.append(ls_planes[3 * s + c] + sel * contrib[c])
            ls_planes = tuple(new_ls)

        # Russian roulette + cosine bounce (raytracer.cpp:161-194)
        u_rr, u1, u2 = _rr_bounce_draws(seed, pix, samp, depth)
        p_cont = jnp.maximum(jnp.maximum(kdr, kdg), kdb)
        cont = hit & (depth < max_depth) & (u_rr <= p_cont) \
            & (samp < S)
        # double-where so the dead branch has a FINITE Jacobian: the VJP
        # of 1/max(p, 1e-20) at p == 0 is -1e40 (f32 overflow -> -inf),
        # and 0-cotangent * -inf = NaN poisons reverse-mode AD through
        # the replica (render.py:186-189 uses the same idiom)
        safe_p = jnp.where(p_cont > 0.0, p_cont, 1.0)
        inv_p = jnp.where(p_cont > 0.0, 1.0 / safe_p, 0.0)

        bdx, bdy, bdz = _cosine_bounce((snx, sny, snz), u1, u2)

        # continue: advance the bounce
        n_ox = hx + snx * BIAS
        n_oy = hy + sny * BIAS
        n_oz = hz + snz * BIAS
        n_tr = tr * kdr * inv_p
        n_tg = tg * kdg * inv_p
        n_tb = tb * kdb * inv_p

        # terminate: regenerate as the next sample (regen.py)
        n_samp = jnp.where(cont, samp, samp + 1)
        lane_on = n_samp < S
        p_ox, p_oy, p_oz, p_dx, p_dy, p_dz = primary(n_samp)

        onf = lane_on.astype(jnp.float32)
        ox = jnp.where(cont, n_ox, p_ox)
        oy = jnp.where(cont, n_oy, p_oy)
        oz = jnp.where(cont, n_oz, p_oz)
        dx = jnp.where(cont, bdx, p_dx)
        dy = jnp.where(cont, bdy, p_dy)
        dz = jnp.where(cont, bdz, p_dz)
        tr = jnp.where(cont, n_tr, onf)
        tg = jnp.where(cont, n_tg, onf)
        tb = jnp.where(cont, n_tb, onf)
        depth = jnp.where(cont, depth + 1, 0)
        return (ox, oy, oz, dx, dy, dz, tr, tg, tb,
                ar, ag, ab, depth, n_samp) + ls_planes

    def init(in_image):
        samp0 = jnp.where(in_image, 0, S)              # padding: done
        ox, oy, oz, dx, dy, dz = primary(samp0)
        onf0 = (samp0 < S).astype(jnp.float32)
        zeros = jnp.zeros_like(ox)
        return (ox, oy, oz, dx, dy, dz, onf0, onf0, onf0,
                zeros, zeros, zeros,
                jnp.zeros(ox.shape, jnp.int32), samp0) \
            + tuple(zeros for _ in range(3 * samp_slots))

    def cond(carry):
        return jnp.any(carry[13] < S)

    return body, cond, init


def _make_kernel(T_pad: int, W: int, H: int, samples: int, max_depth: int,
                 light_samples: int, emitter, n_pix: int,
                 interleave: int = 1):
    """interleave=2: TWO independent regenerative bodies per kernel
    instance (adjacent half-blocks of pixels), jointly advanced under
    condA | condB — _make_regen_body is a no-op for finished lanes, so
    the joint while_loop is estimator-exact (bit-identical image). The
    independent dataflows double the FMA chains the compiler can
    interleave against the ~5-cycle latency the round-4 floor analysis
    measured: 1 chain runs at 8.7% of the VPU ceiling in isolation and
    2 interleaved chains at exactly 2x (exp_r5_mfu_interleave.py);
    kernel-level the win is ~5% (the [T, RB] sweeps already carry wide
    ILP) — 62.1M vs 59.1M rays/s on the headline config, with
    single-body rb=512 at 60.8M ruling out block width as the cause."""
    chunked = T_pad > FUSED_CHUNK

    def kernel(cam_ref, seed_ref, base_ref, clo_ref, chi_ref, tri_ref,
               out_ref):
        rb = out_ref.shape[1]
        seed = seed_ref[0]

        def cam(i):
            return cam_ref[i]

        def col(c):
            return tri_ref[:, c:c + 1]                     # [T_pad, 1]

        def col_dyn(off, c):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), c:c + 1]    # [CHUNK, 1]

        def blk():
            return tri_ref[:, :]                           # [T_pad, 32]

        def blk_dyn(off):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), :]          # [CHUNK, 32]

        def chunk_box(k):
            return ((clo_ref[3 * k], clo_ref[3 * k + 1],
                     clo_ref[3 * k + 2]),
                    (chi_ref[3 * k], chi_ref[3 * k + 1],
                     chi_ref[3 * k + 2]))

        # base_ref: this shard's first global pixel (0 single-chip; a
        # chip's tile offset under parallel/fused_shard's ray DP)
        pix0 = pl.program_id(0) * rb + base_ref[0]
        rb_h = rb // interleave
        parts = []
        for h in range(interleave):
            pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb_h), 1)
                   + pix0 + h * rb_h)                      # [1, RB/k]
            body, cond, init = _make_regen_body(
                col, cam, seed, pix, n_pix, T_pad, W, H, samples,
                max_depth, light_samples, emitter, col_dyn=col_dyn,
                chunk_box=chunk_box if chunked else None,
                blk=blk, blk_dyn=blk_dyn, fast_shadow=True)
            parts.append((body, cond, init(pix < n_pix)))
        if interleave == 1:
            body, cond, init0 = parts[0]
            carries = [jax.lax.while_loop(cond, body, init0)]
        else:
            (bodyA, condA, initA), (bodyB, condB, initB) = parts
            nA = len(initA)

            def body2(c):
                return tuple(bodyA(c[:nA])) + tuple(bodyB(c[nA:]))

            def cond2(c):
                return condA(c[:nA]) | condB(c[nA:])

            joint = jax.lax.while_loop(cond2, body2,
                                       tuple(initA) + tuple(initB))
            carries = [joint[:nA], joint[nA:]]
        inv_s = np.float32(1.0 / samples)
        for h, carry in enumerate(carries):
            sl = pl.ds(h * rb_h, rb_h)
            out_ref[0:1, sl] = carry[9] * inv_s
            out_ref[1:2, sl] = carry[10] * inv_s
            out_ref[2:3, sl] = carry[11] * inv_s
        out_ref[3:8, :] = jnp.zeros((5, rb), jnp.float32)

    return kernel


def fused_path_supported(scene: Scene) -> bool:
    """Engine gate: untextured, small emissive meshes, T within the
    chunked-sweep cap."""
    if _fused_t_pad(int(scene.num_triangles)) > FUSED_MAX_TRIS:
        return False
    if not (1 <= scene.num_emissive <= FUSED_MAX_EMITTERS):
        return False
    if int(np.asarray(scene.tex_hw).max()) > 1:
        return False
    for i in range(scene.num_emissive):
        em = int(np.asarray(scene.emissive_mesh_ids)[i])
        if (int(np.asarray(scene.mesh_tri_count)[em])
                > FUSED_MAX_EMITTER_TRIS):
            return False
    maps = np.concatenate([np.asarray(scene.mat_map_diffuse),
                           np.asarray(scene.mat_map_specular),
                           np.asarray(scene.mat_map_bump)])
    return bool((maps < 0).all())


def camera_vec(camera) -> jax.Array:
    """[12] float32: origin | front | right | up (the kernel's scalar
    camera argument)."""
    return jnp.concatenate([
        jnp.asarray(camera.origin, jnp.float32),
        jnp.asarray(camera.front, jnp.float32),
        jnp.asarray(camera.right, jnp.float32),
        jnp.asarray(camera.up, jnp.float32)])


def seed_scalar(key) -> jax.Array:
    """[1] int32 PCG seed derived from a jax PRNG key."""
    seed = jax.random.key_data(jax.random.fold_in(key, 0x0F05ED))
    return seed.reshape(-1)[-1:].astype(jnp.int32)


def build_fused_call(T_pad: int, W: int, H: int, samples: int,
                     max_depth: int, light_samples: int, emitter,
                     n_pix: int, n_pad: int, ray_block: int,
                     interpret: bool, interleave: int = 1):
    """The raw megakernel call: (cam_vec [12], seed [1], pix_base [1],
    tab [T_pad, 32]) -> [8, n_pad] radiance planes for the n_pad lanes
    starting at global pixel pix_base. make_fused_path_renderer wraps it
    for the whole image (pix_base 0); parallel/fused_shard sizes n_pad to
    a chip's tile and passes each shard's offset."""
    kernel = _make_kernel(T_pad, W, H, samples, max_depth, light_samples,
                          emitter, n_pix, interleave=interleave)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // ray_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )


def make_fused_path_renderer(scene: Scene, camera, *, samples: int,
                             max_depth: int, light_samples: int = 2,
                             ray_block: int = RAY_BLOCK,
                             interleave: int = 2,
                             interpret: bool | None = None):
    """Build `fn(key) -> [H, W, 3]` rendering the scene with the megakernel.

    The scene/camera geometry is baked at build time (emitter triangles
    become kernel constants); `key` seeds the in-kernel PCG stream, so
    repeated calls with different keys give independent estimators.

    interleave=2 (default): two independent half-block regen bodies per
    kernel instance, bit-identical image, measured +5% on the headline
    config (see _make_kernel).
    """
    if not fused_path_supported(scene):
        raise ValueError("scene outside the fused-path gate "
                         "(textures / emitters / size)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rb = ray_block * interleave
    H, W = camera.yres, camera.xres
    n_pix = H * W
    n_pad = ((max(n_pix, rb) + rb - 1) // rb) * rb

    tab_np = pack_fused_tri_table(scene)
    lo, hi = fused_chunk_bounds(scene)
    clo, chi = jnp.asarray(lo.ravel()), jnp.asarray(hi.ravel())
    tri_tab = jnp.asarray(tab_np)
    T_pad = tri_tab.shape[0]
    emitter = _emitters_consts(scene)

    cam_vec = camera_vec(camera)
    call = build_fused_call(T_pad, W, H, samples, max_depth, light_samples,
                            emitter, n_pix, n_pad, rb, interpret,
                            interleave=interleave)
    zero_base = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _impl(cv, seed, tab):
        out = call(cv, seed, zero_base, clo, chi, tab)
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    def render_fused(key, camera_override=None, tab=None) -> jax.Array:
        """Render with `key`; camera_override (same resolution) lets the
        viewer fly without recompiling — the kernel reads the camera
        from scalar memory at run time. `tab` overrides the triangle
        table (pack_fused_tri_table_jnp of a parameter-substituted
        scene), so optimization loops can re-render updated materials
        without rebuilding the kernel (chunk-cull AABBs are baked from
        the build-time geometry — material-only substitutions only)."""
        cv = cam_vec if camera_override is None else camera_vec(
            camera_override)
        return _impl(cv, seed_scalar(key), tri_tab if tab is None else tab)

    return render_fused


def fused_reference_render(scene: Scene, camera, key, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           tab: jax.Array | None = None) -> jax.Array:
    """Pure-jnp replica of the megakernel: bit-for-bit the same estimator
    math (shared builders), run as a fixed-length scan over the whole
    image at once — and therefore reverse-mode differentiable. This is
    the gradient oracle for ops/pallas_prb.py (tests/test_prb.py): AD
    through this function and the PRB kernel's hand-derived adjoints
    must agree to float tolerance.

    `tab` overrides the triangle table (pass pack_fused_tri_table_jnp of
    a parameter-substituted scene to differentiate w.r.t. materials).
    Small scenes/resolutions only — the scan stores per-step residuals.
    """
    H, W = camera.yres, camera.xres
    n_pix = H * W
    if tab is None:
        tab = pack_fused_tri_table_jnp(scene)
    T_pad = tab.shape[0]
    emitter = _emitters_consts(scene)
    cv = camera_vec(camera)
    seed = seed_scalar(key)[0]

    pix = jnp.arange(n_pix, dtype=jnp.int32).reshape(1, n_pix)

    def col(c):
        return tab[:, c:c + 1]

    def col_dyn(off, c):
        return jax.lax.dynamic_slice(tab, (off, c), (FUSED_CHUNK, 1))

    def blk():
        return tab

    def blk_dyn(off):
        return jax.lax.dynamic_slice(tab, (off, 0), (FUSED_CHUNK, 32))

    def cam(i):
        return cv[i]

    body, _, init = _make_regen_body(col, cam, seed, pix, n_pix, T_pad,
                                     W, H, samples, max_depth,
                                     light_samples, emitter,
                                     col_dyn=col_dyn,
                                     blk=blk, blk_dyn=blk_dyn)

    carry = init(jnp.ones((1, n_pix), bool))
    n_steps = samples * (max_depth + 1)
    carry, _ = jax.lax.scan(lambda c, _: (body(c), None), carry,
                            None, length=n_steps)
    inv_s = 1.0 / samples
    img = jnp.stack([carry[9][0], carry[10][0], carry[11][0]],
                    axis=-1) * inv_s
    return img.reshape(H, W, 3)
