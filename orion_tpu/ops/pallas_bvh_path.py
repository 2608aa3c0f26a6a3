"""Pallas TPU megakernel: regenerative path tracing over a VMEM-resident BVH.

The fourth megakernel closes the round-1 gap VERDICT called out: path
mode beyond the brute-sweep gate. ops/pallas_fused.py's kernel sweeps
EVERY triangle per bounce (chunk-culled fori slices past one chunk),
which measurement shows collapses from 47 M rays/s (cornell, resident)
to ~1.1 M rays/s at 2k triangles — the sweep is O(T) per bounce. This
kernel keeps the ENTIRE regenerative estimator of pallas_fused.py —
literally the same `_make_regen_body` builder, same PCG4D streams, same
NEE/RR/bounce math, bit-identical images up to nearest-hit ties — but
swaps the brute sweep for a skip-pointer BVH walk over bundled leaves
resident in VMEM ([32, B_pad] component planes, 128 B per bundled row).

Traversal is the block-uniform packet walk of ops/pallas_bvh_whitted.py
(one scalar pointer per RAY_BLOCK rays, subtree entered iff ANY live
lane slab-hits, per-lane t-entry pruning), extended with WINNER
ATTRIBUTE PICKING parameterized by the estimator's requested column set:
`sweep(o, d, attr_cols, alive)` carries one [1, RB] plane per requested
column through the walk and select-reduces leaf winners in place, so it
satisfies _make_geom's sweep interface exactly and _make_regen_body
cannot tell the difference. Dead lanes (alive=False: regenerated-out
samples, NEE misses) carry a t of -_BIG so they never vote a subtree in.

vs the reference: this is the configuration of RayTracer::trace's path
estimator (/root/reference/orion/raytracer.cpp:105-194) running on the
per-mesh SBVH (avx/sbvh.cpp:36-83) — one recursive walk per ray per
bounce on a CPU core. Here a 256-lane block walks together and the whole
sample loop (primary gen, bounces, NEE shadow walks, RR, regeneration)
never leaves VMEM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.accel.bvh import BVH, SAH, build_bvh
from orion_tpu.ops.pallas_bvh_whitted import LEAF_WIDTH, _woop_uv
from orion_tpu.ops.pallas_fused import (_BIG, _C_AREA, _C_KD, _C_KE,
                                        _C_MESH, _C_N0, _C_WOOP,
                                        FUSED_MAX_EMITTER_TRIS,
                                        FUSED_MAX_EMITTERS, _emitters_consts,
                                        _make_regen_body, camera_vec,
                                        seed_scalar)
from orion_tpu.ops.woop import woop_rows, woop_t2
from orion_tpu.scene import Scene

RAY_BLOCK = 256   # the BVH megakernels' measured best block width
_ROWS = 32        # table rows == pallas_fused column map, 8-aligned
# [32, B_pad] f32 residency: 128 B per bundled row
RESIDENT_MAX_BUNDLED = 56 * 1024


def pack_bvh_path_table(bvh: BVH, scene: Scene) -> np.ndarray:
    """[32, B_pad] component rows in BUNDLED (leaf-contiguous) order,
    row-indexed by pallas_fused's `_C_*` column map — so the shared
    estimator's attribute requests (`_BOUNCE_ATTRS`, the NEE column set)
    index this table directly. Padding rows (tri_orig == -1, and any tail
    past the last bundle) are degenerate (e1 = e2 = 0 => MT det 0 =>
    never hit) and carry zero material."""
    B = int(bvh.tri_v0.shape[0])
    B_pad = ((max(B, LEAF_WIDTH) + LEAF_WIDTH - 1)
             // LEAF_WIDTH) * LEAF_WIDTH
    tab = np.zeros((_ROWS, B_pad), np.float32)
    tab[_C_WOOP:_C_WOOP + 13, :B] = woop_rows(
        np.asarray(bvh.tri_v0), np.asarray(bvh.tri_e1),
        np.asarray(bvh.tri_e2), xp=np).T
    tab[_C_WOOP + 11, B:] = 1.0   # tail past B: always-miss transform

    T = int(scene.num_triangles)
    raw = np.asarray(bvh.tri_orig)[:B]
    real = raw >= 0                  # padding rows carry tri_orig == -1
    orig = np.clip(raw, 0, T - 1)
    tab[_C_N0:_C_N0 + 3, :B] = np.asarray(scene.n0)[orig].T
    tab[_C_N0 + 3:_C_N0 + 6, :B] = np.asarray(scene.n1)[orig].T
    tab[_C_N0 + 6:_C_N0 + 9, :B] = np.asarray(scene.n2)[orig].T

    mat = np.asarray(scene.tri_mat)[orig]
    m = real.astype(np.float32)
    kd = np.asarray(scene.mat_diffuse)[mat] * m[:, None]
    ke = np.asarray(scene.mat_emissive)[mat] * m[:, None]
    tab[_C_KD:_C_KD + 3, :B] = kd.T
    tab[_C_KE:_C_KE + 3, :B] = ke.T
    tab[_C_AREA, :B] = np.asarray(scene.mesh_area)[mat] * m
    tab[_C_MESH, :B] = mat.astype(np.float32) * m
    return tab


def pack_bvh_tex_table(bvh: BVH, scene: Scene) -> np.ndarray:
    """[B_pad, 8] ROW-major per-bundled-row texture data for the bounce
    pipeline's deferred per-bounce texturing: cols 0-5 = the three
    corner uvs (uv0 uv1 uv2, xy each), 6-7 pad. Row-major so the
    per-bounce winner-row gather reads 32 contiguous bytes
    (exp_r5_gather). The diffuse map id is NOT here — it is per
    MATERIAL, resolved on the MXU from a [M, 5] atlas-metadata table
    (shade._mat_tex_table) keyed by the winner's material row."""
    B = int(bvh.tri_v0.shape[0])
    B_pad = ((max(B, LEAF_WIDTH) + LEAF_WIDTH - 1)
             // LEAF_WIDTH) * LEAF_WIDTH
    out = np.zeros((B_pad, 8), np.float32)
    T = int(scene.num_triangles)
    raw = np.asarray(bvh.tri_orig)[:B]
    orig = np.clip(raw, 0, T - 1)
    m = (raw >= 0).astype(np.float32)[:, None]
    out[:B, 0:2] = np.asarray(scene.uv0)[orig] * m
    out[:B, 2:4] = np.asarray(scene.uv1)[orig] * m
    out[:B, 4:6] = np.asarray(scene.uv2)[orig] * m
    return out


def bounce_textured_supported(scene: Scene) -> bool:
    """The TEXTURED bounce-pipeline gate: path scenes whose estimator
    needs only kd(uv) and solid ke — diffuse texture maps allowed on
    any material (the reference's path branch reads the diffuse
    texture at every depth, material.hpp:95-105; specular/bump maps
    are Whitted-only and simply unused here), emitters still small
    with solid ke (the fast-shadow NEE bakes them as constants; the
    importer never loads emissive maps, model.cpp:195-227)."""
    if not (1 <= scene.num_emissive <= FUSED_MAX_EMITTERS):
        return False
    for i in range(scene.num_emissive):
        em = int(np.asarray(scene.emissive_mesh_ids)[i])
        if (int(np.asarray(scene.mesh_tri_count)[em])
                > FUSED_MAX_EMITTER_TRIS):
            return False
    return True


def bvh_path_supported(scene: Scene) -> bool:
    """Engine gate: untextured path scene with small emissive meshes (the
    NEE emitter constants are baked per mesh, exactly the fused gate) —
    but NO triangle-count cap; the build checks the bundled-row residency
    cap separately."""
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


def _make_path_sweep(node, tab_ref, M, octant_copies: int = 1,
                     leaf_width: int = LEAF_WIDTH):
    """A BVH-walk geometry sweep satisfying _make_geom's interface:
    sweep(o, d, attr_cols, alive=None) -> (t, hit, u, v, {col: [1, RB]}),
    plus sweep.any_hit(o, d, alive=None) -> [1, RB] bool.

    The walk is block-uniform (one scalar pointer, subtree entered iff
    ANY lane's live segment [0, t_best) slab-hits) with in-leaf winner
    picking: u, v, and each requested attribute column ride the while
    carry as [1, RB] planes and are select-reduced out of the winning
    [LEAF_WIDTH, RB] leaf block the moment some lane improves.

    octant_copies=8: the node arrays hold 8 concatenated flattenings of
    the SAME tree (reflatten_octants), copy o ordered near-first for
    direction octant o — each walk majority-votes its block's direction
    octant and starts at that copy (sorted wavefronts make blocks
    octant-uniform, so near-first order tightens t_best early and the
    slab t-pruning culls far subtrees; leaf starts are shared, so the
    bundled table is unchanged). The vote is a heuristic with no
    correctness weight: every copy is a complete tree.

    leaf_width=64: bundles are 64 rows at 64-aligned offsets. Mosaic
    requires DYNAMIC lane slices at 128-multiples, so the leaf load
    reads the surrounding 128-aligned [32, 128] slice and scalar-selects
    the owning half — one cheap [32, 64] select buys HALF the Woop
    plane flops per leaf visit (the dominant walk cost: ~1.2 us per
    [128, RB] visit vs ~0.29 us per node step, BENCHMARKS.md)."""
    assert leaf_width in (LEAF_WIDTH, 64), leaf_width
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (leaf_width, 1), 0)
    M_per = M // octant_copies

    def _walk_range(d):
        """(first node, end) for this block's direction octant."""
        if octant_copies == 1:
            return jnp.int32(0), jnp.int32(M)
        votes = [jnp.sum(jnp.where(c >= 0.0, 1.0, -1.0)) for c in d]
        o = ((votes[0] >= 0.0).astype(jnp.int32)
             + 2 * (votes[1] >= 0.0).astype(jnp.int32)
             + 4 * (votes[2] >= 0.0).astype(jnp.int32))
        base = o * np.int32(M_per)
        return base, base + np.int32(M_per)

    def _slab(ptr, o, inv, t_b):
        lo = (node["lox"][ptr], node["loy"][ptr], node["loz"][ptr])
        hi = (node["hix"][ptr], node["hiy"][ptr], node["hiz"][ptr])
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

    def _leaf_off(start):
        # leaf starts are leaf_width multiples; bit 0 optionally encodes
        # "this leaf holds NO emitter rows" (collapse/device-data sets
        # it; unencoded trees read 0 = conservative full path)
        return pl.multiple_of(jnp.maximum(start, 0) & jnp.int32(-2),
                              leaf_width)

    def _leaf_blk(off):
        if leaf_width == LEAF_WIDTH:
            return tab_ref[:, pl.ds(off, LEAF_WIDTH)]   # [32, W]
        # width 64: 128-aligned load + scalar half-select (dynamic lane
        # slices must be 128-multiples; the table is 128-padded)
        off128 = pl.multiple_of(off & jnp.int32(-128), 128)
        full = tab_ref[:, pl.ds(off128, 128)]
        return jnp.where((off & 64) > 0, full[:, 64:], full[:, :64])

    def _leaf_planes(start, o, d):
        off = _leaf_off(start)
        blk = _leaf_blk(off)                            # [32, W]
        blk_t = blk.T                                   # [W, 32]
        t, u, v = _woop_uv(o, d, blk_t)
        return blk_t, t, u, v

    def sweep(o, d, attr_cols, alive=None, t_init=None):
        attr_cols = tuple(attr_cols)
        cap = _BIG if t_init is None else np.float32(t_init)
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        zero = jnp.zeros(shape, jnp.float32)
        t0 = (jnp.full(shape, cap) if alive is None
              else jnp.where(alive, cap, -_BIG))

        def body(carry):
            ptr = carry[0]
            state = carry[1:]              # (t_b, u, v, *picks)
            t_b = state[0]
            lane_hit = _slab(ptr, o, inv, t_b)
            any_lane = jnp.any(lane_hit)
            start = node["start"][ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_b = state[0]
                blk_t, t, u, v = _leaf_planes(start, o, d)
                t_min = jnp.min(t, axis=0, keepdims=True)
                better = (t_min < t_b) & (t_min < _BIG)

                def do_picks(state):
                    t_b, u_b, v_b = state[0], state[1], state[2]
                    picks = state[3:]
                    row_min = jnp.min(
                        jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                        axis=0, keepdims=True)
                    sel = row_idx == row_min

                    def pick(p):
                        return jnp.sum(jnp.where(sel, p, 0.0), axis=0,
                                       keepdims=True)

                    # winner attrs as ONE one-hot MXU contraction
                    # (bit-exact; see pallas_fused._make_geom) instead
                    # of 3 VPU plane-ops per column
                    got_all = jax.lax.dot_general(
                        blk_t, sel.astype(jnp.float32),
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # [32, RB]
                    new = [got_all[c:c + 1, :] for c in attr_cols]
                    out = [jnp.where(better, t_min, t_b),
                           jnp.where(better, pick(u), u_b),
                           jnp.where(better, pick(v), v_b)]
                    out += [jnp.where(better, n, p)
                            for n, p in zip(new, picks)]
                    return tuple(out)

                return jax.lax.cond(jnp.any(better), do_picks,
                                    lambda s: s, state)

            state = jax.lax.cond(any_lane & is_leaf, leaf_case,
                                 lambda s: s, state)
            descend = any_lane & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, node["skip"][ptr])
            return (ptr,) + state

        base, end = _walk_range(d)
        init = ((base, t0, zero, zero)
                + tuple(zero for _ in attr_cols))
        out = jax.lax.while_loop(lambda c: c[0] < end, body, init)
        t_b = out[1]
        hit = t_b < cap
        if alive is not None:
            hit = hit & alive
        return (jnp.where(hit, t_b, _BIG), hit, out[2], out[3],
                dict(zip(attr_cols, out[4:])))

    def any_hit(o, d, alive=None):
        """Occlusion-only walk: a lane retires on ANY intersection; the
        mask rides the carry as f32 0/1 (Mosaic rejects i1 vector
        carries)."""
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        need_f = (jnp.ones(shape, jnp.float32) if alive is None
                  else alive.astype(jnp.float32))

        def body(carry):
            ptr, occ = carry
            open_ = (need_f * (1.0 - occ)) > 0.0
            t_b = jnp.where(open_, _BIG, -_BIG)
            lane_hit = _slab(ptr, o, inv, t_b)
            any_lane = jnp.any(lane_hit)
            start = node["start"][ptr]
            is_leaf = start >= 0

            def leaf_case(occ):
                _, t, _, _ = _leaf_planes(start, o, d)
                hit = jnp.min(t, axis=0, keepdims=True) < _BIG
                return jnp.maximum(occ, (hit & open_).astype(jnp.float32))

            occ = jax.lax.cond(any_lane & is_leaf, leaf_case,
                               lambda s: s, occ)
            descend = any_lane & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, node["skip"][ptr])
            settled = jnp.maximum(occ, 1.0 - need_f)
            ptr = jnp.where(jnp.all(settled > 0.0), end, ptr)
            return ptr, occ

        base, end = _walk_range(d)
        _, occ = jax.lax.while_loop(
            lambda c: c[0] < end, body,
            (base, jnp.zeros(shape, jnp.float32)))
        return occ > 0.0

    def shadow_em(o, d, alive=None, t_cap=None, em_mesh=0):
        """Lean NEE visibility walk: does the nearest (t < cap) hit
        land on em_mesh? Same winner semantics as the attribute sweep
        (min t, ties by bundled row: in-leaf row pick + improve-only
        across leaves in DFS == row order), but the carry is two planes
        (t_best, em flag) instead of 3 + |attr_cols| — measured ~2x
        cheaper per bounce than the attribute shadow sweep it replaces
        (the NEE walks were 50% of the whole bounce pipeline)."""
        cap = _BIG if t_cap is None else np.float32(t_cap)
        exm = np.float32(em_mesh)
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        t0 = (jnp.full(shape, cap) if alive is None
              else jnp.where(alive, cap, -_BIG))

        def body(carry):
            ptr, t_b, em_f = carry
            lane_hit = _slab(ptr, o, inv, t_b)
            any_lane = jnp.any(lane_hit)
            start = node["start"][ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_b, em_f = state
                blk_t, t, _, _ = _leaf_planes(start, o, d)
                t_min = jnp.min(t, axis=0, keepdims=True)
                better = (t_min < t_b) & (t_min < _BIG)
                row_min = jnp.min(
                    jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                    axis=0, keepdims=True)
                leaf_em = jnp.broadcast_to(
                    blk_t[:, _C_MESH:_C_MESH + 1] == exm, t.shape)
                em_new = jnp.sum(
                    jnp.where(row_idx == row_min,
                              leaf_em.astype(jnp.float32), 0.0),
                    axis=0, keepdims=True)
                return (jnp.where(better, t_min, t_b),
                        jnp.where(better, em_new, em_f))

            t_b, em_f = jax.lax.cond(any_lane & is_leaf, leaf_case,
                                     lambda s: s, (t_b, em_f))
            descend = any_lane & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, node["skip"][ptr])
            return ptr, t_b, em_f

        base, end = _walk_range(d)
        _, t_b, em_f = jax.lax.while_loop(
            lambda c: c[0] < end, body,
            (base, t0, jnp.zeros(shape, jnp.float32)))
        vis = (t_b < cap) & (em_f > 0.0)
        if alive is not None:
            vis = vis & alive
        return vis

    def shadow_em2(o, d0, d1, alive0=None, alive1=None, t_cap=None,
                   em_mesh=0):
        """Fused dual-sample NEE visibility: shadow_em for TWO rays that
        share an origin (both light samples of one bounce) in ONE walk.
        The per-step serial scalar chain (8 SMEM loads -> any-reduce ->
        branch -> pointer update, ~3/4 of the 226 ns step cost,
        exp_walk_anatomy/exp_scalar_hiding) is paid once for both rays;
        only the cheap vector work doubles. Both rays target the same
        small emitter, so the union of visited subtrees stays ~equal to
        one ray's — measured ~2x cheaper than two shadow_em walks."""
        cap = _BIG if t_cap is None else np.float32(t_cap)
        exm = np.float32(em_mesh)
        inv0 = (1.0 / d0[0], 1.0 / d0[1], 1.0 / d0[2])
        inv1 = (1.0 / d1[0], 1.0 / d1[1], 1.0 / d1[2])
        shape = jnp.broadcast_shapes(o[0].shape, d0[0].shape)
        t00 = (jnp.full(shape, cap) if alive0 is None
               else jnp.where(alive0, cap, -_BIG))
        t01 = (jnp.full(shape, cap) if alive1 is None
               else jnp.where(alive1, cap, -_BIG))
        zero = jnp.zeros(shape, jnp.float32)

        def em_win(t, t_b, em_f, leaf_em):
            t_min = jnp.min(t, axis=0, keepdims=True)
            better = (t_min < t_b) & (t_min < _BIG)
            row_min = jnp.min(
                jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                axis=0, keepdims=True)
            em_new = jnp.sum(
                jnp.where(row_idx == row_min,
                          leaf_em.astype(jnp.float32), 0.0),
                axis=0, keepdims=True)
            return (jnp.where(better, t_min, t_b),
                    jnp.where(better, em_new, em_f))

        def body(carry):
            ptr, t_b0, em_f0, t_b1, em_f1 = carry
            lane_hit = (_slab(ptr, o, inv0, t_b0)
                        | _slab(ptr, o, inv1, t_b1))
            any_lane = jnp.any(lane_hit)
            start = node["start"][ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_b0, em_f0, t_b1, em_f1 = state
                off = _leaf_off(start)
                blk_t = _leaf_blk(off).T
                w = tuple(blk_t[:, _C_WOOP + i:_C_WOOP + i + 1]
                          for i in range(13))
                # shared-origin dual Woop: both rays leave the same hit
                # point, so the origin transform is computed once
                t0, t1 = woop_t2(o, d0, d1, w)

                def with_em(state):
                    t_b0, em_f0, t_b1, em_f1 = state
                    leaf_em = jnp.broadcast_to(
                        blk_t[:, _C_MESH:_C_MESH + 1] == exm, t0.shape)
                    t_b0, em_f0 = em_win(t0, t_b0, em_f0, leaf_em)
                    t_b1, em_f1 = em_win(t1, t_b1, em_f1, leaf_em)
                    return t_b0, em_f0, t_b1, em_f1

                def without_em(state):
                    # bit-0 flag: no emitter rows here — the winner-row
                    # tie machinery is moot (any improving hit votes
                    # em_f to 0); only the two t_min reduces remain
                    t_b0, em_f0, t_b1, em_f1 = state
                    tm0 = jnp.min(t0, axis=0, keepdims=True)
                    b0 = (tm0 < t_b0) & (tm0 < _BIG)
                    tm1 = jnp.min(t1, axis=0, keepdims=True)
                    b1 = (tm1 < t_b1) & (tm1 < _BIG)
                    return (jnp.where(b0, tm0, t_b0),
                            jnp.where(b0, 0.0, em_f0),
                            jnp.where(b1, tm1, t_b1),
                            jnp.where(b1, 0.0, em_f1))

                return jax.lax.cond((start & 1) > 0, without_em,
                                    with_em, state)

            t_b0, em_f0, t_b1, em_f1 = jax.lax.cond(
                any_lane & is_leaf, leaf_case, lambda s: s,
                (t_b0, em_f0, t_b1, em_f1))
            descend = any_lane & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, node["skip"][ptr])
            return ptr, t_b0, em_f0, t_b1, em_f1

        # both sample rays leave one hit point for the same small
        # emitter: d0's octant serves the pair
        base, end = _walk_range(d0)
        _, t_b0, em_f0, t_b1, em_f1 = jax.lax.while_loop(
            lambda c: c[0] < end, body, (base, t00, zero, t01,
                                         zero))
        vis0 = (t_b0 < cap) & (em_f0 > 0.0)
        vis1 = (t_b1 < cap) & (em_f1 > 0.0)
        if alive0 is not None:
            vis0 = vis0 & alive0
        if alive1 is not None:
            vis1 = vis1 & alive1
        return vis0, vis1

    def lean(o, d, alive=None, t_init=None):
        """Nearest-hit walk carrying ONLY (t, u, v, global winner row) —
        4 planes instead of 3 + |attr_cols|. The full-attribute carry
        measured ~1.1s of the 1.58s flagship bounce pipeline (register
        spills: ~20 [1, RB] planes through every while step —
        experiments/exp_bounce_anatomy.py 'lean-carry'); attributes are
        gathered from the table by row AFTER the walk instead. Winner
        semantics identical to the attribute sweep (min t, ties by
        bundled row; same slab votes, same node sequence)."""
        cap = _BIG if t_init is None else np.float32(t_init)
        inv = (1.0 / d[0], 1.0 / d[1], 1.0 / d[2])
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        zero = jnp.zeros(shape, jnp.float32)
        t0 = (jnp.full(shape, cap) if alive is None
              else jnp.where(alive, cap, -_BIG))

        def body(carry):
            ptr, t_b, u_b, v_b, r_b = carry
            lane_hit = _slab(ptr, o, inv, t_b)
            any_lane = jnp.any(lane_hit)
            start = node["start"][ptr]
            is_leaf = start >= 0

            def leaf_case(state):
                t_b, u_b, v_b, r_b = state
                _, t, u, v = _leaf_planes(start, o, d)
                t_min = jnp.min(t, axis=0, keepdims=True)
                better = (t_min < t_b) & (t_min < _BIG)

                def do_picks(state):
                    t_b, u_b, v_b, r_b = state
                    row_min = jnp.min(
                        jnp.where(t == t_min, row_idx, jnp.int32(2**30)),
                        axis=0, keepdims=True)
                    sel = row_idx == row_min

                    def pick(p):
                        return jnp.sum(jnp.where(sel, p, 0.0), axis=0,
                                       keepdims=True)

                    off = _leaf_off(start)
                    g_row = (row_min.astype(jnp.float32)
                             + off.astype(jnp.float32))
                    return (jnp.where(better, t_min, t_b),
                            jnp.where(better, pick(u), u_b),
                            jnp.where(better, pick(v), v_b),
                            jnp.where(better, g_row, r_b))

                return jax.lax.cond(jnp.any(better), do_picks,
                                    lambda s: s, state)

            t_b, u_b, v_b, r_b = jax.lax.cond(
                any_lane & is_leaf, leaf_case, lambda s: s,
                (t_b, u_b, v_b, r_b))
            descend = any_lane & jnp.logical_not(is_leaf)
            ptr = jnp.where(descend, ptr + 1, node["skip"][ptr])
            return ptr, t_b, u_b, v_b, r_b

        base, end = _walk_range(d)
        _, t_b, u_b, v_b, r_b = jax.lax.while_loop(
            lambda c: c[0] < end, body,
            (base, t0, zero, zero, zero))
        hit = t_b < cap
        if alive is not None:
            hit = hit & alive
        return jnp.where(hit, t_b, _BIG), hit, u_b, v_b, r_b

    sweep.any_hit = any_hit
    sweep.shadow_em = shadow_em
    sweep.shadow_em2 = shadow_em2
    sweep.lean = lean
    return sweep


def _make_kernel(M, W, H, samples, max_depth, light_samples, emitter,
                 n_pix):
    def kernel(cam_ref, seed_ref, base_ref, n_lox, n_loy, n_loz,
               n_hix, n_hiy, n_hiz, n_skip, n_start, tab_ref, out_ref):
        rb = out_ref.shape[1]
        seed = seed_ref[0]
        node = {"lox": n_lox, "loy": n_loy, "loz": n_loz,
                "hix": n_hix, "hiy": n_hiy, "hiz": n_hiz,
                "skip": n_skip, "start": n_start}

        def cam(i):
            return cam_ref[i]

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        sweep = _make_path_sweep(node, tab_ref, M)
        body, cond, init = _make_regen_body(
            None, cam, seed, pix, n_pix, 0, W, H, samples, max_depth,
            light_samples, emitter, sweep=sweep)
        carry = jax.lax.while_loop(cond, body, init(in_image))
        inv_s = np.float32(1.0 / samples)
        out_ref[0:1, :] = carry[9] * inv_s
        out_ref[1:2, :] = carry[10] * inv_s
        out_ref[2:3, :] = carry[11] * inv_s
        out_ref[3:8, :] = jnp.zeros((5, rb), jnp.float32)

    return kernel


def build_bvh_path_call(M, W, H, samples, max_depth, light_samples,
                        emitter, n_pix, n_pad, ray_block, interpret):
    """The raw megakernel call: (cam_vec [12], seed [1], pix_base [1],
    *node_scalars [8 arrays], tab [32, B_pad]) -> [8, n_pad] radiance
    planes for the n_pad lanes starting at global pixel pix_base.
    make_bvh_path_renderer wraps it whole-image (pix_base 0);
    parallel/fused_shard sizes n_pad to a chip's tile and passes each
    shard's offset (ray DP, same shape as the brute megakernel's)."""
    kernel = _make_kernel(M, W, H, samples, max_depth, light_samples,
                          emitter, n_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=11,
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


def reflatten_octant(lo, hi, skip, start, signs):
    """Re-emit a flattened skip-pointer tree in a new DFS order: at each
    internal node the child whose centroid is NEARER along the split
    axis for a ray of direction signs `signs` comes first. Structure,
    AABBs, and leaf `start` pointers (into the shared bundled table)
    are unchanged — only the visit order moves, which is exactly what
    near-first traversal with per-lane t-pruning wants (the reference's
    recursion visits both children unconditionally in a fixed order,
    avx/sbvh.cpp:63-82 — a measured 35-45% triangle-test reduction is
    available from ordering alone, accel/bvh._flatten's order_signs
    note). The split axis is recovered as the axis of largest child
    centroid separation."""
    lo, hi = np.asarray(lo), np.asarray(hi)
    skip, start = np.asarray(skip), np.asarray(start)
    M = lo.shape[0]
    cen = 0.5 * (lo + hi)
    order = np.empty(M, np.int64)     # new position -> old node
    pos = 0
    stack = [0]
    while stack:
        i = stack.pop()
        order[pos] = i
        pos += 1
        if start[i] >= 0:
            continue
        left = i + 1
        right = int(skip[left])
        if right >= int(skip[i]):     # single-child chain: nothing to order
            stack.append(left)
            continue
        diff = cen[left] - cen[right]
        axis = int(np.argmax(np.abs(diff)))
        left_is_near = (diff[axis] <= 0) == (signs[axis] > 0)
        first, second = (left, right) if left_is_near else (right, left)
        stack.append(second)
        stack.append(first)           # LIFO: `first` is emitted first
    # subtree sizes are order-invariant, and DFS subtrees stay
    # contiguous: skip_new[p] = p + (skip_old[i] - i)
    sizes = skip[order] - order
    new_skip = (np.arange(M) + sizes).astype(np.int32)
    return lo[order], hi[order], new_skip, start[order].astype(np.int32)


def collapse_skip_levels(lo, hi, skip, start):
    """Drop every other INTERNAL level from a flattened skip-pointer
    layout (a 4-ary flatten of the same binary tree): ~23% fewer node
    steps on sorted bounce wavefronts with IDENTICAL leaf visits
    (experiments/exp_quad_sim.py — the dropped boxes' tests were
    block-redundant), against the 292 ns serial scalar chain each step
    costs (exp_walk_anatomy). The walk code is unchanged: arity lives
    entirely in the (skip, start) encoding."""
    lo, hi = np.asarray(lo), np.asarray(hi)
    skip, start = np.asarray(skip), np.asarray(start)
    M = lo.shape[0]
    depth = np.zeros(M, np.int64)
    stack = [(0, 0)]
    while stack:
        i, d = stack.pop()
        depth[i] = d
        if start[i] >= 0:
            continue
        left = i + 1
        right = int(skip[left])
        stack.append((left, d + 1))
        if right < int(skip[i]):
            stack.append((right, d + 1))
    keep = (start >= 0) | (depth % 2 == 0)
    new_idx = np.cumsum(keep) - 1
    Mp = int(keep.sum())
    nxt = np.full(M + 1, Mp, np.int64)   # next kept node at/after j
    acc = Mp
    for j in range(M - 1, -1, -1):
        if keep[j]:
            acc = int(new_idx[j])
        nxt[j] = acc
    skip2 = np.asarray([nxt[int(skip[j])] for j in range(M) if keep[j]],
                       np.int32)
    return (lo[keep], hi[keep], skip2, start[keep].astype(np.int32))


def bvh_path_device_data(scene: Scene, *, strategy: str = SAH,
                         order_signs=(1.0, 1.0, 1.0),
                         check_cap: bool = True, with_bvh: bool = False,
                         octants: int = 1,
                         leaf_width: int = LEAF_WIDTH):
    """(node_scalars tuple, tab, num_nodes[, bvh]): the replicated device
    inputs every chip's kernel shares (with_bvh additionally returns the
    host-side tree, for in-graph material-row updaters).

    octants=8 emits 8 concatenated per-octant flattenings of the one
    tree (reflatten_octant x collapse_skip_levels per copy, shared
    bundled table); pass the matching octant_copies=8 to the kernels.
    num_nodes is then the TOTAL (8x per-copy) length."""
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=strategy,
                       leaf_size=leaf_width, leaf_width=leaf_width,
                       order_signs=order_signs)
    if check_cap and bvh.num_bundled > RESIDENT_MAX_BUNDLED:
        raise ValueError(
            f"{bvh.num_bundled} bundled rows exceed the path attr-table "
            f"residency cap ({RESIDENT_MAX_BUNDLED})")
    tab_np = pack_bvh_path_table(bvh, scene)
    tab = jnp.asarray(tab_np)
    if octants == 1:
        n_lo, n_hi, n_skip, n_start = collapse_skip_levels(
            bvh.node_lo, bvh.node_hi, bvh.node_skip, bvh.node_start)
    else:
        copies = []
        for o in range(octants):
            signs = tuple(1.0 if (o >> a) & 1 else -1.0
                          for a in range(3))
            copies.append(collapse_skip_levels(*reflatten_octant(
                bvh.node_lo, bvh.node_hi, bvh.node_skip,
                bvh.node_start, signs)))
        Mp = copies[0][0].shape[0]
        assert all(c[0].shape[0] == Mp for c in copies), \
            "octant copies must collapse to equal lengths"
        n_lo = np.concatenate([c[0] for c in copies])
        n_hi = np.concatenate([c[1] for c in copies])
        n_skip = np.concatenate(
            [c[2] + np.int32(i * Mp) for i, c in enumerate(copies)])
        n_start = np.concatenate([c[3] for c in copies])
    # bit-0 "no emitter rows" flag on leaf starts (LEAF_WIDTH multiples,
    # low bits free): the NEE shadow walk skips the winner-row/emitter
    # reduces on leaves that cannot contain the light. Padding rows
    # carry mesh 0; if mesh 0 is emissive they read as emitter rows —
    # conservative (flag stays 0 = full path).
    em_ids = set(int(m) for m in np.asarray(scene.emissive_mesh_ids)
                 [:scene.num_emissive])
    mesh_row = tab_np[_C_MESH]
    B_pad = mesh_row.shape[0]
    is_em_row = np.isin(mesh_row.astype(np.int64), sorted(em_ids))
    for i in range(n_start.shape[0]):
        st0 = int(n_start[i])
        if st0 >= 0 and not is_em_row[st0:st0 + leaf_width].any():
            n_start[i] = st0 | 1
    node_scalars = tuple(
        [jnp.asarray(n_lo[:, i]) for i in range(3)]
        + [jnp.asarray(n_hi[:, i]) for i in range(3)]
        + [jnp.asarray(n_skip), jnp.asarray(n_start)])
    if with_bvh:
        return node_scalars, tab, int(n_lo.shape[0]), bvh
    return node_scalars, tab, int(n_lo.shape[0])


def make_bvh_path_renderer(scene: Scene, camera, *, samples: int,
                           max_depth: int, light_samples: int = 2,
                           strategy: str = SAH,
                           ray_block: int = RAY_BLOCK,
                           order_signs=(1.0, 1.0, 1.0),
                           interpret: bool | None = None):
    """Build `fn(key) -> [H, W, 3]`: the whole path-traced render (all
    samples, all bounces, all NEE shadow walks) as one BVH megakernel
    launch. Raises outside the gate (textures / emitters) or past the
    bundled-row residency cap."""
    if not bvh_path_supported(scene):
        raise ValueError("scene outside the bvh-path gate "
                         "(textures / emitters)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    H, W = camera.yres, camera.xres
    n_pix = H * W
    n_pad = ((max(n_pix, ray_block) + ray_block - 1)
             // ray_block) * ray_block

    node_scalars, tab, num_nodes = bvh_path_device_data(
        scene, strategy=strategy, order_signs=order_signs,
        check_cap=not interpret)
    emitter = _emitters_consts(scene)
    cam_v = camera_vec(camera)
    call = build_bvh_path_call(num_nodes, W, H, samples, max_depth,
                               light_samples, emitter, n_pix, n_pad,
                               ray_block, interpret)
    zero_base = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _impl(cv, seed):
        out = call(cv, seed, zero_base, *node_scalars, tab)
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    def render_bvh_path(key, camera_override=None) -> jax.Array:
        cv = cam_v if camera_override is None else camera_vec(
            camera_override)
        return _impl(cv, seed_scalar(key))

    return render_bvh_path
