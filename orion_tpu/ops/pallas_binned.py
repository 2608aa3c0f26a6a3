"""Binned dense intersection: divergence-free traversal for incoherent rays.

Round-3 answer to VERDICT r2 weak #1 / next #1. The block-uniform BVH
walk (ops/pallas_bvh.py family) advances ONE node pointer per ray block,
so a block of diffuse bounce rays walks the UNION of its lanes' subtrees
— measured ~0.9M rays/s on real bounce wavefronts even after
morton/octant sorting (experiments/exp_bounce_breakdown.py), and a
grouped-pointer kernel is *slower* (scalar-bound; ops/pallas_bvh_g8.py).

This module replaces the walk with work the VPU is actually good at:
dense, maskable, batched triangle tests.

  1. HOST: cut the BVH into K spatial BINS — maximal subtrees whose leaf
     bundles span <= max_rows contiguous rows of the bundled triangle
     table (the DFS flatten makes every subtree's leaves contiguous).
  2. PER SWEEP (jnp): slab-test every ray against all K bin AABBs
     ([N, K] — 0.18 ms at N=1M, K=134), sort each ray's bins by entry t
     (lax.sort pairs, 0.21 ms).
  3. ROUNDS (jnp while_loop): each live ray takes its next-nearest
     untested bin; rays are argsorted by bin id so a Pallas block sees
     1-2 distinct bins; the round kernel tests each lane densely against
     its bin's whole bundle range (no tree walk, no divergence); a ray
     retires when its best t <= the next bin's entry (a bin's triangles
     lie inside its AABB, so t >= entry — standard near-far pruning).

Winner semantics are (min t, then min bundled row) — identical to both
the brute sweep (pallas_fused._make_geom) and the walk (DFS leaf order
== bundled row order with strict improve), so images bit-match the
existing oracles. Attributes are NOT carried through the kernel: the
round kernel returns only (t, winner row); u, v and the attribute
columns are recovered afterwards by ONE [N, 32] gather of the winning
rows from the same packed table (pallas_bvh_path.pack_bvh_path_table)
plus an elementwise Woop re-evaluation (bit-equal: same formula, same
inputs, same op order as ops/woop.woop_tuv inside the kernel).

Measured on the real dumped bounce wavefronts of the 35k-tri subdivided
cornell (experiments/exp_bin_sim.py, max_rows=512 -> K=134): diffuse
rays effectively intersect 1.9-2.1 bins = ~850 bundled rows, vs the
walk's block-union of ~1/3 of the tree. Projected dense-kernel time for
the depth-1 wavefront: 2.7 ms vs the walk's measured 676 ms.

vs the reference: this plays the role of SBVH::intersect's recursive
descent (/root/reference/orion/avx/sbvh.cpp:36-83) for rays that have
lost camera coherence; the reference never faces the problem because
one CPU core traces one ray (SURVEY 2.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.accel.bvh import BVH, SAH, build_bvh
from orion_tpu.ops.pallas_bvh_path import (pack_bvh_path_table,
                                           bvh_path_supported)
from orion_tpu.ops.pallas_bvh_whitted import LEAF_WIDTH
from orion_tpu.ops.pallas_fused import (_BIG, _C_WOOP, _emitters_consts,
                                        seed_scalar)
from orion_tpu.ops.woop import woop_tuv
from orion_tpu.scene import Scene

RAY_BLOCK = 512
MAX_ROWS = 512          # bin size: 4 bundles; measured best tests/ray
_NO_ROW = np.float32(1 << 22)   # winner-row sentinel (exact in f32)


class Bins(NamedTuple):
    """K spatial bins over the bundled triangle table (+1 sentinel row:
    bin K has zero bundles — dead/retired lanes are keyed to it)."""
    lo: np.ndarray        # [K, 3] f32
    hi: np.ndarray        # [K, 3] f32
    row0: np.ndarray      # [K+1] i32, first bundled row (128-aligned)
    n_bundles: np.ndarray  # [K+1] i32, bundles per bin (0 for sentinel)

    @property
    def k(self) -> int:
        return self.lo.shape[0]


def make_bins(bvh: BVH, max_rows: int = MAX_ROWS) -> Bins:
    """Cut the flattened BVH into maximal subtrees spanning <= max_rows
    bundled rows. DFS flatten => subtree(i) = nodes [i, skip(i)) and its
    leaf rows are contiguous."""
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    skip = np.asarray(bvh.node_skip)
    start = np.asarray(bvh.node_start)
    count = np.asarray(bvh.node_count)
    n = int(bvh.num_nodes)

    out_lo, out_hi, out_r0, out_rows = [], [], [], []

    def emit(i: int) -> None:
        end = int(skip[i]) if skip[i] >= 0 else n
        leaves = [j for j in range(i, end) if start[j] >= 0]
        rows = int(sum(count[j] for j in leaves))
        if rows <= max_rows or int(start[i]) >= 0:
            r0 = int(min(start[j] for j in leaves))
            r1 = int(max(start[j] + count[j] for j in leaves))
            assert r1 - r0 == rows, "non-contiguous subtree rows"
            out_lo.append(lo[i])
            out_hi.append(hi[i])
            out_r0.append(r0)
            out_rows.append(rows)
            return
        left = i + 1
        emit(left)
        right = int(skip[left]) if skip[left] >= 0 else n
        if right < end:
            emit(right)

    emit(0)
    row0 = np.array(out_r0 + [0], np.int32)
    nb = np.array([r // LEAF_WIDTH for r in out_rows] + [0], np.int32)
    return Bins(np.stack(out_lo).astype(np.float32),
                np.stack(out_hi).astype(np.float32), row0, nb)


def _make_round_kernel(K: int):
    """One binned round: lanes sorted by bin id; each block scans its
    [blk_lo, blk_hi] bin range, testing every bundle of each bin densely
    against all lanes (lanes outside the bin masked to miss)."""
    def kernel(r0_ref, nb_ref, blo_ref, bhi_ref, st_ref, bi_ref, tab_ref,
               out_ref):
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (LEAF_WIDTH, 1), 0)
        g = pl.program_id(0)
        rb = st_ref.shape[1]
        o = (st_ref[0:1, :], st_ref[1:2, :], st_ref[2:3, :])
        d = (st_ref[3:4, :], st_ref[4:5, :], st_ref[5:6, :])
        lane_bin = bi_ref[0:1, :]

        def bin_body(carry):
            b, t_b, row_b = carry
            in_bin = lane_bin == b
            rstart = r0_ref[b]

            def bundle_body(i, carry):
                t_b, row_b = carry
                off = pl.multiple_of(rstart + i * LEAF_WIDTH, LEAF_WIDTH)
                blk_t = tab_ref[:, pl.ds(off, LEAF_WIDTH)].T  # [W, 32]
                w = tuple(blk_t[:, _C_WOOP + c:_C_WOOP + c + 1]
                          for c in range(13))
                t, _, _ = woop_tuv(o, d, w)                   # [W, RB]
                t = jnp.where(in_bin, t, _BIG)
                t_min = jnp.min(t, axis=0, keepdims=True)
                r_min = jnp.min(
                    jnp.where(t == t_min, row_idx, jnp.int32(1 << 30)),
                    axis=0, keepdims=True)
                row_g = (r_min + off).astype(jnp.float32)
                better = ((t_min < t_b)
                          | ((t_min == t_b) & (row_g < row_b)))
                better = better & (t_min < _BIG)
                return (jnp.where(better, t_min, t_b),
                        jnp.where(better, row_g, row_b))

            t_b, row_b = jax.lax.fori_loop(0, nb_ref[b], bundle_body,
                                           (t_b, row_b))
            return b + 1, t_b, row_b

        _, t_b, row_b = jax.lax.while_loop(
            lambda c: c[0] <= bhi_ref[g], bin_body,
            (blo_ref[g], st_ref[6:7, :], st_ref[7:8, :]))
        out_ref[0:1, :] = t_b
        out_ref[1:2, :] = row_b
        out_ref[2:8, :] = jnp.zeros((6, rb), jnp.float32)

    return kernel


def build_bin_round_call(K: int, n_pad: int, ray_block: int,
                         interpret: bool):
    """(bin_row0 [K+1], bin_nb [K+1], blk_lo [G], blk_hi [G],
    st [16, n_pad], bini [8, n_pad] i32, tab [32, B_pad]) ->
    [8, n_pad] (row 0: improved t, row 1: winner bundled row as f32)."""
    kernel = _make_round_kernel(K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pad // ray_block,),
        in_specs=[pl.BlockSpec((16, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )


def _bin_entries(o, d, lo, hi):
    """Slab entry t of [N] component rays vs [K, 3] boxes -> [N, K]
    (+inf on miss). Same arithmetic shape as the walk's _slab —
    DELIBERATELY including its unguarded divide: a lane with d[a] == 0
    whose origin sits exactly on a bin boundary yields 0*inf = NaN and
    skips that bin, exactly as pallas_bvh_path._slab would skip the
    same node. Keeping the two backends bit-consistent outweighs the
    measure-zero loss (the host model in exp_bin_sim guards with 1e-30
    and may disagree there; accepted, documented per ADVICE r3)."""
    entries = []
    tn = None
    tf = None
    for a in range(3):
        inv = 1.0 / d[a]
        t0 = (lo[None, :, a] - o[a][:, None]) * inv[:, None]
        t1 = (hi[None, :, a] - o[a][:, None]) * inv[:, None]
        lo_a = jnp.minimum(t0, t1)
        hi_a = jnp.maximum(t0, t1)
        tn = lo_a if tn is None else jnp.maximum(tn, lo_a)
        tf = hi_a if tf is None else jnp.minimum(tf, hi_a)
    ok = (tf >= tn) & (tf > 0.0)
    return jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf)


def binned_consts(bins: Bins, tab):
    """The device-array pytree a binned sweep needs. IMPORTANT: pass this
    through jit boundaries as an ARGUMENT — on the axon backend,
    closed-over device arrays become per-call re-staged HLO constants
    (measured 322 ms -> 0.64 ms for one sweep when threaded as args)."""
    return dict(row0=jnp.asarray(bins.row0),
                n_bundles=jnp.asarray(bins.n_bundles),
                lo=jnp.asarray(bins.lo), hi=jnp.asarray(bins.hi),
                tab=tab)


def binned_sweep_from(consts, *, k: int, n_rays: int, call,
                      ray_block: int, max_rounds: int | None = None):
    """A jnp-level geometry sweep with _make_geom's contract:
    sweep(o, d, attr_cols, alive=None, t_init=None) ->
        (t, hit, u, v, {col: plane})   [planes shaped like o/d]
    plus sweep.any_hit(o, d, alive=None).

    Internally: per-ray bins sorted by entry t once, then rounds of
    (argsort lanes by bin | dense round kernel | scatter) under a
    while_loop until every ray has either a hit closer than its next
    bin or no bins left.

    Call this INSIDE the enclosing jit with `consts` (binned_consts)
    passed in as a jit argument; `call` and `k` are static (from
    build_bin_round_call / Bins.k)."""
    K = k
    n_pad = ((max(n_rays, ray_block) + ray_block - 1)
             // ray_block) * ray_block
    G = n_pad // ray_block
    r0c = consts["row0"]
    nbc = consts["n_bundles"]
    lo_c = consts["lo"]
    hi_c = consts["hi"]
    tab = consts["tab"]
    tabT = tab.T                                   # [B_pad, 32]
    B_pad = tab.shape[1]
    bin_iota = jnp.arange(K, dtype=jnp.int32)

    def _closest(o, d, alive, cap):
        shape = jnp.broadcast_shapes(o[0].shape, d[0].shape)
        of = [jnp.broadcast_to(p, shape).reshape(-1) for p in o]
        df = [jnp.broadcast_to(p, shape).reshape(-1) for p in d]
        N = of[0].shape[0]
        assert N == n_rays, (N, n_rays)

        entry = _bin_entries(of, df, lo_c, hi_c)   # [N, K]
        entry = jnp.where(entry >= cap, jnp.inf, entry)
        if alive is not None:
            af = jnp.broadcast_to(alive, shape).reshape(-1)
            entry = jnp.where(af[:, None], entry, jnp.inf)
        e_s, ord_s = jax.lax.sort(
            (entry, jnp.broadcast_to(bin_iota, (N, K))),
            num_keys=1, dimension=1)

        pad = n_pad - N
        opad = [jnp.pad(p, (0, pad)) for p in of]
        dpad = [jnp.pad(p, (0, pad), constant_values=1.0) for p in df]
        t0 = jnp.full((N,), cap, jnp.float32)
        if alive is not None:
            t0 = jnp.where(af, t0, -_BIG)
        t0 = jnp.pad(t0, (0, pad), constant_values=-_BIG)
        row0 = jnp.full((n_pad,), _NO_ROW, jnp.float32)
        done0 = jnp.zeros((N,), jnp.int32)

        def body(carry):
            t, row, done, _ = carry
            idx = jnp.minimum(done, K - 1)[:, None]
            nxt = jnp.take_along_axis(e_s, idx, axis=1)[:, 0]
            b = jnp.take_along_axis(ord_s, idx, axis=1)[:, 0]
            live = (nxt < t[:N]) & (done < K)
            key = jnp.where(live, b, K)
            key = jnp.pad(key, (0, pad), constant_values=K)
            perm = jnp.argsort(key)
            key_s = key[perm]
            blk_lo = key_s.reshape(G, ray_block).min(axis=1)
            # hi over REAL bins only: a mixed live/dead block must not
            # scan lo..K-1 (dead lanes carry the K sentinel)
            blk_hi = jnp.where(key_s < K, key_s, -1) \
                .reshape(G, ray_block).max(axis=1)
            st = jnp.zeros((16, n_pad), jnp.float32)
            for i in range(3):
                st = st.at[i].set(opad[i][perm])
                st = st.at[3 + i].set(dpad[i][perm])
            st = st.at[6].set(t[perm]).at[7].set(row[perm])
            bini = jnp.zeros((8, n_pad), jnp.int32).at[0].set(key_s)
            out = call(r0c, nbc, blk_lo, blk_hi, st, bini, tab)
            t = t.at[perm].set(out[0])
            row = row.at[perm].set(out[1])
            done = done + live.astype(jnp.int32)
            return t, row, done, jnp.any(live)

        def cond(carry):
            return carry[3]

        init = (t0, row0, done0, jnp.bool_(True))
        if max_rounds is None:
            t, row, _, _ = jax.lax.while_loop(cond, body, init)
        else:
            carry = init
            for _ in range(max_rounds):
                carry = body(carry)
            t, row, _, _ = carry
        return t[:N], row[:N], shape, of, df

    def sweep(o, d, attr_cols, alive=None, t_init=None):
        attr_cols = tuple(attr_cols)
        cap = _BIG if t_init is None else np.float32(t_init)
        t, row, shape, of, df = _closest(o, d, alive, cap)
        hit = t < cap
        if alive is not None:
            hit = hit & jnp.broadcast_to(alive, shape).reshape(-1)
        rowi = jnp.clip(row.astype(jnp.int32), 0, B_pad - 1)
        g32 = tabT[rowi]                           # [N, 32]
        w = tuple(g32[:, _C_WOOP + c] for c in range(13))
        _, u, v = woop_tuv(tuple(of), tuple(df), w)
        hf = hit.astype(jnp.float32)
        got = {c: (g32[:, c] * hf).reshape(shape) for c in attr_cols}
        return (jnp.where(hit, t, _BIG).reshape(shape),
                hit.reshape(shape), (u * hf).reshape(shape),
                (v * hf).reshape(shape), got)

    def any_hit(o, d, alive=None):
        t, _, shape, _, _ = _closest(o, d, alive, _BIG)
        hit = t < _BIG
        if alive is not None:
            hit = hit & jnp.broadcast_to(alive, shape).reshape(-1)
        return hit.reshape(shape)

    sweep.any_hit = any_hit
    sweep.closest = _closest
    return sweep


def binned_device_data(scene: Scene, *, strategy: str = SAH,
                       max_rows: int = MAX_ROWS):
    """(bins, tab [32, B_pad], bvh) — shares the walk kernels' packed
    table layout so attribute columns mean the same thing everywhere."""
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=strategy,
                       leaf_size=LEAF_WIDTH, leaf_width=LEAF_WIDTH)
    tab = jnp.asarray(pack_bvh_path_table(bvh, scene))
    # winner rows ride the kernel as f32 with sentinel _NO_ROW = 2^22:
    # beyond that, real rows would collide with the sentinel in
    # tie-breaks (and past 2^24 the f32 encoding itself goes inexact,
    # silently gathering wrong attribute rows). Fail loudly instead.
    if tab.shape[1] >= int(_NO_ROW):
        raise ValueError(
            f"bundled table has {tab.shape[1]} rows >= the f32 winner-row "
            f"sentinel {int(_NO_ROW)}; the binned backend cannot encode "
            "winners for a scene this large — use the treelet walk")
    return make_bins(bvh, max_rows), tab, bvh


def make_binned_path_renderer(scene: Scene, camera, *, samples: int,
                              max_depth: int, light_samples: int = 2,
                              max_rows: int = MAX_ROWS,
                              ray_block: int = RAY_BLOCK,
                              interpret: bool | None = None):
    """Build `fn(key) -> [H, W, 3]`: path tracing with the binned dense
    sweep — the big-scene backend where bounce rays dominate. Exactly
    pallas_bounce's estimator (same PCG4D streams keyed on pixel/sample/
    depth, same NEE/RR/bounce math via the shared _make_bounce_step), so
    images bit-match the sorted-wavefront kernel and the jnp replica up
    to nearest-hit ties."""
    from orion_tpu.ops.pallas_bounce import (_make_bounce_step,
                                             wavefront_rays)
    from orion_tpu.ops.pallas_fused import camera_vec

    if not bvh_path_supported(scene):
        raise ValueError("scene outside the bvh-path gate "
                         "(textures / emitters)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    H, W = camera.yres, camera.xres
    n_pix = H * W
    N = n_pix * samples

    bins, tab, _ = binned_device_data(scene, max_rows=max_rows)
    emitter = _emitters_consts(scene)
    cam_v = camera_vec(camera)
    n_pad = ((max(N, ray_block) + ray_block - 1)
             // ray_block) * ray_block
    call = build_bin_round_call(bins.k, n_pad, ray_block, interpret)
    consts = binned_consts(bins, tab)

    @jax.jit
    def _impl(seed_arr, consts):
        sweep = binned_sweep_from(consts, k=bins.k, n_rays=N, call=call,
                                  ray_block=ray_block)
        seed = seed_arr[0]
        pix, samp, o, d = wavefront_rays(seed, cam_v, W, H, samples)
        thr = tuple(jnp.ones_like(o[0]) for _ in range(3))
        alive = jnp.ones(o[0].shape, bool)
        acc = [jnp.zeros_like(o[0]) for _ in range(3)]

        step = _make_bounce_step(sweep, emitter, seed, light_samples,
                                 max_depth, fast_shadow=True)

        def body(carry, depth):
            o, d, thr, alive, acc = carry
            rad, o, d, thr, alive = step(pix, samp, depth, o, d, thr,
                                         alive)
            acc = [a + r for a, r in zip(acc, rad)]
            return (o, d, thr, alive, acc), None

        (_, _, _, _, acc), _ = jax.lax.scan(
            body, (o, d, thr, alive, acc),
            jnp.arange(max_depth + 1, dtype=jnp.int32))
        img = jnp.stack([a[0] for a in acc], axis=-1)      # [N, 3]
        return jnp.mean(img.reshape(samples, H, W, 3), axis=0)

    def render_binned(key) -> jax.Array:
        return _impl(seed_scalar(key), consts)

    return render_binned
