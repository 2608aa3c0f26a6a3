"""Round-3: numpy simulation of the packet BVH walk on REAL bounce rays.

Replays the exact block-uniform skip-pointer walk (pallas_bvh.py logic:
descend iff ANY live lane slab-hits with per-lane t-pruning, leaf = 128
Woop/MT tests) per block, counting while-iterations and leaf visits —
the two cost drivers — under different block sizes and sort keys, plus
the proposed G8 design (8 independent 128-lane groups per block,
iterations = max over groups).

Feeds on /tmp/bounce_dump.npz + /tmp/bvh_dump.npz (exp_dump_bounces.py).
"""

import numpy as np


def load():
    b = np.load("/tmp/bounce_dump.npz")
    t = np.load("/tmp/bvh_dump.npz")
    return b, t


def walk_block(orig, dirs, alive, lo, hi, skip, start, v0, e1, e2):
    """Simulate one block; returns (iters, leaf_visits)."""
    M = lo.shape[0]
    n = orig.shape[0]
    t_best = np.where(alive, np.inf, -np.inf)
    inv = 1.0 / np.where(np.abs(dirs) < 1e-30, 1e-30, dirs)
    ptr = 0
    iters = 0
    leaves = 0
    while ptr < M:
        iters += 1
        t0 = (lo[ptr][None] - orig) * inv
        t1 = (hi[ptr][None] - orig) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < t_best)
        any_hit = hit.any()
        s = start[ptr]
        if s >= 0 and any_hit:
            leaves += 1
            # MT vs 128 tris, improve-only
            W = 128
            tv0 = v0[s:s + W]
            te1 = e1[s:s + W]
            te2 = e2[s:s + W]
            pv = np.cross(dirs[:, None, :], te2[None])        # [n,W,3]
            det = np.einsum("wk,nwk->nw", te1, pv)
            safe = np.where(np.abs(det) > 1e-12, det, 1.0)
            tvec = orig[:, None, :] - tv0[None]
            u = np.einsum("nwk,nwk->nw", tvec, pv) / safe
            qv = np.cross(tvec, te1[None])
            v = np.einsum("nk,nwk->nw", dirs, qv) / safe
            tt = np.einsum("wk,nwk->nw", te2, qv) / safe
            ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (tt > 1e-6))
            tt = np.where(ok, tt, np.inf)
            t_best = np.minimum(t_best, tt.min(axis=1))
        if s < 0 and any_hit:
            ptr += 1
        else:
            ptr = skip[ptr]
    return iters, leaves


def simulate(orig, dirs, alive, tree, block, groups=1, limit_blocks=None):
    lo, hi = tree["node_lo"], tree["node_hi"]
    skip, start = tree["node_skip"], tree["node_start"]
    v0, e1, e2 = tree["tri_v0"], tree["tri_e1"], tree["tri_e2"]
    N = orig.shape[0]
    nb = N // block
    if limit_blocks:
        nb = min(nb, limit_blocks)
    tot_iters = 0
    tot_leaves = 0
    g = block // groups
    for b in range(nb):
        sl = slice(b * block, (b + 1) * block)
        if not alive[sl].any():
            tot_iters += 1
            continue
        if groups == 1:
            it, lv = walk_block(orig[sl], dirs[sl], alive[sl],
                                lo, hi, skip, start, v0, e1, e2)
            tot_iters += it
            tot_leaves += lv
        else:
            its = []
            for gi in range(groups):
                s2 = slice(b * block + gi * g, b * block + (gi + 1) * g)
                if not alive[s2].any():
                    its.append(1)
                    continue
                it, lv = walk_block(orig[s2], dirs[s2], alive[s2],
                                    lo, hi, skip, start, v0, e1, e2)
                its.append(it)
                tot_leaves += lv
            tot_iters += max(its)
    n_alive = alive[:nb * block].sum()
    return tot_iters, tot_leaves, nb, n_alive


def morton_key(orig, dirs, alive, s_lo, s_hi, bits=6):
    span = np.maximum(s_hi - s_lo, 1e-20)
    q = np.clip(((orig - s_lo) / span * (1 << bits)).astype(np.int64),
                0, (1 << bits) - 1)
    m = np.zeros(len(orig), np.int64)
    for i in range(bits):
        for a in range(3):
            m |= ((q[:, a] >> i) & 1) << (3 * i + a)
    octant = ((dirs[:, 0] >= 0) + 2 * (dirs[:, 1] >= 0)
              + 4 * (dirs[:, 2] >= 0)).astype(np.int64)
    key = (octant << (3 * bits)) | m
    return np.where(alive, key, np.int64(1) << 62)


def main():
    b, tree = load()
    s_lo = tree["tri_v0"].min(axis=0)
    s_hi = (tree["tri_v0"] + np.maximum(tree["tri_e1"], 0)
            + np.maximum(tree["tri_e2"], 0)).max(axis=0)

    for depth in (1, 2):
        orig = b[f"orig{depth}"].astype(np.float64)
        dirs = b[f"dirs{depth}"].astype(np.float64)
        alive = b[f"alive{depth}"]
        n_alive = alive.sum()
        print(f"=== depth {depth}: {n_alive} alive of {len(alive)}")

        sorts = {
            "none": np.arange(len(alive)),
            "octant": np.argsort(
                np.where(alive,
                         (dirs[:, 0] >= 0) + 2 * (dirs[:, 1] >= 0)
                         + 4 * (dirs[:, 2] >= 0), 8), kind="stable"),
            "morton": np.argsort(morton_key(orig, dirs, alive, s_lo, s_hi),
                                 kind="stable"),
            "morton9": np.argsort(
                morton_key(orig, dirs, alive, s_lo, s_hi, bits=9),
                kind="stable"),
        }
        for name, perm in sorts.items():
            o, d, a = orig[perm], dirs[perm], alive[perm]
            for block, groups in ((256, 1), (512, 1), (128, 1),
                                  (1024, 8), (512, 4)):
                it, lv, nb, na = simulate(o, d, a, tree, block,
                                          groups=groups, limit_blocks=24)
                if na == 0:
                    continue
                print(f"  sort={name:<8} block={block:<5} groups={groups}: "
                      f"{it / nb:8.1f} iters/blk {lv / nb:7.1f} leaves/blk "
                      f"({it / max(na, 1):6.2f} it/aliveray, "
                      f"{lv * 128 / max(na, 1):7.1f} tritests/aliveray)")

    # single-ray ideal on depth-2 alive rays
    orig = b["orig2"].astype(np.float64)
    dirs = b["dirs2"].astype(np.float64)
    alive = b["alive2"]
    idx = np.nonzero(alive)[0][:300]
    it_s, lv_s = 0, 0
    for i in idx:
        it, lv = walk_block(orig[i:i + 1], dirs[i:i + 1], alive[i:i + 1],
                            tree["node_lo"], tree["node_hi"],
                            tree["node_skip"], tree["node_start"],
                            tree["tri_v0"], tree["tri_e1"], tree["tri_e2"])
        it_s += it
        lv_s += lv
    print(f"single-ray ideal (depth2): {it_s / len(idx):.1f} iters, "
          f"{lv_s / len(idx):.2f} leaves, "
          f"{lv_s * 128 / len(idx):.0f} tritests/ray")


if __name__ == "__main__":
    main()
