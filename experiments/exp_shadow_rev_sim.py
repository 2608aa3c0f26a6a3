"""Round-4: does REVERSING shadow rays (light -> hit point) shrink the
block-uniform walk union?

Forward NEE shadow rays start at scattered hit points and end at the
light: a 512-lane block's union covers every subtree between its hit
cluster and the light. Reversed rays all START inside the light quad
(origins within ~0.05 scene units) and aim at the (morton-sorted,
clustered) hit points — origin coherence is what slab pruning feeds on.

Feeds on /tmp/bounce_dump.npz + /tmp/bvh_dump.npz (exp_dump_bounces.py):
depth-d origins ARE depth-(d-1) hit points. Light quad taken from the
cornell emitter (mesh id in the dump's tab is unavailable here, so the
light corners are hardcoded from assets/cornell-box.obj's light quad).
Counts while-iters and leaf visits per block for both directions, both
as nearest-hit (production semantics) and any-hit-with-retirement.
"""

import numpy as np

from exp_union_sim import walk_block  # noqa: E402  (same dir execution)


def load():
    b = np.load("/tmp/bounce_dump.npz")
    t = np.load("/tmp/bvh_dump.npz")
    return b, t


def walk_anyhit(orig, dirs, alive, lo, hi, skip, start, v0, e1, e2,
                t_cap=1.0):
    """Any-hit walk with per-lane retirement (occluded lanes stop
    voting); returns (iters, leaf_visits)."""
    M = lo.shape[0]
    occ = np.zeros(orig.shape[0], bool)
    live = alive.copy()
    inv = 1.0 / np.where(np.abs(dirs) < 1e-30, 1e-30, dirs)
    ptr = 0
    iters = 0
    leaves = 0
    while ptr < M:
        iters += 1
        cap = np.where(live & ~occ, t_cap, -np.inf)
        t0 = (lo[ptr][None] - orig) * inv
        t1 = (hi[ptr][None] - orig) * inv
        tmin = np.minimum(t0, t1).max(axis=1)
        tmax = np.maximum(t0, t1).min(axis=1)
        hit = (tmax >= tmin) & (tmax > 0.0) & (tmin < cap)
        any_hit = hit.any()
        s = start[ptr]
        if s >= 0 and any_hit:
            leaves += 1
            W = 128
            tv0, te1, te2 = v0[s:s + W], e1[s:s + W], e2[s:s + W]
            pv = np.cross(dirs[:, None, :], te2[None])
            det = np.einsum("wk,nwk->nw", te1, pv)
            safe = np.where(np.abs(det) > 1e-12, det, 1.0)
            tvec = orig[:, None, :] - tv0[None]
            u = np.einsum("nwk,nwk->nw", tvec, pv) / safe
            qv = np.cross(tvec, te1[None])
            v = np.einsum("nk,nwk->nw", dirs, qv) / safe
            tt = np.einsum("wk,nwk->nw", te2, qv) / safe
            ok = ((np.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
                  & (u + v <= 1) & (tt > 1e-6) & (tt < t_cap))
            occ = occ | (ok.any(axis=1) & live)
        if s < 0 and any_hit:
            ptr += 1
        else:
            ptr = skip[ptr]
        if not (live & ~occ).any():
            break
    return iters, leaves


# cornell light quad (assets/cornell-box obj, mesh "light")
L_LO = np.array([213.0, 548.7, 227.0])
L_HI = np.array([343.0, 548.7, 332.0])


def main():
    b, tree = load()
    lo, hi = tree["node_lo"], tree["node_hi"]
    skip, start = tree["node_skip"], tree["node_start"]
    v0, e1, e2 = tree["tri_v0"], tree["tri_e1"], tree["tri_e2"]
    rng = np.random.default_rng(7)

    for depth in (1, 2):
        hits = b[f"orig{depth}"].astype(np.float64)   # = hit points
        alive = b[f"alive{depth}"]
        n = len(hits)
        u = rng.random((n, 2))
        tx = np.stack([L_LO[0] + u[:, 0] * (L_HI[0] - L_LO[0]),
                       np.full(n, L_LO[1]),
                       L_LO[2] + u[:, 1] * (L_HI[2] - L_LO[2])], axis=1)
        fwd_d = tx - hits
        rev_d = hits - tx

        block = 512
        nb = min(n // block, 48)
        stats = {}
        for name, (o, d, fn) in {
            "fwd-nearest": (hits, fwd_d, walk_block),
            "fwd-anyhit": (hits, fwd_d, walk_anyhit),
            "rev-anyhit": (tx, rev_d, walk_anyhit),
        }.items():
            ti = tl = na = 0
            for bi in range(nb):
                sl = slice(bi * block, (bi + 1) * block)
                if not alive[sl].any():
                    continue
                if fn is walk_block:
                    it, lv = fn(o[sl], d[sl], alive[sl], lo, hi, skip,
                                start, v0, e1, e2)
                else:
                    it, lv = fn(o[sl], d[sl], alive[sl], lo, hi, skip,
                                start, v0, e1, e2)
                ti += it
                tl += lv
                na += alive[sl].sum()
            stats[name] = (ti / nb, tl / nb)
            print(f"depth {depth} {name:<12}: {ti / nb:7.1f} iters/blk "
                  f"{tl / nb:6.1f} leaves/blk", flush=True)


if __name__ == "__main__":
    main()
