"""Round-4: does collapsing the skip tree to 4-ary (drop every other
internal level) cut block-uniform walk iters?

A node step costs 292 ns of serial scalar chain (exp_walk_anatomy);
a 4-ary flatten halves internal-node count at the cost of coarser
skip granularity (a block that misses a dropped level's box now tests
its two children instead). Replays the production walk on the dumped
bounce wavefronts over both flattens and counts iters/leaves.
"""

import numpy as np

from exp_union_sim import morton_key, walk_block


def load():
    b = np.load("/tmp/bounce_dump.npz")
    t = np.load("/tmp/bvh_dump.npz")
    return b, t


def collapse(lo, hi, skip, start):
    """Drop internal nodes at ODD depth from the DFS skip layout.

    DFS order: children follow parents contiguously; skip[i] jumps the
    subtree. Depth is recovered by walking the structure. Kept nodes'
    skip pointers remap to the next kept node at-or-after the old
    target; leaves are always kept."""
    M = lo.shape[0]
    depth = np.zeros(M, np.int64)
    # compute depths: children of i are i+1 (left) and the left's skip
    stack = [(0, 0)]
    while stack:
        i, d = stack.pop()
        depth[i] = d
        if start[i] >= 0:
            continue
        left = i + 1
        right = skip[left]
        stack.append((left, d + 1))
        if right < skip[i]:
            stack.append((right, d + 1))
    keep = (start >= 0) | (depth % 2 == 0)
    new_idx = np.cumsum(keep) - 1
    # next kept node at or after j (M maps to M')
    Mp = int(keep.sum())
    nxt = np.full(M + 1, Mp, np.int64)
    acc = Mp
    for j in range(M - 1, -1, -1):
        if keep[j]:
            acc = new_idx[j]
        nxt[j] = acc
    lo2 = lo[keep]
    hi2 = hi[keep]
    start2 = start[keep]
    skip2 = np.array([nxt[skip[j]] for j in range(M) if keep[j]],
                     np.int64)
    return lo2, hi2, skip2, start2


def main():
    b, tree = load()
    lo, hi = tree["node_lo"], tree["node_hi"]
    skip, start = tree["node_skip"], tree["node_start"]
    v0, e1, e2 = tree["tri_v0"], tree["tri_e1"], tree["tri_e2"]
    lo2, hi2, skip2, start2 = collapse(lo, hi, skip, start)
    print(f"binary nodes {lo.shape[0]} -> collapsed {lo2.shape[0]}",
          flush=True)

    s_lo = v0.min(axis=0)
    s_hi = (v0 + np.maximum(e1, 0) + np.maximum(e2, 0)).max(axis=0)

    for depth in (1, 2):
        orig = b[f"orig{depth}"].astype(np.float64)
        dirs = b[f"dirs{depth}"].astype(np.float64)
        alive = b[f"alive{depth}"]
        perm = np.argsort(morton_key(orig, dirs, alive, s_lo, s_hi),
                          kind="stable")
        orig, dirs, alive = orig[perm], dirs[perm], alive[perm]
        block = 512
        nb = min(len(alive) // block, 32)
        for name, (l_, h_, sk, st) in {
            "binary": (lo, hi, skip, start),
            "4-ary ": (lo2, hi2, skip2, start2),
        }.items():
            ti = tl = 0
            for bi in range(nb):
                sl = slice(bi * block, (bi + 1) * block)
                if not alive[sl].any():
                    continue
                it, lv = walk_block(orig[sl], dirs[sl], alive[sl],
                                    l_, h_, sk, st, v0, e1, e2)
                ti += it
                tl += lv
            # cost model: 292 ns/step + 1.04 us extra per leaf visit
            cost = (ti * 292 + tl * 1040) / nb / 1000
            print(f"depth {depth} {name}: {ti / nb:7.1f} iters/blk "
                  f"{tl / nb:6.1f} leaves/blk  ~{cost:6.1f} us/blk",
                  flush=True)


if __name__ == "__main__":
    main()
