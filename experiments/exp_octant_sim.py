"""Round-3: does per-block octant-ordered traversal shrink block walks?

Replays the block-uniform walk (exp_union_sim.py) on real rays with
(a) the default-order tree, (b) a tree ordered for each block's majority
direction octant (8 pre-built orderings). Counts while-iters and leaf
visits — the two kernel cost drivers.
"""

import numpy as np

from exp_union_sim import morton_key, walk_block

from orion_tpu.accel.bvh import SAH, build_bvh
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def tree_arrays(bvh):
    return dict(node_lo=np.asarray(bvh.node_lo),
                node_hi=np.asarray(bvh.node_hi),
                node_skip=np.asarray(bvh.node_skip),
                node_start=np.asarray(bvh.node_start),
                tri_v0=np.asarray(bvh.tri_v0),
                tri_e1=np.asarray(bvh.tri_e1),
                tri_e2=np.asarray(bvh.tri_e2))


def simulate(orig, dirs, alive, trees, block, pick_octant,
             limit_blocks=40):
    N = orig.shape[0]
    nb = min(N // block, limit_blocks)
    tot_it = tot_lv = 0
    n_alive = 0
    for b in range(nb):
        sl = slice(b * block, (b + 1) * block)
        if not alive[sl].any():
            tot_it += 1
            continue
        n_alive += alive[sl].sum()
        if pick_octant:
            d = dirs[sl][alive[sl]]
            oc = ((d[:, 0] >= 0).astype(int) + 2 * (d[:, 1] >= 0)
                  + 4 * (d[:, 2] >= 0))
            t = trees[np.bincount(oc, minlength=8).argmax()]
        else:
            t = trees[7]  # (+,+,+) == default order
        it, lv = walk_block(orig[sl], dirs[sl], alive[sl],
                            t["node_lo"], t["node_hi"], t["node_skip"],
                            t["node_start"], t["tri_v0"], t["tri_e1"],
                            t["tri_e2"])
        tot_it += it
        tot_lv += lv
    return tot_it / nb, tot_lv / nb, n_alive / nb


def main():
    b = np.load("/tmp/bounce_dump.npz")
    scene, _ = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)

    trees = {}
    for oc in range(8):
        signs = tuple(1.0 if (oc >> a) & 1 else -1.0 for a in range(3))
        bvh, _ = build_bvh(np.asarray(scene.tri_v0),
                           np.asarray(scene.tri_e1),
                           np.asarray(scene.tri_e2),
                           np.asarray(scene.tri_valid), strategy=SAH,
                           leaf_size=128, leaf_width=128,
                           order_signs=signs)
        trees[oc] = tree_arrays(bvh)
    print(f"nodes={len(trees[0]['node_lo'])}")

    v0 = np.asarray(scene.tri_v0)
    s_lo = v0.min(axis=0)
    s_hi = (v0 + np.maximum(np.asarray(scene.tri_e1), 0)
            + np.maximum(np.asarray(scene.tri_e2), 0)).max(axis=0)

    for depth in (0, 1, 2):
        orig = b[f"orig{depth}"].astype(np.float64)
        dirs = b[f"dirs{depth}"].astype(np.float64)
        alive = b[f"alive{depth}"]
        perm = np.argsort(morton_key(orig, dirs, alive, s_lo, s_hi),
                          kind="stable")
        o, d, a = orig[perm], dirs[perm], alive[perm]
        for block in (256, 512):
            it0, lv0, na = simulate(o, d, a, trees, block, False)
            it1, lv1, _ = simulate(o, d, a, trees, block, True)
            print(f"depth{depth} blk={block}: default {it0:7.1f} it "
                  f"{lv0:6.1f} lv | octant {it1:7.1f} it {lv1:6.1f} lv "
                  f"| alive/blk {na:5.0f}")


if __name__ == "__main__":
    main()
