"""Round-3: dump real bounce-wavefront rays (orig, dir, alive) per depth
for the subdiv35k cornell path scene, to drive the traversal-design
simulation (exp_union_sim.py). Runs the actual estimator loop (hit ->
NEE skipped -> RR -> cosine bounce) on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.engine import select_intersect
from orion_tpu.ops import shade
from orion_tpu.ops.intersect import hit_attributes
from orion_tpu.render import BIAS
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(7)

    fn, backend, bvh, stats = select_intersect(scene)
    print(f"backend={backend} tris={scene.num_triangles}")

    import sys
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    if spp > 1:
        # production density: spp jittered sample batches folded into one
        # wavefront (matches render(fold_samples=True))
        os_, ds_ = [], []
        for s in range(spp):
            j = jax.random.uniform(jax.random.fold_in(key, 1000 + s), (2,))
            o1, d1 = primary_rays(cam, float(j[0]) * 2 / r.xres,
                                  float(j[1]) * 2 / r.yres)
            os_.append(o1)
            ds_.append(d1)
        orig = jnp.concatenate(os_)
        dirs = jnp.concatenate(ds_)
    else:
        orig, dirs = primary_rays(cam, 0.0, 0.0)
    alive = jnp.ones((orig.shape[0],), bool)
    out = {}

    @jax.jit
    def step(orig, dirs, alive, k):
        hit = fn(scene, orig, dirs, alive=alive)
        attrs = hit_attributes(scene, orig, dirs, hit)
        hit_mask = alive & hit.mask
        kd = shade.diffuse_color(scene, attrs.mat_id, attrs.uv)
        p = jnp.max(kd, axis=-1)
        k_rr, k_dir = jax.random.split(k)
        u_rr = jax.random.uniform(k_rr, p.shape)
        cont = hit_mask & (u_rr <= p)
        u = jax.random.uniform(k_dir, (2,) + p.shape)
        nd = shade.cosine_sample(attrs.s_normal, u[0], u[1])
        no = attrs.point + attrs.s_normal * BIAS
        return (jnp.where(cont[:, None], no, orig),
                jnp.where(cont[:, None], nd, dirs), cont)

    for depth in range(5):
        out[f"orig{depth}"] = np.asarray(orig)
        out[f"dirs{depth}"] = np.asarray(dirs)
        out[f"alive{depth}"] = np.asarray(alive)
        orig, dirs, alive = step(orig, dirs, alive,
                                 jax.random.fold_in(key, depth))
        print(f"depth {depth}: alive={int(np.asarray(alive).sum())}")

    np.savez_compressed("/tmp/bounce_dump.npz", **out)
    # also dump the BVH arrays for the numpy walker
    np.savez_compressed(
        "/tmp/bvh_dump.npz",
        node_lo=np.asarray(bvh.node_lo), node_hi=np.asarray(bvh.node_hi),
        node_skip=np.asarray(bvh.node_skip),
        node_start=np.asarray(bvh.node_start),
        tri_v0=np.asarray(bvh.tri_v0), tri_e1=np.asarray(bvh.tri_e1),
        tri_e2=np.asarray(bvh.tri_e2), tri_orig=np.asarray(bvh.tri_orig),
        leaf_width=bvh.leaf_width, num_nodes=bvh.num_nodes)
    print("saved /tmp/bounce_dump.npz /tmp/bvh_dump.npz")


if __name__ == "__main__":
    main()
