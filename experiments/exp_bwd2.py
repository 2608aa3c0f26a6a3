"""Backward-pass bisection (round 2): where do the 59 ms of non-forward
time go on the cornell 256^2 4spp d4 train config?

Probes (all remat="hits", which exp_bwd.py measured best at 2.49M):
  - param-set ablation: {mat_diffuse} vs {mat_diffuse, tri_v0}
  - light_samples 2 -> 1 (halves the stacked NEE intersect + its VJP)
  - depth ablation: d2 vs d4
  - XLA cost analysis: flops/bytes of forward vs value_and_grad
Run on TPU: `python experiments/exp_bwd2.py`; JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(go, iters=5):
    import jax
    import jax.numpy as jnp

    r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = go()
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from orion_tpu.engine import prepare
    from orion_tpu.optim import make_loss
    from orion_tpu.render import render

    xres = yres = 256
    samples = 4
    primary = xres * yres * samples
    ps = prepare("/root/reference/assets/cornell-box.rtc",
                 xres=xres, yres=yres)
    key = jax.random.key(0)
    target = jnp.zeros((yres, xres, 3), jnp.float32)

    def probe(name, params, depth=4, ls=2):
        loss = make_loss(ps.scene, ps.camera, samples=samples,
                         max_depth=depth, light_samples=ls, mode="path",
                         intersect=ps.intersect, remat="hits")
        grad_fn = jax.jit(jax.value_and_grad(loss))
        dt = timeit(lambda: grad_fn(params, key, target))
        print(json.dumps({"probe": name, "seconds": round(dt, 4),
                          "fwd_bwd_rays_per_s": round(primary / dt, 1)}),
              flush=True)
        return dt

    p_full = {"mat_diffuse": ps.scene.mat_diffuse,
              "tri_v0": ps.scene.tri_v0}
    p_mat = {"mat_diffuse": ps.scene.mat_diffuse}
    p_geo = {"tri_v0": ps.scene.tri_v0}

    probe("full_d4_ls2", p_full)
    probe("mat_only_d4_ls2", p_mat)
    probe("geo_only_d4_ls2", p_geo)
    probe("full_d4_ls1", p_full, ls=1)
    probe("full_d2_ls2", p_full, depth=2)

    # forward anchor at same config
    def fwd():
        return render(ps.scene, ps.camera, key, samples=samples,
                      max_depth=4, light_samples=2, mode="path",
                      intersect=ps.intersect, prune_zero=False)
    dt = timeit(fwd)
    print(json.dumps({"probe": "forward_only", "seconds": round(dt, 4)}),
          flush=True)

    # XLA cost analysis: fwd vs grad flops/bytes (compiler estimates)
    try:
        loss = make_loss(ps.scene, ps.camera, samples=samples, max_depth=4,
                         light_samples=2, mode="path",
                         intersect=ps.intersect, remat="hits")
        g = jax.jit(jax.value_and_grad(loss))
        cg = g.lower(p_full, key, target).compile()
        ca_g = cg.cost_analysis()
        f = jax.jit(fwd)
        cf = f.lower().compile()
        ca_f = cf.cost_analysis()

        def pick(ca):
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return {k: ca.get(k) for k in
                    ("flops", "bytes accessed", "transcendentals")}
        print(json.dumps({"probe": "cost_fwd", **pick(ca_f)}), flush=True)
        print(json.dumps({"probe": "cost_grad", **pick(ca_g)}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": "cost_analysis",
                          "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
