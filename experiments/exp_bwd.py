"""Profile the forward+backward pass (VERDICT round 1: fwd+bwd was 1.24x
the reference CPU's FORWARD rate — the north-star metric needs >= 3x).

Times, on the cornell 256^2 4spp depth-4 train config:
  - forward-only render
  - baseline value_and_grad
  - value_and_grad with per-bounce jax.checkpoint (remat)
  - value_and_grad with gathers instead of one-hot matmuls in take_rows

Run on TPU: `python experiments/exp_bwd.py`; one JSON line per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from orion_tpu.engine import prepare
    from orion_tpu.optim import make_loss
    from orion_tpu.render import render

    xres = yres = 256
    samples, depth = 4, 4
    primary = xres * yres * samples
    ps = prepare("/root/reference/assets/cornell-box.rtc",
                 xres=xres, yres=yres)
    key = jax.random.key(0)
    target = jnp.zeros((yres, xres, 3), jnp.float32)
    params = {"mat_diffuse": ps.scene.mat_diffuse,
              "tri_v0": ps.scene.tri_v0}

    def timeit(go, iters=5):
        r = go()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = go()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
        return (time.perf_counter() - t0) / iters

    # forward-only anchor
    def fwd():
        return render(ps.scene, ps.camera, key, samples=samples,
                      max_depth=depth, light_samples=2, mode="path",
                      intersect=ps.intersect, prune_zero=False)
    dt = timeit(fwd)
    print(json.dumps({"variant": "forward_only", "seconds": round(dt, 4),
                      "rays_per_s": round(primary / dt, 1)}), flush=True)

    for name, kw in [("grad_baseline", {}), ("grad_remat", {"remat": True}),
                     ("grad_remat_hits", {"remat": "hits"}),
                     ("grad_hits_fold", {"remat": "hits",
                                         "fold_samples": True})]:
        loss = make_loss(ps.scene, ps.camera, samples=samples,
                         max_depth=depth, light_samples=2, mode="path",
                         intersect=ps.intersect, **kw)
        grad_fn = jax.jit(jax.value_and_grad(loss))

        def go():
            return grad_fn(params, key, target)
        dt = timeit(go)
        print(json.dumps({"variant": name, "seconds": round(dt, 4),
                          "fwd_bwd_rays_per_s": round(primary / dt, 1)}),
              flush=True)

    # larger wavefront variants: 512^2 x 1spp (same rays in one wavefront)
    # and 512^2 x 4spp folded (4M rays/step)
    for res, spp, fold in [(512, 1, False), (512, 4, True)]:
        ps2 = prepare("/root/reference/assets/cornell-box.rtc",
                      xres=res, yres=res)
        tgt = jnp.zeros((res, res, 3), jnp.float32)
        loss = make_loss(ps2.scene, ps2.camera, samples=spp, max_depth=depth,
                         light_samples=2, mode="path",
                         intersect=ps2.intersect, remat="hits",
                         fold_samples=fold)
        grad_fn = jax.jit(jax.value_and_grad(loss))
        p2 = {"mat_diffuse": ps2.scene.mat_diffuse,
              "tri_v0": ps2.scene.tri_v0}

        def go2():
            return grad_fn(p2, key, tgt)
        dt = timeit(go2, iters=3)
        n = res * res * spp
        print(json.dumps({"variant": f"grad_hits_{res}x{spp}"
                                     + ("_fold" if fold else ""),
                          "seconds": round(dt, 4),
                          "fwd_bwd_rays_per_s": round(n / dt, 1)}),
              flush=True)

    # gather instead of one-hot matmul in take_rows
    import orion_tpu.ops.intersect as oi
    old = oi.ONE_HOT_MAX_ROWS
    oi.ONE_HOT_MAX_ROWS = 0
    render.clear_cache()  # same static args as baseline: force a retrace
    try:
        loss = make_loss(ps.scene, ps.camera, samples=samples,
                         max_depth=depth, light_samples=2, mode="path",
                         intersect=ps.intersect)
        grad_fn = jax.jit(jax.value_and_grad(loss))

        def go():
            return grad_fn(params, key, target)
        dt = timeit(go)
        print(json.dumps({"variant": "grad_gather_takerows",
                          "seconds": round(dt, 4),
                          "fwd_bwd_rays_per_s": round(primary / dt, 1)}),
              flush=True)
    finally:
        oi.ONE_HOT_MAX_ROWS = old


if __name__ == "__main__":
    main()
