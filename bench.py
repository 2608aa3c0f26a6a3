"""Headline benchmark: Cornell-box BRDF path trace throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
driver; a fuller multi-config report is written to BENCH_DETAILS.json.

Headline config mirrors BASELINE.md config 2 (Cornell 512x512, 16 spp, max
depth 8, light samples 2 — the reference's path-tracing mode,
raytracer.cpp:131-194). The baseline anchor is the reference CPU's 0.83M
primary rays/s derived from its published 1920x1080 @2048spp render in
5126.4 s (README.md:40-46).

Timing methodology: several back-to-back dispatches with ONE value fetch
at the end — on the tunneled TPU, block_until_ready alone does not force
execution, so naive per-call timing under-reports.
"""

import json
import sys
import time

BASELINE_PRIMARY_RAYS_PER_S = 0.83e6  # reference CPU anchor (BASELINE.md)
ASSETS = "/root/reference/assets"


def _time_render(ps, xres, yres, samples, depth, light_samples, mode, iters,
                 regen=False):
    import jax
    import jax.numpy as jnp

    from orion_tpu.render import render

    key = jax.random.key(0)

    if regen:
        if mode not in (None, "path"):
            raise ValueError("regen timing is path-mode only")
        from orion_tpu.regen import render_regen

        def go():
            return render_regen(ps.scene, ps.camera, key, samples=samples,
                                max_depth=depth,
                                light_samples=light_samples,
                                intersect=ps.intersect)
    else:
        def go():
            return render(ps.scene, ps.camera, key, samples=samples,
                          max_depth=depth, light_samples=light_samples,
                          mode=mode, intersect=ps.intersect,
                          shadow_intersect=ps.shadow_intersect)

    img = go()
    assert bool(jnp.isfinite(img).all()), "non-finite radiance"
    _ = float(jnp.sum(img))  # force warmup execution
    t0 = time.perf_counter()
    for _ in range(iters):
        img = go()
    _ = float(jnp.sum(img))  # drain the in-order queue
    return (time.perf_counter() - t0) / iters


def run_config(name, rtc, xres, yres, samples, depth, light_samples,
               iters=3, mode=None, backends=(None,), try_regen=False):
    """Render with each candidate backend (and optionally the regenerative
    wavefront renderer — same estimator, tests/test_regen.py); keep the
    fastest."""
    from orion_tpu.engine import prepare

    best = None
    regen_flags = (False, True) if try_regen else (False,)
    for force in backends:
        try:
            ps = prepare(f"{ASSETS}/{rtc}", xres=xres, yres=yres,
                         force_backend=force)
        except Exception as e:
            print(f"[bench] {name} prepare {force}: {e!r}", file=sys.stderr)
            continue
        for regen in regen_flags:
            try:
                dt = _time_render(ps, xres, yres, samples, depth,
                                  light_samples, mode, iters, regen=regen)
            except Exception as e:
                print(f"[bench] {name} backend {force} regen={regen}: {e!r}",
                      file=sys.stderr)
                continue
            if best is None or dt < best["seconds"]:
                best = {"name": name,
                        "backend": ps.backend + ("+regen" if regen else ""),
                        "seconds": round(dt, 4),
                        "primary_rays_per_s":
                            round(xres * yres * samples / dt, 1)}
    if best is None:
        raise RuntimeError(f"all backends failed for {name}")
    return best


def run_train_config():
    """Forward+backward rays/s — the BASELINE.md north-star metric."""
    import jax
    import jax.numpy as jnp

    from orion_tpu.engine import prepare
    from orion_tpu.optim import make_loss

    xres = yres = 256
    samples, depth = 4, 4
    ps = prepare(f"{ASSETS}/cornell-box.rtc", xres=xres, yres=yres)
    loss = make_loss(ps.scene, ps.camera, samples=samples, max_depth=depth,
                     light_samples=2, mode="path", intersect=ps.intersect)
    key = jax.random.key(0)
    target = jnp.zeros((yres, xres, 3), jnp.float32)
    params = {"mat_diffuse": ps.scene.mat_diffuse,
              "tri_v0": ps.scene.tri_v0}
    grad_fn = jax.jit(jax.value_and_grad(loss))

    l, g = grad_fn(params, key, target)
    _ = float(l)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        l, g = grad_fn(params, key, target)
    _ = float(l) + float(jnp.sum(g["mat_diffuse"]))
    dt = (time.perf_counter() - t0) / iters
    primary = xres * yres * samples
    return {"name": "cornell_fwdbwd_256_4spp", "backend": ps.backend,
            "seconds": round(dt, 4),
            "fwd_bwd_primary_rays_per_s": round(primary / dt, 1)}


def main():
    headline = run_config("cornell_path_512_16spp", "cornell-box.rtc",
                          512, 512, 16, 8, 2,
                          backends=("brute-pallas", "brute-jnp"),
                          try_regen=True)
    # emit the driver's line as soon as the headline lands — later configs
    # must not be able to take it down (the tunnel can wedge mid-run)
    rays_per_s = headline["primary_rays_per_s"]
    print(json.dumps({
        "metric": "cornell_path_512x512_16spp_primary_rays_per_s",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_PRIMARY_RAYS_PER_S, 3),
    }), flush=True)
    details = [headline]
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)
    try:
        details.append(run_train_config())
        details.append(run_config("nanosuit_whitted_1024_4spp",
                                  "nanosuit.rtc", 1024, 1024, 4, 2, 1,
                                  iters=2,
                                  backends=("bvh-pallas", "bvh-jnp")))
        # view_test has point lights => whitted is its real mode (forcing
        # "path" renders black: no emissive meshes, empty estimator)
        details.append(run_config("view_test_whitted_512_4spp",
                                  "view_test.rtc", 512, 512, 4, 4, 2,
                                  mode="whitted", backends=(None,)))
        # deep-depth flagship analogue: regen's structural win (spp x mean
        # path length instead of spp x depth cap)
        details.append(run_config("cornell_path_512_16spp_depth100",
                                  "cornell-box.rtc", 512, 512, 16, 100, 2,
                                  iters=2, backends=("brute-pallas",
                                                     "brute-jnp"),
                                  try_regen=True))
    except Exception as e:  # secondary configs must not break the headline
        details.append({"error": repr(e)})

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
