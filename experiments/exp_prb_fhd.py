"""North-star scale check: PRB megakernel training step at 1920x1080.

BASELINE.json's metric is forward+backward rays/s/chip on the cornell
1080p path trace. The committed PRB number (BENCH_DETAILS) is measured
at 256x256 4spp; this measures the same train step at the full 1080p
frame across spp in {1, 2, 4} — larger ray batches amortize fixed kernel
overheads, so the per-chip fwd+bwd throughput here is the honest
headline for the metric as written.

Timing per tpu-tunnel etiquette (dispatch batch, one fetch).
"""

import json
import time

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_prb import make_fused_train_step
from orion_tpu.scene import load_scene

ASSETS = "/root/reference/assets"
DEPTH, LS = 8, 2

scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
rtc.xres, rtc.yres = 1920, 1080
cam = camera_from_rtc(rtc)
n_pix = 1920 * 1080

target = jnp.zeros((1080, 1920, 3), jnp.float32)

for spp in (1, 2, 4):
    step = make_fused_train_step(scene, cam, target, samples=spp,
                                 max_depth=DEPTH, light_samples=LS)
    key = jax.random.key(0)
    loss, grads = step(key)
    _ = float(loss) + float(jnp.sum(grads["mat_diffuse"]))
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        loss, grads = step(jax.random.key(i))
    _ = float(loss) + float(jnp.sum(grads["mat_diffuse"]))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "spp": spp, "seconds": round(dt, 4),
        "fwd_bwd_rays_per_s": round(n_pix * spp / dt, 1),
        "m_rays": round(n_pix * spp / dt / 1e6, 2),
        "finite": bool(jnp.isfinite(grads["mat_diffuse"]).all()),
    }), flush=True)
