"""Full reference-README cornell render: 1920x1080, 2048 spp, depth 100,
light samples 2 — the config the reference finished in 5126.4 s
(README.md:40-46). Renders with the fused megakernel in 256-spp chunks
(independent PCG streams per chunk, checkpointed between chunks);
falls back to the regenerative wavefront if the scene leaves the
fused gate."""
import json
import time

import numpy as np
import jax

from orion_tpu.engine import prepare
from orion_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from orion_tpu.io.image import save_image
from orion_tpu.ops.pallas_fused import (fused_path_supported,
                                        make_fused_path_renderer)
from orion_tpu.regen import render_regen

CHUNK = 256
TOTAL = 2048
ps = prepare("/root/reference/assets/cornell-box.rtc")
key = jax.random.key(0)
acc = np.zeros((1080, 1920, 3), np.float32)
done = 0
ck = load_checkpoint("/root/repo/flagship.ckpt")
key_data = np.asarray(jax.random.key_data(key))
if ck is not None and np.array_equal(ck[2], key_data):
    acc, done = np.asarray(ck[0], np.float32), ck[1]
    print(f"resuming at {done} spp", flush=True)

use_fused = fused_path_supported(ps.scene)
if use_fused:
    fused = make_fused_path_renderer(ps.scene, ps.camera, samples=CHUNK,
                                     max_depth=100, light_samples=2,
                                     ray_block=256)

t0 = time.perf_counter()
while done < TOTAL:
    ck_t = time.perf_counter()
    k = jax.random.fold_in(key, done)
    if use_fused:
        img = fused(k)
    else:
        img = render_regen(ps.scene, ps.camera, k, samples=CHUNK,
                           max_depth=100, light_samples=2,
                           intersect=ps.intersect)
    acc = acc + np.asarray(img, np.float32) * CHUNK
    done += CHUNK
    save_checkpoint("/root/repo/flagship.ckpt", acc, done, key_data)
    print(f"{done}/{TOTAL} spp  (+{time.perf_counter()-ck_t:.1f}s, "
          f"total {time.perf_counter()-t0:.1f}s)", flush=True)

final = acc / TOTAL
save_image("/root/repo/renders/cornell_flagship_1080p_2048spp.png", final)
save_image("/root/repo/renders/cornell_flagship_1080p_2048spp.hdr", final)
wall = time.perf_counter() - t0
print(json.dumps({"config": "cornell 1920x1080 2048spp depth100 ls2",
                  "backend": "fused-pallas" if use_fused else "regen",
                  "wall_seconds": round(wall, 1),
                  "reference_seconds": 5126.4,
                  "speedup": round(5126.4 / wall, 2)}), flush=True)
