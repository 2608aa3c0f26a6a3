"""Multi-chip rendering demo on a virtual device mesh.

Runs the three sharded render paths over an 8-virtual-device CPU mesh
(the same code drives a real TPU pod slice — the mesh just spans real
chips there, see orion_tpu/parallel/distributed.py):

  1. GSPMD (parallel/sharding.py)        — global RNG, bit-identical to 1 chip
  2. shard_map (parallel/shardmap_render.py) — per-chip Pallas-capable path
  3. regenerative wavefront (regen.py)   — per-chip independent termination

Usage: python examples/multichip_render.py [n_devices]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N_DEV}")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from orion_tpu import prepare, render_regen_shardmap
from orion_tpu.parallel.distributed import scaling_report
from orion_tpu.parallel.sharding import make_mesh, render_sharded
from orion_tpu.parallel.shardmap_render import render_shardmap

ps = prepare("/root/reference/assets/cornell-box.rtc", xres=128, yres=96)
key = jax.random.key(0)
kw = dict(samples=4, max_depth=4, light_samples=2)

mesh1 = make_mesh(jax.devices()[:1])
meshN = make_mesh(jax.devices()[:N_DEV])

print(f"devices: {len(jax.devices())}, mesh: {N_DEV}-wide 'rays' axis")

# 1. GSPMD: same key => same image on 1 chip or N (to float tolerance —
# XLA may reorder reductions across shardings)
a = np.asarray(render_sharded(ps.scene, ps.camera, key, mesh=mesh1,
                              mode="path", **kw))
b = np.asarray(render_sharded(ps.scene, ps.camera, key, mesh=meshN,
                              mode="path", **kw))
np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
print(f"GSPMD 1-dev vs {N_DEV}-dev: allclose (max abs diff "
      f"{np.abs(a - b).max():.2e})")

# 2. shard_map: per-chip keys (deterministic per device count)
c = np.asarray(render_shardmap(ps.scene, ps.camera, key, mesh=meshN,
                               mode="path", **kw))
print(f"shard_map mean {c.mean():.5f} (GSPMD mean {a.mean():.5f})")

# 3. regenerative wavefront, sharded
d = np.asarray(render_regen_shardmap(ps.scene, ps.camera, key, mesh=meshN,
                                     intersect=ps.intersect, **kw))
print(f"regen shard_map mean {d.mean():.5f}")


# scaling report: each mesh is a separate compilation, so warm up each
# config before timing (otherwise the 'speedup' is a ratio of XLA compile
# times). Virtual devices share host cores — efficiency here is
# illustrative; on a pod slice each mesh entry is a real chip.
def timed(mesh):
    np.asarray(render_regen_shardmap(ps.scene, ps.camera, key, mesh=mesh,
                                     intersect=ps.intersect, **kw))  # warm
    t0 = time.perf_counter()
    np.asarray(render_regen_shardmap(ps.scene, ps.camera, key, mesh=mesh,
                                     intersect=ps.intersect, **kw))
    return time.perf_counter() - t0


t1, tN = timed(mesh1), timed(meshN)
print("scaling:", scaling_report(t1, tN, N_DEV))
