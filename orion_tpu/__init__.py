"""orion_tpu — a TPU-native differentiable ray tracer.

A from-scratch JAX/XLA/Pallas re-imagining of the capabilities of the
reference C++ CPU ray tracer (StylishTriangles/Orion): `.rtc`/`.obj`/`.mtl`
scene loading, Whitted-style ray tracing with point lights, and BRDF path
tracing with next-event estimation and Russian-roulette termination — plus
capabilities the reference lacks: end-to-end differentiability and multi-chip
sharding over a `jax.sharding.Mesh`.

Architecture (TPU-first, see SURVEY.md §7):
  scene   = immutable SoA arrays in HBM        (orion_tpu.scene)
  render  = jit-compiled pure function         (orion_tpu.render)
  bounces = wavefront iteration over ray batches, not recursion
  kernels = Pallas over 128-wide lanes         (orion_tpu.ops)
  scaling = shard_map over a device mesh       (orion_tpu.parallel)
"""

__version__ = "0.1.0"

from orion_tpu.io.rtc import RTCData, parse_rtc, write_rtc  # noqa: F401
from orion_tpu.scene import Scene, load_scene               # noqa: F401
from orion_tpu.camera import Camera, camera_from_rtc        # noqa: F401
from orion_tpu.engine import (                              # noqa: F401
    PreparedScene,
    prepare,
    render_prepared,
    render_report,
)
from orion_tpu.render import render, trace_wavefront        # noqa: F401
from orion_tpu.regen import (                               # noqa: F401
    render_regen,
    render_regen_shardmap,
)
from orion_tpu.validate import SceneValidationError         # noqa: F401
