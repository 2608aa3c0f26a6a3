"""Inverse rendering demo: recover wall colors from a target image.

Perturbs the cornell box's diffuse albedos, then fits them back against a
rendered target with Adam — gradients flow through the full path tracer.

Usage: python examples/inverse_rendering.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu import prepare
from orion_tpu.optim import fit
from orion_tpu.render import render

ps = prepare("/root/reference/assets/cornell-box.rtc", xres=64, yres=48)
key = jax.random.key(0)
target = render(ps.scene, ps.camera, key, samples=4, max_depth=3,
                light_samples=2, mode="path", intersect=ps.intersect)

rng = np.random.default_rng(7)
noise = jnp.asarray(rng.uniform(0.1, 0.9, ps.scene.mat_diffuse.shape),
                    jnp.float32)
ps_p = dataclasses.replace(ps, scene=dataclasses.replace(
    ps.scene, mat_diffuse=noise))

true_kd = np.asarray(ps.scene.mat_diffuse)
print("initial albedo error:",
      np.abs(np.asarray(noise) - true_kd).mean().round(4))

result = fit(ps_p, target, params=("mat_diffuse",), steps=120,
             learning_rate=0.05, samples=4, max_depth=3, light_samples=2,
             mode="path",
             callback=lambda i, l: (i % 20 == 0) and print(
                 f"  step {i:3d}  loss {l:.6f}"))

rec_kd = np.asarray(result.params["mat_diffuse"])
print("final loss:", round(result.losses[-1], 6))
print("recovered albedo error:", np.abs(rec_kd - true_kd).mean().round(4))
