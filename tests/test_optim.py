"""Inverse rendering tests: parameter recovery by gradient descent."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.engine import prepare
from orion_tpu.optim import fit
from orion_tpu.render import render


def test_fit_recovers_albedo(assets_dir):
    """Perturb the cornell walls' diffuse albedo; fitting against the
    original render must pull it back (loss shrinks, params move toward
    truth)."""
    ps = prepare(assets_dir / "cornell-box.rtc", xres=32, yres=24)
    key = jax.random.key(0)
    target = render(ps.scene, ps.camera, key, samples=2, max_depth=2,
                    light_samples=1, mode="path", intersect=ps.intersect)

    true_kd = np.asarray(ps.scene.mat_diffuse)
    perturbed = dataclasses.replace(
        ps.scene,
        mat_diffuse=jnp.clip(ps.scene.mat_diffuse * 0.4 + 0.1, 0, 1))
    ps_p = dataclasses.replace(ps, scene=perturbed)

    err0 = float(np.abs(np.asarray(perturbed.mat_diffuse) - true_kd).mean())
    # use_prb=False: this test fixes the key so the objective is
    # deterministic against a WAVEFRONT-rendered target; the PRB kernel
    # draws a different (PCG4D) stream, which would add a noise floor.
    # The PRB-routed fit is covered in tests/test_prb.py.
    result = fit(ps_p, target, params=("mat_diffuse",), steps=40,
                 learning_rate=0.1, samples=2, max_depth=2, light_samples=1,
                 mode="path", resample_keys=False, use_prb=False)

    assert np.isfinite(result.losses).all()
    assert result.losses[-1] < result.losses[0] * 0.5
    err1 = float(np.abs(np.asarray(result.params["mat_diffuse"]) - true_kd)
                 .mean())
    assert err1 < err0 * 0.8
    # projection keeps albedo physical
    kd = np.asarray(result.params["mat_diffuse"])
    assert kd.min() >= 0.0 and kd.max() <= 1.0


def test_fit_emissive_strength(assets_dir):
    """Recover a mis-scaled light emission (radiance is linear in Ke, so
    this must converge fast)."""
    ps = prepare(assets_dir / "cornell-box.rtc", xres=24, yres=16)
    key = jax.random.key(1)
    target = render(ps.scene, ps.camera, key, samples=2, max_depth=2,
                    light_samples=1, mode="path", intersect=ps.intersect)

    dimmed = dataclasses.replace(ps.scene,
                                 mat_emissive=ps.scene.mat_emissive * 0.3)
    ps_d = dataclasses.replace(ps, scene=dimmed)
    result = fit(ps_d, target, params=("mat_emissive",), steps=80,
                 learning_rate=0.5, samples=2, max_depth=2, light_samples=1,
                 mode="path", resample_keys=False, use_prb=False)
    assert result.losses[-1] < result.losses[0] * 0.55
    # the recovered emission moved toward the true (brighter) value
    em_true = np.asarray(ps.scene.mat_emissive)
    em0 = np.asarray(dimmed.mat_emissive)
    em1 = np.asarray(result.params["mat_emissive"])
    assert np.abs(em1 - em_true).sum() < np.abs(em0 - em_true).sum()
