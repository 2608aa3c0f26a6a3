"""Closed-form Whitted trainer (ops/prb_whitted.py, VERDICT r4 next
#8) vs reverse-mode AD of the production wavefront estimator."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.engine import prepare
from orion_tpu.ops.prb_whitted import (make_whitted_train_step,
                                       whitted_train_supported)
from orion_tpu.render import render

ASSETS = "/root/reference/assets"
LIGHT = ((0.0, 2.5, 3.0), (100 / 255, 100 / 255, 100 / 255), 32.0)


def _ps_with_light(res=16):
    ps = prepare(f"{ASSETS}/cornell-box.rtc", xres=res, yres=res)
    pos, color, intensity = LIGHT
    scene = dataclasses.replace(
        ps.scene,
        light_pos=jnp.asarray([pos], jnp.float32),
        light_color=jnp.asarray([color], jnp.float32),
        light_intensity=jnp.asarray([intensity], jnp.float32),
        num_lights=1)
    return dataclasses.replace(ps, scene=scene)


def test_gate():
    ps = _ps_with_light()
    assert whitted_train_supported(ps.scene)
    no_light = dataclasses.replace(ps.scene, num_lights=0)
    assert not whitted_train_supported(no_light)


@pytest.mark.parametrize("depth", [0, 2])
def test_whitted_closed_form_matches_ad(depth):
    """Adjoint parity against jax.grad of render(mode='whitted',
    prune_zero=False) — identical estimator, identical jitter streams —
    for all four material tables at once."""
    ps = _ps_with_light(res=16)
    scene = ps.scene
    samples = 2
    key = jax.random.key(3)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.random((16, 16, 3), np.float32))

    step = make_whitted_train_step(scene, ps.camera, target,
                                   samples=samples, max_depth=depth,
                                   intersect=ps.intersect,
                                   shadow_intersect=ps.shadow_intersect)
    names = ("mat_diffuse", "mat_specular", "mat_ambient",
             "mat_emissive")
    params = {k: getattr(scene, k) for k in names}
    loss_cf, g_cf = step(params, key)

    def ad_loss(p):
        s = dataclasses.replace(scene, **p)
        img = render(s, ps.camera, key, samples=samples, max_depth=depth,
                     light_samples=1, mode="whitted",
                     intersect=ps.intersect,
                     shadow_intersect=ps.shadow_intersect,
                     prune_zero=False)
        return jnp.mean((img - target) ** 2)

    loss_ad, g_ad = jax.value_and_grad(ad_loss)(params)
    np.testing.assert_allclose(float(loss_cf), float(loss_ad), rtol=1e-5)
    for k in names:
        a, b = np.asarray(g_cf[k]), np.asarray(g_ad[k])
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5 * scale,
                                   err_msg=k)
    # the chain term actually fires: specular grads nonzero at depth>0
    if depth > 0:
        assert np.abs(np.asarray(g_cf["mat_specular"])).max() > 0


def test_optim_fit_routes_whitted_to_closed_form(monkeypatch):
    """optim.fit picks the closed-form step for a Whitted material fit
    (use_prb='auto'), and the fit converges on a diffuse recovery."""
    import orion_tpu.ops.prb_whitted as pw
    from orion_tpu.optim import fit

    calls = {"n": 0}
    real = pw.make_whitted_train_step

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pw, "make_whitted_train_step", spy)

    ps = _ps_with_light(res=12)
    key = jax.random.key(0)
    target = render(ps.scene, ps.camera, key, samples=2, max_depth=1,
                    light_samples=1, mode="whitted",
                    intersect=ps.intersect,
                    shadow_intersect=ps.shadow_intersect)

    kd = np.asarray(ps.scene.mat_diffuse).copy()
    kd[:] = np.clip(kd * 0.5 + 0.2, 0.05, 0.95)
    ps_p = dataclasses.replace(
        ps, scene=dataclasses.replace(ps.scene,
                                      mat_diffuse=jnp.asarray(kd)))
    res_fit = fit(ps_p, target, params=("mat_diffuse",), steps=40,
                  learning_rate=5e-2, samples=2, max_depth=1,
                  light_samples=1, mode="whitted", seed=0)
    assert calls["n"] == 1, "fit did not route through the closed form"
    assert min(res_fit.losses) < 0.2 * res_fit.losses[0]


def test_use_prb_true_accepts_whitted():
    """use_prb=True (require closed form) no longer raises for Whitted
    material fits."""
    from orion_tpu.optim import fit

    ps = _ps_with_light(res=8)
    target = jnp.zeros((8, 8, 3), jnp.float32)
    res_fit = fit(ps, target, params=("mat_specular",), steps=2,
                  learning_rate=1e-2, samples=1, max_depth=1,
                  light_samples=1, mode="whitted", seed=0, use_prb=True)
    assert len(res_fit.losses) == 2
