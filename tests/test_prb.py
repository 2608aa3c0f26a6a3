"""PRB megakernel gradients vs reverse-mode AD of the same estimator.

`fused_reference_render` is built from the SAME estimator builders (and
therefore the same PCG4D draws) as the fused forward/PRB kernels, and is
reverse-differentiable (fixed-length scan). AD through it is the exact
oracle for ops/pallas_prb.py's hand-derived adjoints: any disagreement
beyond float noise is a calculus bug, not estimator variance.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_fused import (fused_reference_render,
                                        make_fused_path_renderer,
                                        pack_fused_tri_table_jnp)
from orion_tpu.ops.pallas_prb import (fused_train_supported,
                                      make_fused_grad_fn,
                                      make_fused_train_step)

SAMPLES, DEPTH, LS = 3, 4, 2


@pytest.fixture(scope="module")
def setup(cornell_scene):
    scene, rtc = cornell_scene
    rtc = dataclasses.replace(rtc) if dataclasses.is_dataclass(rtc) else rtc
    rtc.xres, rtc.yres = 24, 16
    cam = camera_from_rtc(rtc)
    key = jax.random.key(3)
    # a non-trivial target so the MSE cotangent isn't symmetric
    target = jnp.asarray(
        np.linspace(0.0, 0.2, 24 * 16 * 3, dtype=np.float32)
        .reshape(16, 24, 3))
    return scene, cam, key, target


def oracle_grads(scene, cam, key, target):
    """Reverse-mode AD of the replica (same estimator, same RNG)."""

    def loss_fn(params):
        s = dataclasses.replace(scene, **params)
        tab = pack_fused_tri_table_jnp(s)
        img = fused_reference_render(s, cam, key, samples=SAMPLES,
                                     max_depth=DEPTH, light_samples=LS,
                                     tab=tab)
        return jnp.mean((img - target) ** 2)

    params = {"mat_diffuse": scene.mat_diffuse,
              "mat_emissive": scene.mat_emissive}
    return loss_fn(params), jax.grad(loss_fn)(params)


def test_gate(setup):
    scene, *_ = setup
    assert fused_train_supported(scene)


def test_prb_grads_match_ad_oracle(setup):
    scene, cam, key, target = setup
    loss_o, g_o = oracle_grads(scene, cam, key, target)

    step = make_fused_train_step(scene, cam, target, samples=SAMPLES,
                                 max_depth=DEPTH, light_samples=LS,
                                 ray_block=128)
    loss_k, g_k = step(key)

    assert float(loss_k) == pytest.approx(float(loss_o), rel=1e-5)
    for name in ("mat_diffuse", "mat_emissive"):
        got = np.asarray(g_k[name])
        want = np.asarray(g_o[name])
        assert got.shape == want.shape
        np.testing.assert_allclose(
            got, want, rtol=2e-4, atol=1e-7,
            err_msg=f"PRB adjoint for {name} disagrees with AD oracle")
    # the gradients are non-trivial (the test would pass vacuously on
    # all-zero outputs otherwise)
    assert float(np.abs(np.asarray(g_o["mat_diffuse"])).max()) > 1e-6
    assert float(np.abs(np.asarray(g_o["mat_emissive"])).max()) > 1e-6


def test_prb_grad_fn_linear_in_cotangent(setup):
    """grads(key, a*cot) == a * grads(key, cot): the PRB kernel is a
    bona fide VJP (linear in the cotangent)."""
    scene, cam, key, target = setup
    gfn = make_fused_grad_fn(scene, cam, samples=SAMPLES, max_depth=DEPTH,
                             light_samples=LS, ray_block=128)
    H, W = cam.yres, cam.xres
    cot = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(H, W, 3)).astype(np.float32))
    g1 = gfn(key, cot)
    g2 = gfn(key, 2.5 * cot)
    for name in g1:
        np.testing.assert_allclose(np.asarray(g2[name]),
                                   2.5 * np.asarray(g1[name]),
                                   rtol=1e-5, atol=1e-8)


def test_prb_descends_on_albedo_recovery(setup):
    """One gradient step against a target rendered with different albedo
    moves mat_diffuse toward the target's value (end-to-end sanity)."""
    scene, cam, key, _ = setup
    # target: the true scene; start: albedo perturbed on material 0
    fwd_true = make_fused_path_renderer(scene, cam, samples=SAMPLES,
                                        max_depth=DEPTH, light_samples=LS,
                                        ray_block=128)
    target = fwd_true(key)

    kd0 = scene.mat_diffuse
    kd_pert = kd0.at[:, 0].multiply(0.6)
    pert = dataclasses.replace(scene, mat_diffuse=kd_pert)
    step = make_fused_train_step(pert, cam, target, samples=SAMPLES,
                                 max_depth=DEPTH, light_samples=LS,
                                 ray_block=128)
    loss, g = step(key)
    assert float(loss) > 0
    # moving opposite the gradient must reduce the (fixed-key) loss
    lr = 0.25
    kd_new = kd_pert - lr * g["mat_diffuse"]
    s2 = dataclasses.replace(scene, mat_diffuse=kd_new)
    fwd2 = make_fused_path_renderer(s2, cam, samples=SAMPLES,
                                    max_depth=DEPTH, light_samples=LS,
                                    ray_block=128)
    img2 = fwd2(key)
    loss2 = float(jnp.mean((img2 - target) ** 2))
    assert loss2 < float(loss)


def test_dynamic_params_step_matches_static(setup):
    scene, cam, key, target = setup
    static = make_fused_train_step(scene, cam, target, samples=SAMPLES,
                                   max_depth=DEPTH, light_samples=LS,
                                   ray_block=128)
    dynamic = make_fused_train_step(scene, cam, target, samples=SAMPLES,
                                    max_depth=DEPTH, light_samples=LS,
                                    ray_block=128, dynamic_params=True)
    l_s, g_s = static(key)
    params = {"mat_diffuse": scene.mat_diffuse,
              "mat_emissive": scene.mat_emissive}
    l_d, g_d = dynamic(params, key)
    assert float(l_s) == pytest.approx(float(l_d), rel=1e-6)
    for name in params:
        np.testing.assert_allclose(np.asarray(g_d[name]),
                                   np.asarray(g_s[name]),
                                   rtol=1e-6, atol=1e-9)


def test_fit_routes_to_prb_and_descends(setup):
    """optim.fit on a fused-gate path scene uses the PRB megakernel and
    recovers a perturbed albedo (loss strictly decreases)."""
    import types

    from orion_tpu.optim import fit, _prb_loss_and_grad

    scene, cam, key, _ = setup
    fwd = make_fused_path_renderer(scene, cam, samples=SAMPLES,
                                   max_depth=DEPTH, light_samples=LS,
                                   ray_block=128)
    target = fwd(key)

    kd_pert = scene.mat_diffuse.at[:, 0].multiply(0.6)
    pert = dataclasses.replace(scene, mat_diffuse=kd_pert)
    ps = types.SimpleNamespace(scene=pert, camera=cam, backend="brute",
                               intersect=None)
    # the router accepts this setup
    assert _prb_loss_and_grad(ps, target, ("mat_diffuse",),
                              samples=SAMPLES, max_depth=DEPTH,
                              light_samples=LS, mode=None,
                              loss_fn=None) is not None
    # seed=3 == the target's key: deterministic objective whose minimum
    # is the true albedo (resample_keys=False holds the key fixed)
    res = fit(ps, target, params=("mat_diffuse",), steps=80,
              learning_rate=0.05, samples=SAMPLES, max_depth=DEPTH,
              light_samples=LS, seed=3, resample_keys=False,
              use_prb=True)
    assert res.losses[-1] < res.losses[0] * 0.3
    # recovered red channel moved toward the true albedo
    err0 = float(jnp.abs(kd_pert - scene.mat_diffuse).sum())
    err1 = float(jnp.abs(res.params["mat_diffuse"]
                         - scene.mat_diffuse).sum())
    assert err1 < err0


def test_fit_use_prb_true_raises_outside_gate(setup):
    import types

    from orion_tpu.optim import fit

    scene, cam, key, target = setup
    ps = types.SimpleNamespace(scene=scene, camera=cam, backend="brute",
                               intersect=None)
    with pytest.raises(ValueError, match="PRB gate"):
        fit(ps, target, params=("tri_v0",), steps=1, use_prb=True)


def test_prb_chunked_sweep_matches_ad_oracle(setup):
    """T_pad > FUSED_CHUNK routes every sweep (forward, NEE shadow,
    replay) through the fori_loop slices; the hand-derived adjoints must
    still match AD of the replica (which chunks identically)."""
    from orion_tpu.ops.pallas_fused import FUSED_CHUNK, _fused_t_pad
    from orion_tpu.scene import subdivide_scene

    scene, cam, key, target = setup
    s2 = subdivide_scene(scene, levels=2)
    assert _fused_t_pad(s2.num_triangles) > FUSED_CHUNK
    assert fused_train_supported(s2, SAMPLES)

    loss_o, g_o = oracle_grads(s2, cam, key, target)
    step = make_fused_train_step(s2, cam, target, samples=SAMPLES,
                                 max_depth=DEPTH, light_samples=LS,
                                 ray_block=128)
    loss_k, g_k = step(key)

    assert float(loss_k) == pytest.approx(float(loss_o), rel=1e-5)
    for name in ("mat_diffuse", "mat_emissive"):
        np.testing.assert_allclose(
            np.asarray(g_k[name]), np.asarray(g_o[name]),
            rtol=2e-4, atol=1e-7,
            err_msg=f"chunked PRB adjoint for {name} vs AD oracle")
    assert float(np.abs(np.asarray(g_o["mat_diffuse"])).max()) > 1e-6
