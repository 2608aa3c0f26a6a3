"""BVH-PRB gradients vs reverse-mode AD of the fused replica.

The BVH train step (ops/pallas_bvh_prb.py) runs the identical estimator
over a tree walk, so its gradients must match AD through
`fused_reference_render` (the brute replica) to the same tolerance as
the brute PRB kernel — the sweeps are value-identical up to nearest-hit
ties.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bvh_prb import (bvh_train_supported,
                                          make_bvh_tab_updater,
                                          make_bvh_train_step)
from orion_tpu.ops.pallas_fused import (fused_reference_render,
                                        pack_fused_tri_table_jnp)
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"
SAMPLES, DEPTH, LS = 3, 3, 2


@pytest.fixture(scope="module")
def setup():
    scene, rtc = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=1)   # 144 tris: a real tree
    rtc.xres, rtc.yres = 24, 16
    cam = camera_from_rtc(rtc)
    key = jax.random.key(3)
    target = jnp.asarray(
        np.linspace(0.0, 0.2, 24 * 16 * 3, dtype=np.float32)
        .reshape(16, 24, 3))
    return scene, cam, key, target


def oracle_grads(scene, cam, key, target):
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
    assert bvh_train_supported(scene, SAMPLES)


def test_tab_updater_matches_pack(setup):
    """update(scene) must reproduce the host-side pack exactly."""
    from orion_tpu.accel.bvh import SAH, build_bvh
    from orion_tpu.ops.pallas_bvh_path import (LEAF_WIDTH,
                                               pack_bvh_path_table)

    scene, *_ = setup
    _, _, update = make_bvh_tab_updater(scene)
    got = np.asarray(update(scene))
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=LEAF_WIDTH, leaf_width=LEAF_WIDTH)
    want = pack_bvh_path_table(bvh, scene)
    np.testing.assert_array_equal(got, want)


def test_bvh_prb_grads_match_ad_oracle(setup):
    scene, cam, key, target = setup
    loss_o, g_o = oracle_grads(scene, cam, key, target)

    step = make_bvh_train_step(scene, cam, target, samples=SAMPLES,
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
            err_msg=f"BVH-PRB adjoint for {name} disagrees with oracle")


def test_fit_routes_past_fused_gate_to_bvh_prb(monkeypatch, setup):
    """optim.fit with use_prb=True on a scene past the brute gate must
    resolve to the BVH-PRB step (not raise, not fall to wavefront AD)."""
    import orion_tpu.ops.pallas_fused as pf
    from orion_tpu.engine import prepare
    from orion_tpu.optim import fit

    scene, cam, key, target = setup
    monkeypatch.setattr(pf, "FUSED_MAX_TRIS", 16)  # 144 tris > gate
    ps = prepare(f"{ASSETS}/cornell-box.rtc", xres=24, yres=16)
    ps = dataclasses.replace(ps, scene=scene, camera=cam)
    res = fit(ps, target, params=("mat_diffuse",), steps=2, samples=2,
              max_depth=2, light_samples=1, use_prb=True)
    assert np.isfinite(res.losses).all()


def test_dynamic_params_step_descends(setup):
    """An optax-style loop over the dynamic-params step must reduce the
    loss (materials move toward the target)."""
    scene, cam, key, target = setup
    step = jax.jit(make_bvh_train_step(
        scene, cam, target, samples=2, max_depth=2, light_samples=1,
        ray_block=128, dynamic_params=True))
    params = {"mat_diffuse": scene.mat_diffuse}
    loss0 = None
    for i in range(8):
        loss, g = step(params, jax.random.key(7))
        if loss0 is None:
            loss0 = float(loss)
        params = {"mat_diffuse": jnp.clip(
            params["mat_diffuse"] - 200.0 * g["mat_diffuse"], 0.0, 1.0)}
    loss_end, _ = step(params, jax.random.key(7))
    assert float(loss_end) < loss0
