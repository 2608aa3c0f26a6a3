"""Grouped-pointer (G8) traversal kernel (ops/pallas_bvh_g8.py).

Correctness vs the jnp brute oracle, interpret mode. Performance note:
measured on TPU (experiments/exp_g8_bench.py), G8 is SLOWER than the
block-uniform walk (scalar-unit per-iteration work beats the union
savings) — kept as the documented negative result for the per-subgroup
pointer design; the production answer is wavefront sorting
(ops/pallas_bounce.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.accel.bvh import SAH, build_bvh
from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.ops.intersect import intersect_brute
from orion_tpu.ops.pallas_bvh_g8 import make_bvh_intersect_g8
from orion_tpu.scene import load_scene

ASSETS = "/root/reference/assets"


@pytest.mark.parametrize("scene_name", ["view_test", "cornell-box",
                                        "nanosuit"])
def test_g8_interpret(assets_dir, scene_name):
    scene, rtc = load_scene(assets_dir / f"{scene_name}.rtc",
                            load_textures=False)
    rtc.xres, rtc.yres = 48, 32
    cam = camera_from_rtc(rtc)
    orig, dirs = primary_rays(cam, 0.001, 0.001)
    bvh, _ = build_bvh(np.asarray(scene.tri_v0), np.asarray(scene.tri_e1),
                       np.asarray(scene.tri_e2),
                       np.asarray(scene.tri_valid), strategy=SAH,
                       leaf_size=128, leaf_width=128)
    h_ref = intersect_brute(scene, orig, dirs)
    h = make_bvh_intersect_g8(bvh, scene)(scene, orig, dirs)
    m, mr = np.asarray(h.mask), np.asarray(h_ref.mask)
    np.testing.assert_array_equal(m, mr)
    np.testing.assert_allclose(np.where(mr, np.asarray(h.t), 0.0),
                               np.where(mr, np.asarray(h_ref.t), 0.0),
                               rtol=1e-4, atol=1e-5)

    # any-hit variant: same mask
    ha = make_bvh_intersect_g8(bvh, scene, any_hit=True)(scene, orig, dirs)
    np.testing.assert_array_equal(np.asarray(ha.mask), mr)

    # alive-masked
    alive = jnp.asarray(np.arange(orig.shape[0]) % 3 != 0)
    hm = make_bvh_intersect_g8(bvh, scene)(scene, orig, dirs, alive=alive)
    a = np.asarray(alive)
    assert not np.asarray(hm.mask)[~a].any()
    np.testing.assert_array_equal(np.asarray(hm.mask)[a], mr[a])
