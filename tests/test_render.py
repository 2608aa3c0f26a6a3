"""Renderer behavior tests: mode selection, shadows, determinism, energy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from orion_tpu.camera import camera_from_rtc, make_camera
from orion_tpu.io.rtc import RTCData, PointLight
from orion_tpu.render import render, trace_wavefront
from orion_tpu.scene import build_scene
from orion_tpu.io.obj import ObjScene, ObjMesh, MTLMaterial

from tests.test_intersect import UNIT_TRI, scene_from_triangles


def small_camera(rtc, xres=32, yres=32):
    rtc.xres, rtc.yres = xres, yres
    return camera_from_rtc(rtc)


def test_whitted_view_test(view_test_scene):
    scene, rtc = view_test_scene
    cam = small_camera(rtc, 48, 32)
    img = np.asarray(render(scene, cam, jax.random.key(0), samples=1,
                            max_depth=rtc.recursion_level))
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0
    # blue quad occupies the upper-right quadrant; red the lower-left
    upper_right = img[4:12, 28:44]
    lower_left = img[20:28, 4:20]
    assert upper_right[..., 2].mean() > upper_right[..., 0].mean()  # blue-ish
    assert lower_left[..., 0].mean() > lower_left[..., 2].mean()    # red-ish
    # background (top-left quadrant) is empty space -> black
    assert img[2:8, 2:8].max() == 0.0


def test_path_cornell_smoke(cornell_scene):
    scene, rtc = cornell_scene
    cam = small_camera(rtc, 32, 18)
    img = np.asarray(render(scene, cam, jax.random.key(1), samples=4,
                            max_depth=4, light_samples=2))
    assert np.isfinite(img).all()
    assert img.max() > 0
    # ceiling light patch should be the brightest region (depth-0 emissive term)
    top_rows = img[:4].max()
    assert top_rows == pytest.approx(img.max())


def test_determinism(cornell_scene):
    scene, rtc = cornell_scene
    cam = small_camera(rtc, 16, 9)
    a = np.asarray(render(scene, cam, jax.random.key(7), samples=2, max_depth=3))
    b = np.asarray(render(scene, cam, jax.random.key(7), samples=2, max_depth=3))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(render(scene, cam, jax.random.key(8), samples=2, max_depth=3))
    assert np.any(a != c)


def test_mode_auto_selection(view_test_scene, cornell_scene):
    # with lights -> whitted result equals explicit whitted; cornell -> path
    scene, rtc = view_test_scene
    cam = small_camera(rtc, 16, 16)
    auto = np.asarray(render(scene, cam, jax.random.key(0), samples=1, max_depth=1))
    explicit = np.asarray(render(scene, cam, jax.random.key(0), samples=1,
                                 max_depth=1, mode="whitted"))
    np.testing.assert_array_equal(auto, explicit)


def test_shadowing():
    # floor quad + small blocker above it; light above the blocker.
    # pixels under the blocker must be in shadow (darker).
    # CCW seen from above -> normals point +y toward the light
    floor = np.array([
        [[-2, 0, -2], [-2, 0, 2], [2, 0, 2]],
        [[-2, 0, -2], [2, 0, 2], [2, 0, -2]],
    ], np.float32)
    blocker = np.array([
        [[-0.4, 1.0, -0.4], [-0.4, 1.0, 0.4], [0.4, 1.0, 0.4]],
        [[-0.4, 1.0, -0.4], [0.4, 1.0, 0.4], [0.4, 1.0, -0.4]],
    ], np.float32)
    scene = scene_from_triangles(np.concatenate([floor, blocker]))
    # add a light straight above
    import dataclasses
    scene = dataclasses.replace(
        scene,
        light_pos=jnp.array([[0.0, 3.0, 0.0]], jnp.float32),
        light_color=jnp.array([[1.0, 1.0, 1.0]], jnp.float32),
        light_intensity=jnp.array([20.0], jnp.float32),
        num_lights=1,
    )
    # cast explicit rays: one at the floor point under the blocker (shadowed;
    # light's umbra spans |x|,|z| < 0.6), one at a lit floor point
    eye = jnp.array([0.0, 2.5, 3.0], jnp.float32)
    targets = jnp.array([[0.0, 0.0, 0.0],      # shadowed
                         [1.5, 0.0, 0.0]],     # lit
                        jnp.float32)
    orig = jnp.broadcast_to(eye, (2, 3))
    dirs = targets - orig
    radiance = np.asarray(trace_wavefront(scene, orig, dirs, jax.random.key(0),
                                          max_depth=0, mode="whitted"))
    assert np.isfinite(radiance).all()
    shadowed, lit = radiance[0].sum(), radiance[1].sum()
    assert shadowed == 0.0, radiance
    assert lit > 0.1, radiance


def test_emissive_primary_visibility():
    # camera looking straight at an emissive quad: depth-0 term lights it up
    tris = UNIT_TRI.copy()
    scene = scene_from_triangles(tris)
    import dataclasses
    scene = dataclasses.replace(
        scene,
        mat_emissive=jnp.array([[2.0, 1.0, 0.5]], jnp.float32),
        emissive_mesh_ids=jnp.array([0], jnp.int32),
        num_emissive=1,
    )
    cam = make_camera((0.3, 0.3, 1.5), (0.3, 0.3, 0.0), (0, 1, 0), 0.8, 16, 16)
    img = np.asarray(render(scene, cam, jax.random.key(0), samples=1,
                            max_depth=0, mode="path"))
    assert img.max() > 0
    # emission proportional to Ke: channel ratios preserved at the hit
    peak = np.unravel_index(img.sum(-1).argmax(), img.shape[:2])
    px = img[peak]
    assert px[0] / px[1] == pytest.approx(2.0, rel=1e-3)
    assert px[0] / px[2] == pytest.approx(4.0, rel=1e-3)


def test_reference_frame_flag(cornell_scene):
    # reference_frame=True (unnormalized tangent frame) must still render finitely
    scene, rtc = cornell_scene
    cam = small_camera(rtc, 8, 8)
    img = np.asarray(render(scene, cam, jax.random.key(0), samples=2, max_depth=3,
                            reference_frame=True))
    assert np.isfinite(img).all()


def test_sort_bounces_statistical_match(cornell_scene):
    """sort_bounces reorders the wavefront between bounces; same estimator,
    different RNG slot assignment — images agree statistically and are
    deterministic."""
    import jax

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.render import render

    scene, rtc = cornell_scene
    rtc.xres, rtc.yres = 32, 24
    cam = camera_from_rtc(rtc)
    key = jax.random.key(0)
    kw = dict(samples=4, max_depth=4, light_samples=2, mode="path")
    a = np.asarray(render(scene, cam, key, **kw))
    b = np.asarray(render(scene, cam, key, sort_bounces=True, **kw))
    b2 = np.asarray(render(scene, cam, key, sort_bounces=True, **kw))
    np.testing.assert_array_equal(b, b2)  # deterministic
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) < 0.15 * max(a.mean(), 1e-6)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.8


def test_prune_zero_value_identical_and_grad_preserving(view_test_scene):
    """Whitted zero-throughput pruning: bit-identical image, and
    prune_zero=False keeps d(image)/d(specular) nonzero at specular == 0."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.render import render

    scene, rtc = view_test_scene
    rtc.xres, rtc.yres = 24, 16
    cam = camera_from_rtc(rtc)
    # zero ALL specular so every reflection subpath is pruned
    scene0 = dataclasses.replace(
        scene, mat_specular=jnp.zeros_like(scene.mat_specular))
    key = jax.random.key(0)
    kw = dict(samples=1, max_depth=3, light_samples=1, mode="whitted")

    a = np.asarray(render(scene0, cam, key, prune_zero=True, **kw))
    b = np.asarray(render(scene0, cam, key, prune_zero=False, **kw))
    np.testing.assert_array_equal(a, b)

    def mean_img(spec, prune):
        s = dataclasses.replace(scene, mat_specular=spec)
        return jnp.mean(render(s, cam, key, prune_zero=prune, **kw))

    g_keep = jax.grad(mean_img)(jnp.zeros_like(scene.mat_specular), False)
    assert float(jnp.abs(g_keep).max()) > 0, \
        "specular gradient lost at zero with prune_zero=False"
