"""Textured path scenes through the bounce pipeline (VERDICT r4 next
#4): the reference shades the diffuse texture at every depth in path
mode (/root/reference/orion/material.hpp:95-105); the repo's path
megakernels used to gate textured scenes out to the slow treelet
wavefront. The bounce pipeline now resolves texels in its inter-kernel
gather phase.

Oracle strategy: (a) a texture whose sampled texel is CONSTANT for
every hit (all corner uvs pinned to one texel center) must reproduce
the UNtextured pipeline on a scene with mat_diffuse := that texel,
bitwise — this pins the gather, the per-material atlas metadata
one-hot, the has-map select, and (with negative uvs) the floored-mod
wrap; (b) a real multi-texel checker must agree statistically with the
treelet wavefront renderer (different RNG streams, same estimator).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer
from orion_tpu.scene import load_scene, subdivide_scene


def _with_texture(scene, tex, uv0, uv1, uv2, mats=None):
    """Attach one texture image as the whole atlas, map the given (or
    all) materials to it, and install per-corner uvs."""
    M = int(np.asarray(scene.mat_diffuse).shape[0])
    mm = np.full(M, -1, np.int32)
    mm[np.arange(M) if mats is None else np.asarray(mats)] = 0
    h, w = tex.shape[:2]
    return dataclasses.replace(
        scene,
        tex_atlas=jnp.asarray(tex, jnp.float32),
        tex_off=jnp.zeros((1, 2), jnp.int32),
        tex_hw=jnp.asarray([[h, w]], jnp.int32),
        mat_map_diffuse=jnp.asarray(mm),
        uv0=jnp.asarray(uv0, jnp.float32),
        uv1=jnp.asarray(uv1, jnp.float32),
        uv2=jnp.asarray(uv2, jnp.float32))


@pytest.fixture(scope="module")
def cornell2(assets_dir):
    scene, r = load_scene(assets_dir / "cornell-box.rtc")
    return subdivide_scene(scene, levels=2), r


@pytest.mark.parametrize("uv_base", [(0.5, 0.5), (-1.5, -2.5)])
def test_constant_texel_matches_solid_kd_bitwise(cornell2, uv_base):
    """All corner uvs pinned to texel (1,1) of a 4x4 texture (via the
    in-range center or an equivalent negative wrap — floored-mod maps
    -1.5+2 -> 0.5); the textured render must equal the untextured
    render with mat_diffuse := that texel's color."""
    scene, r = cornell2
    r.xres = r.yres = 24
    cam = camera_from_rtc(r)
    key = jax.random.key(2)
    T = int(np.asarray(scene.tri_v0).shape[0])

    tex = np.zeros((4, 4, 3), np.float32)
    tex[...] = 0.9                      # everywhere-bright: wrong texel
    texel = np.array([0.25, 0.5, 0.125], np.float32)
    tex[1, 1] = texel                   # the target texel
    # uv (0.375, 0.375) -> floor(.375*4)=1 on both axes; the negative
    # base tests the wrap: -1.625*4 = -6.5 -> floor -7 -> mod 4 = 1
    uvc = np.array(uv_base, np.float32) * 0 + (
        np.array([0.375, 0.375], np.float32) if uv_base[0] > 0
        else np.array([-1.625, -1.625], np.float32))
    uv = np.broadcast_to(uvc, (T, 2)).copy()

    # exclude emissive meshes from the texture (gate keeps ke solid;
    # kd on the light barely matters but keep the oracle exact)
    em = set(int(i) for i in np.asarray(scene.emissive_mesh_ids)
             [:scene.num_emissive])
    mats = [m for m in range(int(np.asarray(scene.mat_diffuse).shape[0]))
            if m not in em]

    tex_scene = _with_texture(scene, tex, uv, uv, uv, mats=mats)
    img_tex = np.asarray(make_bounce_path_renderer(
        tex_scene, cam, samples=2, max_depth=3)(key))

    kd = np.asarray(scene.mat_diffuse).copy()
    kd[mats] = texel
    solid_scene = dataclasses.replace(scene,
                                      mat_diffuse=jnp.asarray(kd))
    img_solid = np.asarray(make_bounce_path_renderer(
        solid_scene, cam, samples=2, max_depth=3)(key))

    np.testing.assert_array_equal(img_tex, img_solid)


def test_textured_scene_autoroutes_and_differs_from_solid(cornell2):
    """A non-constant checker changes the image (the texels are really
    being read), and the auto gate accepts the textured scene."""
    scene, r = cornell2
    r.xres = r.yres = 24
    cam = camera_from_rtc(r)
    key = jax.random.key(4)
    T = int(np.asarray(scene.tri_v0).shape[0])

    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = 1.0
    tex[1::2, 1::2] = 1.0
    rng = np.random.default_rng(0)
    uv0 = rng.random((T, 2), np.float32)
    uv1 = uv0 + rng.random((T, 2), np.float32) * 0.3
    uv2 = uv0 + rng.random((T, 2), np.float32) * 0.3
    tex_scene = _with_texture(scene, tex, uv0, uv1, uv2)

    img_tex = np.asarray(make_bounce_path_renderer(
        tex_scene, cam, samples=2, max_depth=3)(key))
    img_solid = np.asarray(make_bounce_path_renderer(
        scene, cam, samples=2, max_depth=3)(key))
    assert np.isfinite(img_tex).all()
    assert np.abs(img_tex - img_solid).max() > 1e-4


def test_textured_bounce_matches_wavefront_statistically(cornell2):
    """Multi-texel checker on the big back wall: the bounce pipeline
    (PCG4D streams) and the treelet wavefront (threefry streams) sample
    the same estimator, so their images agree to Monte-Carlo noise."""
    from orion_tpu.engine import select_intersect
    from orion_tpu.render import render

    scene, r = cornell2
    r.xres = r.yres = 32
    cam = camera_from_rtc(r)
    T = int(np.asarray(scene.tri_v0).shape[0])

    tex = np.full((2, 2, 3), 0.1, np.float32)
    tex[0, 0] = (0.9, 0.2, 0.2)
    tex[1, 1] = (0.2, 0.9, 0.2)
    v0 = np.asarray(scene.tri_v0)
    uv0 = v0[:, :2] * 0.35
    v1 = v0 + np.asarray(scene.tri_e1)
    v2 = v0 + np.asarray(scene.tri_e2)
    uv1 = v1[:, :2] * 0.35
    uv2 = v2[:, :2] * 0.35
    tex_scene = _with_texture(scene, tex, uv0, uv1, uv2)

    samples = 64
    img_b = np.asarray(make_bounce_path_renderer(
        tex_scene, cam, samples=samples, max_depth=4)(jax.random.key(0)))
    fn, _, _, _ = select_intersect(tex_scene)
    img_w = np.asarray(render(tex_scene, cam, jax.random.key(1),
                              samples=samples, max_depth=4,
                              light_samples=2, mode="path",
                              intersect=fn))
    # Monte-Carlo agreement: tight on the mean, loose per-pixel
    assert abs(img_b.mean() - img_w.mean()) / img_w.mean() < 0.05
    bright = img_w.mean(axis=-1) > np.percentile(img_w.mean(axis=-1), 50)
    rel = (np.abs(img_b - img_w).mean(axis=-1)[bright]
           / (img_w.mean(axis=-1)[bright] + 1e-3))
    assert np.median(rel) < 0.35, float(np.median(rel))


def test_cli_routes_textured_path_to_bounce(tmp_path, capsys):
    """An on-disk textured path scene (emissive quad + checkered floor,
    no rtc point lights) routes through the CLI to bounce-pallas — the
    reference renders such scenes with per-depth texture reads
    (material.hpp:95-105); before round 5 they fell to the treelet
    wavefront."""
    from orion_tpu.cli import main
    from orion_tpu.io.image import save_image

    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = 1.0
    tex[1::2, 1::2] = 1.0
    save_image(str(tmp_path / "checker.png"), tex)
    (tmp_path / "scene.mtl").write_text(
        "newmtl light\nKd 0.78 0.78 0.78\nKe 4.0 3.5 3.0\n\n"
        "newmtl floor\nKd 0.5 0.5 0.5\nmap_Kd checker.png\n")
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "o floor\n"
        "v -2 0 -2\nv 2 0 -2\nv 2 0 2\nv -2 0 2\n"
        "vt 0 0\nvt 4 0\nvt 4 4\nvt 0 4\n"
        "vn 0 1 0\n"
        "usemtl floor\n"
        "f 1/1/1 3/3/1 2/2/1\nf 1/1/1 4/4/1 3/3/1\n"
        "o light\n"
        "v -1 3 -1\nv 1 3 -1\nv 1 3 1\nv -1 3 1\n"
        "vn 0 -1 0\n"
        "usemtl light\n"
        "f 5/1/2 6/2/2 7/3/2\nf 5/1/2 7/3/2 8/4/2\n")
    (tmp_path / "scene.rtc").write_text(
        "scene.obj\nchecker.png\n3\n24 24\n"
        "0 2.5 4.5\n0 0 0\n0 1 0\n1\n")   # yview is a SCALE (PARITY)
    out = tmp_path / "out.png"
    rc = main([str(tmp_path / "scene.rtc"), "-o", str(out), "-p", "2",
               "--stats"])
    assert rc == 0 and out.exists()
    assert "bounce-pallas" in capsys.readouterr().out
    # the lit checkered floor is actually rendered (not a black frame)
    from orion_tpu.engine import prepare
    from orion_tpu.ops.pallas_bounce import make_bounce_path_renderer

    ps = prepare(str(tmp_path / "scene.rtc"))
    img = np.asarray(make_bounce_path_renderer(
        ps.scene, ps.camera, samples=4, max_depth=3)(jax.random.key(0)))
    assert (img.mean(axis=-1) > 0.05).mean() > 0.2, img.mean()


def test_untextured_gate_unchanged(cornell2):
    """textured=False on a textured scene still raises (the strict
    bvh-path gate), and plain scenes keep routing untextured."""
    scene, r = cornell2
    r.xres = r.yres = 16
    cam = camera_from_rtc(r)
    T = int(np.asarray(scene.tri_v0).shape[0])
    uv = np.zeros((T, 2), np.float32)
    tex_scene = _with_texture(scene, np.ones((2, 2, 3), np.float32),
                              uv, uv, uv)
    with pytest.raises(ValueError):
        make_bounce_path_renderer(tex_scene, cam, samples=1, max_depth=1,
                                  textured=False)
