"""Texture pipeline tests: loading, dedup, sampling, textured rendering."""

import jax
import numpy as np
import pytest

from orion_tpu.camera import camera_from_rtc
from orion_tpu.render import render
from orion_tpu.scene import load_scene


@pytest.fixture(scope="module")
def nanosuit_textured(assets_dir):
    if not (assets_dir / "nanosuit2/body_dif.png").exists():
        pytest.skip("nanosuit textures not present")
    return load_scene(assets_dir / "nanosuit.rtc", load_textures=True)


def test_texture_maps_registered(nanosuit_textured):
    scene, _ = nanosuit_textured
    maps = np.asarray(scene.mat_map_diffuse)
    assert (maps >= 0).any(), "no diffuse texture maps registered"
    # registered images are deduped and sized
    hw = np.asarray(scene.tex_hw)
    spec = np.asarray(scene.mat_map_specular)
    bump = np.asarray(scene.mat_map_bump)
    uniq = len(np.unique(np.concatenate([maps[maps >= 0],
                                         spec[spec >= 0],
                                         bump[bump >= 0]])))
    assert scene.tex_off.shape[0] == uniq  # deduped by path
    assert (hw[:, 0] > 0).all() and (hw[:, 1] > 0).all()


def test_atlas_packing_is_tight_and_correct(nanosuit_textured):
    """Atlas slots hold exactly their source images, don't overlap, and the
    packed footprint beats the old [I, Hmax, Wmax] padded stack."""
    scene, _ = nanosuit_textured
    atlas = np.asarray(scene.tex_atlas)
    off = np.asarray(scene.tex_off)
    hw = np.asarray(scene.tex_hw)
    covered = np.zeros(atlas.shape[:2], np.int32)
    for (y0, x0), (h, w) in zip(off, hw):
        assert y0 + h <= atlas.shape[0] and x0 + w <= atlas.shape[1]
        covered[y0:y0 + h, x0:x0 + w] += 1
    assert covered.max() == 1, "overlapping atlas slots"
    padded_stack_px = len(hw) * hw[:, 0].max() * hw[:, 1].max()
    assert atlas.shape[0] * atlas.shape[1] < padded_stack_px


def test_texture_sampling_varies_with_uv(nanosuit_textured):
    import jax.numpy as jnp

    from orion_tpu.ops.shade import sample_texture

    scene, _ = nanosuit_textured
    maps = np.asarray(scene.mat_map_diffuse)
    img_idx = int(maps[maps >= 0][0])
    n = 256
    key = jax.random.key(0)
    uv = jax.random.uniform(key, (n, 2))
    solid = jnp.zeros((n, 3))
    texels = sample_texture(scene, jnp.full((n,), img_idx, jnp.int32), uv,
                            solid)
    t = np.asarray(texels)
    assert np.isfinite(t).all()
    assert t.std() > 0.01, "texture lookup returned a constant"


def test_texture_wrap_negative_uv(nanosuit_textured):
    """Floored-modulo wrap (PARITY.md fix #2): uv outside [0,1) wraps to the
    same texel as uv + integer."""
    import jax.numpy as jnp

    from orion_tpu.ops.shade import sample_texture

    scene, _ = nanosuit_textured
    maps = np.asarray(scene.mat_map_diffuse)
    img_idx = int(maps[maps >= 0][0])
    uv = jnp.array([[0.25, 0.75], [-0.75, -0.25], [1.25, 1.75]])
    idx = jnp.full((3,), img_idx, jnp.int32)
    texels = np.asarray(sample_texture(scene, idx, uv, jnp.zeros((3, 3))))
    np.testing.assert_allclose(texels[1], texels[0], atol=1e-6)
    np.testing.assert_allclose(texels[2], texels[0], atol=1e-6)


def test_textured_render_differs_from_untextured(assets_dir, nanosuit_textured):
    scene_tex, rtc = nanosuit_textured
    scene_plain, _ = load_scene(assets_dir / "nanosuit.rtc",
                                load_textures=False)
    rtc.xres, rtc.yres = 48, 64
    cam = camera_from_rtc(rtc)
    key = jax.random.key(0)
    img_tex = np.asarray(render(scene_tex, cam, key, samples=1, max_depth=1))
    img_plain = np.asarray(render(scene_plain, cam, key, samples=1,
                                  max_depth=1))
    assert np.isfinite(img_tex).all()
    assert np.abs(img_tex - img_plain).max() > 1e-3


def test_normal_mapping_changes_shading(assets_dir):
    """Opt-in bump mapping (PARITY.md): hindu has a map_Bump; enabling it
    must change lighting while staying finite; scenes without bump maps
    must be unaffected."""
    from orion_tpu.engine import prepare
    from orion_tpu.render import render

    ps = prepare(assets_dir / "hindu.rtc", xres=48, yres=27)
    assert (np.asarray(ps.scene.mat_map_bump) >= 0).any()
    key = jax.random.key(0)
    base = np.asarray(render(ps.scene, ps.camera, key, samples=1,
                             max_depth=1, intersect=ps.intersect))
    bumped = np.asarray(render(ps.scene, ps.camera, key, samples=1,
                               max_depth=1, intersect=ps.intersect,
                               normal_maps=True))
    assert np.isfinite(bumped).all()
    assert np.abs(bumped - base).max() > 1e-3

    ps2 = prepare(assets_dir / "cornell-box.rtc", xres=24, yres=16)
    a = np.asarray(render(ps2.scene, ps2.camera, key, samples=1, max_depth=2,
                          intersect=ps2.intersect))
    b = np.asarray(render(ps2.scene, ps2.camera, key, samples=1, max_depth=2,
                          intersect=ps2.intersect, normal_maps=True))
    np.testing.assert_allclose(b, a, atol=1e-6)


class TestDDS:
    def test_uvmap_dds_decodes(self):
        """The reference's bundled assets/uvmap.DDS (512x512 DXT3)."""
        from orion_tpu.io.image import load_dds, load_texture

        img = load_dds("/root/reference/assets/uvmap.DDS")
        assert img.shape == (512, 512, 3)
        assert img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.std() > 0.05  # non-constant content
        # extension dispatch through the normal texture path
        via = load_texture("/root/reference/assets/uvmap.DDS")
        np.testing.assert_array_equal(via, img)

    def test_dxt1_synthetic_block(self):
        """One hand-built DXT1 block: solid c0 (all indices 0)."""
        import struct

        from orion_tpu.io.image import load_dds

        c0 = (31 << 11) | (0 << 5) | 0          # pure red RGB565
        c1 = 0
        block = struct.pack("<HHI", c0, c1, 0)  # all texels -> palette[0]
        hdr = bytearray(128)
        hdr[0:4] = b"DDS "
        struct.pack_into("<I", hdr, 4, 124)     # header size
        struct.pack_into("<I", hdr, 12, 4)      # height
        struct.pack_into("<I", hdr, 16, 4)      # width
        struct.pack_into("<I", hdr, 80, 0x4)    # DDPF_FOURCC
        hdr[84:88] = b"DXT1"
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".dds") as f:
            f.write(bytes(hdr) + block)
            f.flush()
            img = load_dds(f.name)
        assert img.shape == (4, 4, 3)
        np.testing.assert_allclose(img[..., 0], 1.0, atol=1e-6)
        np.testing.assert_allclose(img[..., 1:], 0.0, atol=1e-6)
