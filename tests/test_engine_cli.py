"""Engine backend selection, CLI, checkpoint/resume tests."""

import numpy as np
import pytest

from orion_tpu.engine import BRUTE_MAX_TRIS, prepare, render_prepared


def test_backend_selection_small(assets_dir):
    ps = prepare(assets_dir / "cornell-box.rtc")
    assert ps.scene.num_triangles <= BRUTE_MAX_TRIS
    assert ps.backend == "brute-jnp"  # CPU test env
    assert ps.bvh is None


def test_backend_selection_large(assets_dir):
    ps = prepare(assets_dir / "nanosuit.rtc", load_textures=False)
    assert ps.scene.num_triangles > BRUTE_MAX_TRIS
    assert ps.backend == "bvh-jnp"
    assert ps.bvh is not None
    assert ps.bvh_stats.nodes > 100


def test_render_prepared(assets_dir):
    import jax

    ps = prepare(assets_dir / "view_test.rtc", xres=32, yres=24)
    img = np.asarray(render_prepared(ps, jax.random.key(0), samples=1))
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all() and img.max() > 0


def test_cli_end_to_end(assets_dir, tmp_path):
    from orion_tpu.cli import main

    out = tmp_path / "out.png"
    rc = main([str(assets_dir / "view_test.rtc"), "-o", str(out),
               "-p", "1", "--xres", "32", "--yres", "24", "--stats"])
    assert rc == 0
    assert out.exists()
    from PIL import Image

    img = Image.open(out)
    assert img.size == (32, 24)


def test_cli_forced_bvh_backend(assets_dir, tmp_path):
    from orion_tpu.cli import main

    out = tmp_path / "out.ppm"
    rc = main([str(assets_dir / "cornell-box.rtc"), "-o", str(out),
               "-p", "1", "--xres", "24", "--yres", "16",
               "--backend", "bvh", "--strategy", "median"])
    assert rc == 0
    assert out.exists()


def test_checkpoint_resume_matches_oneshot(assets_dir, tmp_path):
    """Interrupted + resumed accumulation == one uninterrupted render."""
    import jax

    from orion_tpu.io.checkpoint import load_checkpoint, render_accumulate

    ps = prepare(assets_dir / "cornell-box.rtc", xres=24, yres=16)
    key = jax.random.key(3)
    kw = dict(light_samples=1, max_depth=2, mode="path")

    oneshot = render_accumulate(ps, key, samples=4, path=tmp_path / "a.ckpt",
                                every=4, **kw)

    # chunked via small `every`, "interrupted" after the first flush
    p = tmp_path / "b.ckpt"
    render_accumulate(ps, key, samples=2, path=p, every=2, **kw)
    ck = load_checkpoint(p)
    assert ck is not None and ck[1] == 2
    resumed = render_accumulate(ps, key, samples=4, path=p, every=2, **kw)

    np.testing.assert_allclose(resumed, oneshot, rtol=1e-5, atol=1e-6)


def test_checkpoint_ignores_mismatched_seed(assets_dir, tmp_path):
    import jax

    from orion_tpu.io.checkpoint import load_checkpoint, render_accumulate

    ps = prepare(assets_dir / "cornell-box.rtc", xres=16, yres=12)
    p = tmp_path / "c.ckpt"
    kw = dict(light_samples=1, max_depth=1, mode="path")
    render_accumulate(ps, jax.random.key(1), samples=2, path=p, every=2, **kw)
    # different seed must restart, not resume
    img2 = render_accumulate(ps, jax.random.key(2), samples=2, path=p,
                             every=2, **kw)
    fresh = render_accumulate(ps, jax.random.key(2), samples=2,
                              path=tmp_path / "d.ckpt", every=2, **kw)
    np.testing.assert_allclose(img2, fresh, rtol=1e-6)


def test_checkpoint_rejects_mismatched_config(assets_dir, tmp_path):
    """Resuming under different estimator settings (max_depth here) must
    restart — mixing two estimators into one accumulation is silent
    corruption (ADVICE round 1)."""
    import jax

    from orion_tpu.io.checkpoint import render_accumulate

    ps = prepare(assets_dir / "cornell-box.rtc", xres=16, yres=12)
    p = tmp_path / "cfg.ckpt"
    key = jax.random.key(5)
    render_accumulate(ps, key, samples=2, path=p, every=2,
                      light_samples=1, max_depth=1, mode="path")
    # same seed, different depth: must NOT resume the depth-1 accumulation
    img = render_accumulate(ps, key, samples=2, path=p, every=2,
                            light_samples=1, max_depth=3, mode="path")
    fresh = render_accumulate(ps, key, samples=2, path=tmp_path / "f.ckpt",
                              every=2, light_samples=1, max_depth=3,
                              mode="path")
    np.testing.assert_allclose(img, fresh, rtol=1e-6)


def test_optim_rejects_geometry_params_on_bvh_backend(assets_dir):
    """Geometry optimization against a prebuilt BVH closure silently
    intersects stale geometry — fit() must refuse (ADVICE round 1)."""
    import pytest as _pytest

    from orion_tpu.optim import fit

    ps = prepare(assets_dir / "cornell-box.rtc", xres=8, yres=8,
                 force_backend="bvh")
    with _pytest.raises(ValueError, match="tri_v0"):
        fit(ps, np.zeros((8, 8, 3), np.float32), params=("tri_v0",),
            steps=1)


def test_forced_pallas_over_cap_raises(assets_dir):
    """An explicit bvh-pallas pin must raise (not silently downgrade) when
    the scene exceeds the VMEM residency cap (ADVICE round 1)."""
    import dataclasses

    import pytest as _pytest

    from orion_tpu import engine
    from orion_tpu.engine import select_intersect
    from orion_tpu.scene import load_scene

    scene, _ = load_scene(assets_dir / "cornell-box.rtc")
    old = engine.__dict__.get("jax")
    # off-TPU the cap is not enforced by select_intersect (interpret mode);
    # simulate the TPU branch by monkeypatching default_backend
    class _FakeJax:
        @staticmethod
        def default_backend():
            return "tpu"
    engine.jax = _FakeJax()
    try:
        import orion_tpu.ops.pallas_bvh as pb
        cap = pb.RESIDENT_MAX_BUNDLED
        pb.RESIDENT_MAX_BUNDLED = 8  # force "over cap" for the 36-tri box
        with _pytest.raises(ValueError, match="residency cap"):
            select_intersect(scene, force="bvh-pallas")
        pb.RESIDENT_MAX_BUNDLED = cap
    finally:
        engine.jax = old


def test_black_scene_warns_not_raises(tmp_path):
    """A scene with no lights and no emissives renders (black) in the
    reference — validate must warn, not refuse (ADVICE round 1)."""
    import warnings

    from orion_tpu.scene import load_scene
    from orion_tpu.validate import validate_scene

    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    rtc = tmp_path / "tri.rtc"
    rtc.write_text(f"{obj.name}\n-\n1\n8 8\n0 0 2\n0 0 0\n0 1 0\n1\n")
    scene, _ = load_scene(rtc)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        validate_scene(scene)  # must not raise
    assert any("black" in str(x.message) for x in w)


def test_cli_regen(assets_dir, tmp_path):
    from orion_tpu.cli import main

    out = tmp_path / "regen.png"
    rc = main([str(assets_dir / "cornell-box.rtc"), "-o", str(out),
               "-p", "2", "--xres", "24", "--yres", "16", "--regen",
               "--depth", "4"])
    assert rc == 0
    assert out.exists()


def test_cli_shard(assets_dir, tmp_path):
    """--shard renders over the 8 virtual test devices (whitted + regen)."""
    from orion_tpu.cli import main

    out = tmp_path / "shard.png"
    rc = main([str(assets_dir / "view_test.rtc"), "-o", str(out),
               "-p", "1", "--xres", "32", "--yres", "24", "--shard"])
    assert rc == 0 and out.exists()

    out2 = tmp_path / "shard_regen.png"
    rc = main([str(assets_dir / "cornell-box.rtc"), "-o", str(out2),
               "-p", "2", "--xres", "24", "--yres", "16", "--shard",
               "--regen", "--depth", "4"])
    assert rc == 0 and out2.exists()


def test_cli_shard_checkpoint_resume(assets_dir, tmp_path):
    """--shard --checkpoint: sharded chunked accumulation resumes to the
    same image as an uninterrupted sharded run (fixed chunk size)."""
    import jax

    from orion_tpu.io.checkpoint import load_checkpoint, render_accumulate
    from orion_tpu.parallel.sharding import make_mesh

    ps = prepare(assets_dir / "cornell-box.rtc", xres=24, yres=16)
    mesh = make_mesh(jax.devices()[:8])
    key = jax.random.key(11)
    kw = dict(light_samples=1, max_depth=3, mode=None, mesh=mesh)

    oneshot = render_accumulate(ps, key, samples=4, path=tmp_path / "m.ckpt",
                                every=2, **kw)
    p = tmp_path / "n.ckpt"
    render_accumulate(ps, key, samples=2, path=p, every=2, **kw)
    assert load_checkpoint(p)[1] == 2
    resumed = render_accumulate(ps, key, samples=4, path=p, every=2, **kw)
    np.testing.assert_allclose(resumed, oneshot, rtol=1e-5, atol=1e-6)


def test_cli_regen_rejects_whitted(assets_dir, tmp_path):
    from orion_tpu.cli import main

    # view_test.rtc has point lights -> whitted mode; --regen must refuse
    rc = main([str(assets_dir / "view_test.rtc"),
               "-o", str(tmp_path / "x.png"), "--regen"])
    assert rc == 2


def test_checkpoint_regen_resume(assets_dir, tmp_path):
    """Regen accumulation resumes deterministically at fixed chunk size."""
    import jax

    from orion_tpu.io.checkpoint import load_checkpoint, render_accumulate

    ps = prepare(assets_dir / "cornell-box.rtc", xres=24, yres=16)
    key = jax.random.key(5)
    kw = dict(light_samples=1, max_depth=3, mode=None, regen=True)

    oneshot = render_accumulate(ps, key, samples=4, path=tmp_path / "r.ckpt",
                                every=2, **kw)
    p = tmp_path / "s.ckpt"
    render_accumulate(ps, key, samples=2, path=p, every=2, **kw)
    assert load_checkpoint(p)[1] == 2
    resumed = render_accumulate(ps, key, samples=4, path=p, every=2, **kw)
    np.testing.assert_allclose(resumed, oneshot, rtol=1e-5, atol=1e-6)


def test_validation_rejects_degenerate_camera(assets_dir, tmp_path):
    from orion_tpu.validate import SceneValidationError

    # up parallel to view direction: the reference's Gram-Schmidt would
    # divide by zero (math.hpp:313-317); we refuse with a clear error
    bad = tmp_path / "bad.rtc"
    src = (assets_dir / "cornell-box.rtc").read_text().splitlines()
    # line order: obj, texture, depth, res, viewpoint, lookat, up
    idx = [i for i, l in enumerate(src)
           if l.strip() and not l.strip().startswith("#")]
    src[idx[0]] = str(assets_dir / "cornell-box/cornell-box.obj")
    vp = src[idx[4]].split()
    la = src[idx[5]].split()
    up = [float(a) - float(b) for a, b in zip(la, vp)]
    src[idx[6]] = " ".join(str(v) for v in up)
    bad.write_text("\n".join(src) + "\n")
    with pytest.raises(SceneValidationError, match="parallel"):
        prepare(bad)


def test_validation_rejects_empty_scene(tmp_path):
    from orion_tpu.validate import SceneValidationError

    obj = tmp_path / "empty.obj"
    obj.write_text("# nothing\n")
    rtc = tmp_path / "empty.rtc"
    rtc.write_text("empty.obj\nnone.png\n2\n8 8\n0 0 1\n0 0 0\n0 1 0\n1\n")
    with pytest.raises((SceneValidationError, ValueError)):
        prepare(rtc)
