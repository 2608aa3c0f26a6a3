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


def test_optim_geometry_on_bvh_backend_refits(assets_dir):
    """Geometry optimization on a BVH backend routes through the
    per-step refit path (round 4; previously fit() refused) — the tree
    VALUES track the moving vertices, so the fit runs and the loss is
    finite. Treelet backends (no single refittable tree) still refuse."""
    import dataclasses as _dc

    import pytest as _pytest

    from orion_tpu.optim import fit

    ps = prepare(assets_dir / "cornell-box.rtc", xres=8, yres=8,
                 force_backend="bvh-pallas")
    res = fit(ps, np.zeros((8, 8, 3), np.float32), params=("tri_v0",),
              steps=1, samples=1, max_depth=1)
    assert np.isfinite(res.losses[0])
    assert res.params["tri_v0"].shape == ps.scene.tri_v0.shape

    ps_treelet = _dc.replace(ps, bvh=None)
    with _pytest.raises(ValueError, match="refittable"):
        fit(ps_treelet, np.zeros((8, 8, 3), np.float32),
            params=("tri_v0",), steps=1, samples=1, max_depth=1)


def test_forced_pallas_over_cap_uses_treelets(assets_dir):
    """An explicit bvh-pallas pin must stay on the Pallas path when the
    scene exceeds the VMEM residency cap — the treelet decomposition, not
    a silent downgrade to bvh-jnp (ADVICE round 1 + VERDICT item 7)."""
    from orion_tpu import engine
    from orion_tpu.engine import select_intersect
    from orion_tpu.scene import load_scene

    scene, _ = load_scene(assets_dir / "nanosuit.rtc")
    old = engine.__dict__.get("jax")
    # off-TPU the cap is not enforced by select_intersect (interpret mode);
    # simulate the TPU branch by monkeypatching default_backend
    class _FakeJax:
        @staticmethod
        def default_backend():
            return "tpu"
    engine.jax = _FakeJax()
    import orion_tpu.ops.pallas_bvh as pb
    cap = pb.RESIDENT_MAX_BUNDLED
    try:
        pb.RESIDENT_MAX_BUNDLED = 8192  # force "over cap" for nanosuit
        fn, backend, bvh, stats = select_intersect(scene,
                                                   force="bvh-pallas")
        assert backend == "bvh-pallas-treelet"
        assert fn.num_treelets > 1
        assert fn.any_hit_variant is not None
    finally:
        pb.RESIDENT_MAX_BUNDLED = cap
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


def test_treelet_intersect_matches_brute():
    """Treelet decomposition (large-scene Pallas path) returns the same
    nearest hits / occlusion as the brute-force oracle."""
    import jax

    from orion_tpu.engine import _make_treelet_intersect
    from orion_tpu.ops.intersect import intersect_brute
    from orion_tpu.scene import make_synthetic_scene

    scene = make_synthetic_scene(3000, seed=3)
    import orion_tpu.ops.pallas_bvh as pb
    cap = pb.RESIDENT_MAX_BUNDLED
    pb.RESIDENT_MAX_BUNDLED = 2048  # force several treelets at 3k tris
    try:
        fn, stats = _make_treelet_intersect(scene, "sah", (1.0, 1.0, 1.0))
        assert fn.num_treelets > 1
        key = jax.random.key(0)
        n = 512
        orig = jax.random.uniform(key, (n, 3), minval=-12.0, maxval=12.0)
        dirs = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))

        h_tree = fn(scene, orig, dirs)
        h_brute = intersect_brute(scene, orig, dirs)
        # rtol: the treelet kernel packs float64-precomputed Woop rows,
        # the brute oracle computes them in f32 under jit — on this
        # random soup's sliver triangles the two roundings diverge up to
        # ~4e-4 in t (both are valid f32 intersections of the same tri)
        np.testing.assert_allclose(np.asarray(h_tree.t),
                                   np.asarray(h_brute.t),
                                   rtol=1e-3, atol=1e-6)
        hit_frac = float(np.mean(np.asarray(h_brute.mask)))
        assert hit_frac > 0.3, f"degenerate test scene (hit {hit_frac})"

        h_any = fn.any_hit_variant(scene, orig, dirs)
        np.testing.assert_array_equal(np.asarray(h_any.mask),
                                      np.asarray(h_brute.mask))
    finally:
        pb.RESIDENT_MAX_BUNDLED = cap


def test_refresh_octant_order(assets_dir):
    """Octant re-bake: no-op for the same camera, rebuilds (with identical
    nearest hits) when the dominant direction flips octant."""
    import jax

    from orion_tpu.camera import primary_rays
    from orion_tpu.engine import refresh_octant_order

    ps = prepare(assets_dir / "nanosuit.rtc", xres=16, yres=16)
    assert ps.backend.startswith("bvh")
    assert refresh_octant_order(ps, ps.camera.front) is ps

    from orion_tpu.engine import octant_signs

    flipped = refresh_octant_order(ps, -np.asarray(ps.camera.front))
    assert flipped is not ps
    assert (tuple(flipped.order_signs)
            == octant_signs(-np.asarray(ps.camera.front)))
    assert tuple(flipped.order_signs) != tuple(ps.order_signs)

    o, d = primary_rays(ps.camera, 0.0, 0.0)
    h1 = ps.intersect(ps.scene, o, d)
    h2 = flipped.intersect(flipped.scene, o, d)
    # traversal order changed; nearest-hit distances must not
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-5, atol=1e-6)


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


def test_big_path_renderer_prefers_bounce(assets_dir):
    """engine.make_big_path_renderer selects the sorted-wavefront bounce
    kernel first (BIG_PATH_ORDER) and its image matches the walk
    megakernel's estimator bit-for-bit up to nearest-hit ties."""
    import jax
    import numpy as np

    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.engine import make_big_path_renderer
    from orion_tpu.scene import load_scene

    scene, rtc = load_scene(assets_dir / "cornell-box.rtc")
    rtc.xres = rtc.yres = 16
    cam = camera_from_rtc(rtc)
    fn, name = make_big_path_renderer(scene, cam, samples=2, max_depth=2,
                                      light_samples=2)
    assert name == "bounce-pallas"
    img = np.asarray(fn(jax.random.key(0)))
    assert np.isfinite(img).all() and img.max() > 0

    fn_w, name_w = make_big_path_renderer(scene, cam, samples=2,
                                          max_depth=2, light_samples=2,
                                          order=("walk",))
    assert name_w == "bvh-path-pallas"
    img_w = np.asarray(fn_w(jax.random.key(0)))
    np.testing.assert_allclose(img, img_w, rtol=1e-5, atol=1e-6)


def test_big_path_renderer_falls_through(assets_dir, monkeypatch):
    """A candidate that raises ValueError falls through to the next."""
    import orion_tpu.ops.pallas_bounce as pb
    from orion_tpu.camera import camera_from_rtc
    from orion_tpu.engine import make_big_path_renderer
    from orion_tpu.scene import load_scene

    def boom(*a, **k):
        raise ValueError("synthetic residency-cap failure")

    monkeypatch.setattr(pb, "make_bounce_path_renderer", boom)
    scene, rtc = load_scene(assets_dir / "cornell-box.rtc")
    rtc.xres = rtc.yres = 8
    cam = camera_from_rtc(rtc)
    _, name = make_big_path_renderer(scene, cam, samples=1, max_depth=1)
    assert name == "bvh-path-pallas"


def test_cli_routes_big_path_to_bounce(assets_dir, tmp_path, monkeypatch):
    """`python -m orion_tpu.cli` on a path scene past the fused gate hits
    the bounce backend (VERDICT r3 next #3). The gate is shrunk so the
    40-tri cornell exercises the big-scene branch at test speed."""
    import orion_tpu.ops.pallas_fused as pf
    from orion_tpu.cli import main

    monkeypatch.setattr(pf, "FUSED_MAX_TRIS", 8)
    out = tmp_path / "out.png"
    rc = main([str(assets_dir / "cornell-box.rtc"), "-o", str(out),
               "-p", "2", "--xres", "16", "--yres", "16", "--depth", "2",
               "--stats"])
    assert rc == 0
    assert out.exists()


def test_cli_big_path_backend_name(assets_dir, tmp_path, monkeypatch,
                                   capsys):
    import orion_tpu.ops.pallas_fused as pf
    from orion_tpu.cli import main

    monkeypatch.setattr(pf, "FUSED_MAX_TRIS", 8)
    out = tmp_path / "out.png"
    rc = main([str(assets_dir / "cornell-box.rtc"), "-o", str(out),
               "-p", "1", "--xres", "8", "--yres", "8", "--depth", "1"])
    assert rc == 0
    assert "bounce-pallas" in capsys.readouterr().out
