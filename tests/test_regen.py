"""Regenerative wavefront renderer tests (orion_tpu/regen.py)."""

import jax
import numpy as np
import pytest

from orion_tpu.engine import prepare
from orion_tpu.regen import render_regen
from orion_tpu.render import render


@pytest.fixture(scope="module")
def cornell_ps(assets_dir):
    return prepare(assets_dir / "cornell-box.rtc", xres=48, yres=32)


def test_regen_statistical_match(cornell_ps):
    """Same estimator as the standard per-pixel-jitter path tracer: means
    agree at the MC level, image structure correlates."""
    ps = cornell_ps
    key = jax.random.key(0)
    kw = dict(samples=24, max_depth=6, light_samples=2)
    a = np.asarray(render(ps.scene, ps.camera, key, mode="path",
                          intersect=ps.intersect, shared_jitter=False, **kw))
    b = np.asarray(render_regen(ps.scene, ps.camera, key,
                                intersect=ps.intersect, **kw))
    assert np.isfinite(b).all() and b.max() > 0
    assert abs(a.mean() - b.mean()) < 0.1 * a.mean()
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.85


def test_regen_deterministic(cornell_ps):
    ps = cornell_ps
    kw = dict(samples=4, max_depth=4, light_samples=1,
              intersect=ps.intersect)
    a = render_regen(ps.scene, ps.camera, jax.random.key(3), **kw)
    b = render_regen(ps.scene, ps.camera, jax.random.key(3), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_regen_converges_with_samples(cornell_ps):
    """More samples => closer to a high-sample standard reference."""
    ps = cornell_ps
    ref = np.asarray(render(ps.scene, ps.camera, jax.random.key(9),
                            samples=64, max_depth=4, light_samples=2,
                            mode="path", intersect=ps.intersect,
                            shared_jitter=False))
    errs = []
    for s in (4, 32):
        img = np.asarray(render_regen(ps.scene, ps.camera, jax.random.key(1),
                                      samples=s, max_depth=4,
                                      light_samples=2,
                                      intersect=ps.intersect))
        errs.append(np.abs(img - ref).mean())
    assert errs[1] < errs[0]


def test_regen_shardmap_statistical_match(cornell_ps):
    """8-virtual-device sharded regen agrees with single-device regen at
    the MC level (different RNG streams per shard by design)."""
    from orion_tpu.parallel.sharding import make_mesh
    from orion_tpu.regen import render_regen_shardmap

    ps = cornell_ps
    mesh = make_mesh(jax.devices()[:8])
    kw = dict(samples=24, max_depth=6, light_samples=2,
              intersect=ps.intersect)
    a = np.asarray(render_regen(ps.scene, ps.camera, jax.random.key(0), **kw))
    b = np.asarray(render_regen_shardmap(ps.scene, ps.camera,
                                         jax.random.key(0), mesh=mesh, **kw))
    assert np.isfinite(b).all() and b.max() > 0
    assert abs(a.mean() - b.mean()) < 0.1 * a.mean()
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.85


def test_regen_shardmap_deterministic_and_padded(cornell_ps, assets_dir):
    """Deterministic per (seed, device count); works when H*W % n_dev != 0
    (padding slots must contribute nothing)."""
    from orion_tpu.parallel.sharding import make_mesh
    from orion_tpu.regen import render_regen_shardmap

    ps = prepare(assets_dir / "cornell-box.rtc", xres=23, yres=9)  # 207 px
    mesh = make_mesh(jax.devices()[:6])
    kw = dict(samples=4, max_depth=4, light_samples=1,
              intersect=ps.intersect, mesh=mesh)
    a = render_regen_shardmap(ps.scene, ps.camera, jax.random.key(3), **kw)
    b = render_regen_shardmap(ps.scene, ps.camera, jax.random.key(3), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all() and np.asarray(a).max() > 0


def test_regen_step_cap_terminates(cornell_ps):
    """max_steps caps the loop even for pathological depth settings."""
    ps = cornell_ps
    img = render_regen(ps.scene, ps.camera, jax.random.key(0), samples=4,
                       max_depth=1000, light_samples=1,
                       intersect=ps.intersect, max_steps=40)
    assert np.isfinite(np.asarray(img)).all()
