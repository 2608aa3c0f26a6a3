"""shard_map multi-chip path: Pallas kernels per shard, grads, consistency.

Runs on the 8-virtual-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orion_tpu.engine import prepare
from orion_tpu.ops.intersect import intersect_brute
from orion_tpu.ops.pallas_intersect import intersect_brute_pallas
from orion_tpu.parallel.sharding import make_mesh, scene_params
from orion_tpu.parallel.shardmap_render import (make_train_step_shardmap,
                                                render_shardmap)
from orion_tpu.render import render


@pytest.fixture(scope="module")
def cornell_ps(assets_dir):
    return prepare(assets_dir / "cornell-box.rtc", xres=32, yres=16)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(jax.devices()[:8])


def test_shardmap_pallas_matches_single_chip_stats(cornell_ps, mesh8):
    """Sharded image must agree with the single-device render statistically
    (per-shard RNG differs by design, so compare means, not pixels)."""
    ps = cornell_ps
    key = jax.random.key(0)
    kw = dict(samples=8, max_depth=3, light_samples=2, mode="path")
    img_sharded = render_shardmap(ps.scene, ps.camera, key, mesh=mesh8,
                                  intersect=intersect_brute_pallas, **kw)
    img_single = render(ps.scene, ps.camera, key,
                        intersect=intersect_brute, **kw)
    a, b = np.asarray(img_sharded), np.asarray(img_single)
    assert np.isfinite(a).all()
    # different RNG streams => different noise, same underlying image:
    # means agree (MC), and bright/dark structure correlates strongly
    assert abs(a.mean() - b.mean()) < 0.25 * max(b.mean(), 1e-6)
    corr = np.corrcoef(a.reshape(-1), b.reshape(-1))[0, 1]
    assert corr > 0.8


def test_shardmap_deterministic(cornell_ps, mesh8):
    ps = cornell_ps
    kw = dict(samples=2, max_depth=2, light_samples=1, mode="path",
              intersect=intersect_brute_pallas)
    a = render_shardmap(ps.scene, ps.camera, jax.random.key(5), mesh=mesh8, **kw)
    b = render_shardmap(ps.scene, ps.camera, jax.random.key(5), mesh=mesh8, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shardmap_train_step_decreases_loss(cornell_ps, mesh8):
    ps = cornell_ps
    key = jax.random.key(0)
    target = render_shardmap(ps.scene, ps.camera, key, mesh=mesh8,
                             samples=1, max_depth=2, light_samples=1,
                             mode="path", intersect=intersect_brute_pallas)

    # perturb the diffuse albedo; training should move the loss down
    import dataclasses

    perturbed = dataclasses.replace(
        ps.scene, mat_diffuse=jnp.clip(ps.scene.mat_diffuse * 0.5, 0, 1))
    step = make_train_step_shardmap(perturbed, ps.camera, mesh8, samples=1,
                                    max_depth=2, light_samples=1,
                                    mode="path", lr=0.5,
                                    intersect=intersect_brute_pallas)
    params = scene_params(perturbed)
    losses = []
    for i in range(4):
        params, loss = step(params, key, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_init_distributed_single_process():
    from orion_tpu.parallel.distributed import (host_tile, init_distributed,
                                                scaling_report)

    info = init_distributed()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1

    start, end = host_tile(100)
    assert 0 <= start <= end <= 100
    # single process owns everything
    if info["process_count"] == 1:
        assert (start, end) == (0, 100)

    rep = scaling_report(10.0, 1.4, 8)
    assert rep["speedup"] == pytest.approx(7.143, rel=1e-3)
    assert rep["efficiency"] == pytest.approx(0.8929, rel=1e-3)
