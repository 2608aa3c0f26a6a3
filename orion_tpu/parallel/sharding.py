"""Multi-chip sharding: ray/tile data parallelism over a jax.sharding.Mesh.

The TPU-native replacement for the reference's OpenMP pixel fan-out
(/root/reference/orion/raytracer.cpp:69-88) and its (absent) distributed
story (SURVEY.md §2.4): the pixel wavefront is sharded across chips on a
1-D `rays` mesh axis, the scene (geometry + BVH + materials) is replicated
in every chip's HBM, and XLA's GSPMD partitioner propagates the sharding
through the whole render — zero collectives in the forward pass, and a
single automatic `psum` (all-reduce) of scene-parameter gradients in the
backward pass of the training step.

Because sharding is expressed as annotations (`with_sharding_constraint`)
rather than explicit shard_map bodies, `jax.random` keeps *global* counter
semantics: the same key produces the same image (to float tolerance —
XLA may reorder reductions across shardings) on 1 chip or N —
the determinism test the reference can't express (SURVEY.md §5 race
detection row).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orion_tpu.camera import Camera, primary_rays
from orion_tpu.render import render, trace_wavefront
from orion_tpu.scene import Scene

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = RAY_AXIS) -> Mesh:
    """1-D device mesh over all (or given) devices; rays shard along it."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


def _ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAY_AXIS))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


@partial(jax.jit, static_argnames=("samples", "max_depth", "light_samples",
                                   "mode", "mesh", "prune_zero"))
def _render_sharded_impl(scene: Scene, camera: Camera, key: jax.Array, *,
                         samples: int, max_depth: int, light_samples: int,
                         mode: Optional[str], mesh: Mesh,
                         prune_zero: bool = True) -> jax.Array:
    H, W = camera.yres, camera.xres
    n_dev = mesh.devices.size
    px, py = 2.0 / W, 2.0 / H
    shard = _ray_sharding(mesh)

    N = H * W
    pad = (-N) % n_dev

    def sample_body(acc, k):
        k_jit, k_trace = jax.random.split(jax.random.fold_in(key, k))
        jit2 = jax.random.uniform(k_jit, (2,))
        orig, dirs = primary_rays(camera, jit2[0] * px, jit2[1] * py)
        if pad:
            orig = jnp.concatenate([orig, jnp.zeros((pad, 3), orig.dtype)])
            dirs = jnp.concatenate([dirs, jnp.ones((pad, 3), dirs.dtype)])
        # the one annotation GSPMD needs: everything downstream of the rays
        # partitions along the ray axis; the scene stays replicated
        orig = jax.lax.with_sharding_constraint(orig, shard)
        dirs = jax.lax.with_sharding_constraint(dirs, shard)
        # GSPMD cannot partition opaque Pallas custom calls — this path is
        # pinned to the jnp backend (parallel/shardmap_render.py is the
        # Pallas multi-chip path)
        from orion_tpu.ops.intersect import intersect_brute

        radiance = trace_wavefront(scene, orig, dirs, k_trace,
                                   max_depth=max_depth,
                                   light_samples=light_samples, mode=mode,
                                   intersect=intersect_brute,
                                   prune_zero=prune_zero)
        radiance = radiance[:N].reshape(H, W, 3)
        return acc + radiance, None

    acc, _ = jax.lax.scan(sample_body, jnp.zeros((H, W, 3), jnp.float32),
                          jnp.arange(samples))
    return acc / float(samples)


def render_sharded(scene: Scene, camera: Camera, key: jax.Array, *,
                   mesh: Optional[Mesh] = None, samples: int = 1,
                   max_depth: int = 1, light_samples: int = 2,
                   mode: Optional[str] = None) -> jax.Array:
    """Render with the pixel wavefront sharded across `mesh` (default: all devices)."""
    if mesh is None:
        mesh = make_mesh()
    return _render_sharded_impl(scene, camera, key, samples=samples,
                                max_depth=max_depth,
                                light_samples=light_samples, mode=mode,
                                mesh=mesh)


# ---------------------------------------------------------------------------
# Differentiable training step (inverse rendering)
# ---------------------------------------------------------------------------

# scene fields exposed as trainable parameters
TRAINABLE_FIELDS = ("tri_v0", "tri_e1", "tri_e2",
                    "mat_diffuse", "mat_specular", "mat_emissive",
                    "mat_ambient")


def scene_params(scene: Scene) -> Dict[str, jax.Array]:
    """Extract the differentiable parameter pytree from a scene."""
    return {f: getattr(scene, f) for f in TRAINABLE_FIELDS}


def apply_params(scene: Scene, params: Dict[str, jax.Array]) -> Scene:
    return dataclasses.replace(scene, **params)


def make_train_step(scene: Scene, camera: Camera, *, samples: int = 1,
                    max_depth: int = 2, light_samples: int = 1,
                    mode: Optional[str] = None, lr: float = 1e-2,
                    mesh: Optional[Mesh] = None):
    """Build a jitted SGD step minimizing pixel MSE against a target image.

    The full differentiable path: loss -> shading -> BRDF sampling ->
    intersection -> vertex positions & material parameters. With a mesh,
    the forward pass shards rays per chip and the backward pass all-reduces
    the (replicated) scene-parameter gradients — the `psum` is inserted by
    XLA's partitioner from the sharding annotations alone.
    """

    def loss_fn(params, key, target):
        s = apply_params(scene, params)
        if mesh is not None:
            img = _render_sharded_impl(s, camera, key, samples=samples,
                                       max_depth=max_depth,
                                       light_samples=light_samples,
                                       mode=mode, mesh=mesh,
                                       prune_zero=False)
        else:
            img = render(s, camera, key, samples=samples, max_depth=max_depth,
                         light_samples=light_samples, mode=mode,
                         prune_zero=False)
        return jnp.mean((img - target) ** 2)

    @jax.jit
    def train_step(params, key, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, key, target)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                            params, grads)
        return new_params, loss

    return train_step
