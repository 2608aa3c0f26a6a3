"""Inverse rendering: optimize scene parameters against target images.

The capability the reference cannot express (BASELINE.md north star):
pixel-loss gradients flow through shading, sampling, and intersection into
vertex positions and material parameters (ops/intersect.py's
detach-and-recompute contract), so scene recovery is plain gradient
descent. This module packages it: optax optimizers over a chosen
parameter subset, optional multi-chip forward/backward, and simple
constraint projections (albedo clamping).

    from orion_tpu import prepare
    from orion_tpu.optim import fit
    result = fit(ps, target_image, params=("mat_diffuse",), steps=100)
    recovered_scene = result.scene
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from orion_tpu.render import IntersectFn, render
from orion_tpu.scene import Scene

# parameters that are physically meaningful in [0, 1]
UNIT_INTERVAL_PARAMS = ("mat_diffuse", "mat_specular", "mat_ambient",
                        "tex_atlas")

DEFAULT_PARAMS = ("mat_diffuse",)

# parameters that move geometry: intersecting them against a STATIC
# prebuilt BVH is silently wrong (stale hit ids as vertices move). fit()
# routes these through the refit path below — the tree's VALUES (node
# AABBs, leaf Woop bundles) are recomputed from the current vertices
# every step (accel/refit.py) and threaded into the jitted loss as
# runtime arguments, so one compile serves the whole loop.
GEOMETRY_PARAMS = ("tri_v0", "tri_e1", "tri_e2")


@dataclasses.dataclass
class FitResult:
    scene: Scene
    params: Dict[str, jax.Array]
    losses: list
    steps: int


def _project(params: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    out = {}
    for k, v in params.items():
        if k in UNIT_INTERVAL_PARAMS:
            v = jnp.clip(v, 0.0, 1.0)
        elif k == "mat_emissive":
            v = jnp.maximum(v, 0.0)
        out[k] = v
    return out


def make_loss(scene: Scene, camera, *, samples: int, max_depth: int,
              light_samples: int, mode: Optional[str],
              intersect: Optional[IntersectFn],
              loss_fn: Optional[Callable] = None,
              remat: bool = False,
              fold_samples: bool = False):
    """loss(params, key, target) closure over a base scene.

    Geometry params (tri_*) require a brute backend — the BVH closures
    intersect the geometry they were built from (see fit()'s guard).

    remat=True checkpoints each bounce in the backward pass (recompute
    instead of storing per-bounce residuals) — wins when the residual
    traffic, not compute, bounds the backward (large N x depth).
    remat="hits" additionally saves the per-bounce hit records so the
    backward pass never re-runs an intersection kernel (render.py).
    """

    def loss(params, key, target):
        s = dataclasses.replace(scene, **params)
        # prune_zero=False: zero-valued specular still carries gradient
        # through its (pruned-in-forward-renders) reflection subpath
        img = render(s, camera, key, samples=samples, max_depth=max_depth,
                     light_samples=light_samples, mode=mode,
                     intersect=intersect, prune_zero=False, remat=remat,
                     fold_samples=fold_samples)
        if loss_fn is not None:
            return loss_fn(img, target)
        return jnp.mean((img - target) ** 2)

    return loss


def make_refit_loss(ps, *, samples: int, max_depth: int,
                    light_samples: int, mode: Optional[str],
                    loss_fn: Optional[Callable] = None,
                    remat: bool | str = "hits",
                    ray_block: int = 256):
    """(loss, plan) for geometry optimization on a Pallas BVH backend.

    loss(params, key, target, node_scalars, tri_data) builds the
    traversal closure from the REFITTED tree arrays passed in at call
    time (static shapes — fixed topology), so vertex motion never
    stales the acceleration structure and never recompiles. Gradients
    flow through ops/intersect.py's detach-and-recompute contract: hit
    ids come from the kernel (detached), (t, u, v) and shading recompute
    differentiably from the live scene arrays. remat="hits" keeps the
    backward pass from re-running the traversal kernel (measured best,
    BENCHMARKS.md)."""
    from orion_tpu.accel.refit import RefitPlan
    from orion_tpu.ops.intersect import Hit
    from orion_tpu.ops.pallas_bvh import _traverse_pallas_impl

    bvh = ps.bvh
    if bvh is None:
        raise ValueError(
            f"backend {ps.backend!r} carries no single refittable tree "
            "(treelet decomposition); use force_backend='brute' or a "
            "scene under the residency cap for geometry fits")
    plan = RefitPlan(bvh)
    interpret = jax.default_backend() != "tpu"
    leaf_width, num_nodes = bvh.leaf_width, bvh.num_nodes
    num_triangles = int(ps.scene.num_triangles)
    tri_orig = bvh.tri_orig
    scene = ps.scene

    def loss(params, key, target, node_scalars, tri_data):
        s = dataclasses.replace(scene, **params)

        def intersect(s2, orig, dirs, *, alive=None) -> Hit:
            t, row = _traverse_pallas_impl(
                node_scalars, tri_data,
                jax.lax.stop_gradient(orig), jax.lax.stop_gradient(dirs),
                alive, leaf_width=leaf_width, num_nodes=num_nodes,
                ray_block=ray_block, interpret=interpret)
            tri_id = jnp.where(row >= 0, tri_orig[jnp.maximum(row, 0)], -1)
            tri_id = jnp.where(tri_id < num_triangles, tri_id, -1)
            return Hit(t=jnp.where(tri_id >= 0, t, jnp.inf), tri_id=tri_id)

        img = render(s, ps.camera, key, samples=samples,
                     max_depth=max_depth, light_samples=light_samples,
                     mode=mode, intersect=intersect, prune_zero=False,
                     remat=remat)
        if loss_fn is not None:
            return loss_fn(img, target)
        return jnp.mean((img - target) ** 2)

    return loss, plan


def _prb_loss_and_grad(ps, target, params, *, samples, max_depth,
                       light_samples, mode, loss_fn):
    """Route to the path-replay-backprop megakernel when it applies:
    path mode, MSE loss, material-table params only, fused-gate scene.
    Returns a `(params, key) -> (loss, grads)` fn or None (wavefront AD).
    """
    if loss_fn is not None:
        return None
    whitted = (mode == "whitted"
               or (mode is None
                   and int(getattr(ps.scene, "num_lights", 0)) > 0))
    if whitted:
        # Whitted-mode closed form (ops/prb_whitted.py): the Phong
        # estimator's finite mirror chain — forward dumps coefficient
        # planes, backward is pure arithmetic (VERDICT r4 next #8)
        from orion_tpu.ops.prb_whitted import (make_whitted_train_step,
                                               whitted_train_supported)

        if not set(params) <= {"mat_diffuse", "mat_specular",
                               "mat_ambient", "mat_emissive"}:
            return None
        if not whitted_train_supported(ps.scene):
            return None
        return make_whitted_train_step(
            ps.scene, ps.camera, target, samples=samples,
            max_depth=max_depth, intersect=ps.intersect,
            shadow_intersect=getattr(ps, "shadow_intersect", None))
    if mode not in (None, "path"):
        return None
    if not set(params) <= {"mat_diffuse", "mat_emissive"}:
        return None
    from orion_tpu.ops.pallas_prb import (fused_train_supported,
                                          make_fused_train_step)

    if fused_train_supported(ps.scene, samples):
        return make_fused_train_step(ps.scene, ps.camera, target,
                                     samples=samples, max_depth=max_depth,
                                     light_samples=light_samples,
                                     dynamic_params=True)
    # past the brute gate: the closed-form bounce-PRB (sorted wavefront,
    # backward is pure math over forward dumps — ~6.5x the regenerative
    # megakernel at 35k tris) for diffuse-only fits; mat_emissive fits
    # fall through to the regenerative step (fast-shadow ke is baked)
    if set(params) <= {"mat_diffuse"}:
        from orion_tpu.ops.pallas_bounce_prb import (
            make_bounce_train_step, wavefront_train_supported)

        if wavefront_train_supported(ps.scene):
            try:
                return make_bounce_train_step(
                    ps.scene, ps.camera, target, samples=samples,
                    max_depth=max_depth, light_samples=light_samples,
                    dynamic_params=True)
            except ValueError:
                pass  # over the residency cap
    from orion_tpu.ops.pallas_bvh_prb import (bvh_train_supported,
                                              make_bvh_train_step)

    if bvh_train_supported(ps.scene, samples):
        try:
            return make_bvh_train_step(
                ps.scene, ps.camera, target, samples=samples,
                max_depth=max_depth, light_samples=light_samples,
                order_signs=getattr(ps, "order_signs", (1.0, 1.0, 1.0)),
                dynamic_params=True)
        except ValueError:
            return None  # over the residency cap
    return None


def fit(ps, target, *, params: Sequence[str] = DEFAULT_PARAMS,
        steps: int = 100, learning_rate: float = 5e-2,
        optimizer: Optional[optax.GradientTransformation] = None,
        samples: int = 1, max_depth: int = 2, light_samples: int = 1,
        mode: Optional[str] = None, seed: int = 0,
        resample_keys: bool = True,
        loss_fn: Optional[Callable] = None,
        use_prb: str | bool = "auto",
        callback: Optional[Callable[[int, float], None]] = None) -> FitResult:
    """Fit `params` of a PreparedScene to a target [H,W,3] image.

    resample_keys=True draws a fresh sampling key per step (stochastic
    gradient over the path space); False holds the key fixed (deterministic
    objective — useful for convergence tests).

    use_prb: "auto" (default) computes gradients with the path-replay
    megakernel (ops/pallas_prb.py, ~8x the wavefront-AD step rate on TPU)
    whenever the scene/params/loss fit its gate, falling back to wavefront
    AD otherwise; False forces wavefront AD; True requires PRB (raises if
    the gate rejects the setup). Note PRB draws its own RNG stream
    (PCG4D), so losses differ from the wavefront path at the noise level.
    """
    geom = [p for p in params if p in GEOMETRY_PARAMS]
    refit_plan = None
    refit_loss = None
    if geom and str(getattr(ps, "backend", "")).startswith("bvh"):
        # moving geometry over a tree backend: refit the tree VALUES from
        # the current vertices every step (fixed topology — one compile)
        refit_loss, refit_plan = make_refit_loss(
            ps, samples=samples, max_depth=max_depth,
            light_samples=light_samples, mode=mode, loss_fn=loss_fn)
    target = jnp.asarray(target, jnp.float32)
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    theta = {name: getattr(ps.scene, name) for name in params}
    opt_state = opt.init(theta)

    prb = None
    if use_prb and refit_plan is None:
        prb = _prb_loss_and_grad(ps, target, params, samples=samples,
                                 max_depth=max_depth,
                                 light_samples=light_samples, mode=mode,
                                 loss_fn=loss_fn)
        if prb is None and use_prb is True:
            raise ValueError("use_prb=True but the setup is outside the "
                             "PRB gate (params/mode/loss/scene)")

    if refit_plan is not None:
        @jax.jit
        def step_refit(theta, opt_state, key, node_scalars, tri_data):
            l, grads = jax.value_and_grad(refit_loss)(
                theta, key, target, node_scalars, tri_data)
            updates, opt_state = opt.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return _project(theta), opt_state, l

        def _geo(name):
            import numpy as np

            return np.asarray(theta.get(name, getattr(ps.scene, name)))

        base_key = jax.random.key(seed)
        losses = []
        for i in range(steps):
            key = (jax.random.fold_in(base_key, i) if resample_keys
                   else base_key)
            node_scalars, tri_data = refit_plan.refit(
                _geo("tri_v0"), _geo("tri_e1"), _geo("tri_e2"))
            theta, opt_state, l = step_refit(theta, opt_state, key,
                                             node_scalars, tri_data)
            losses.append(float(l))
            if callback is not None:
                callback(i, losses[-1])
        return FitResult(scene=dataclasses.replace(ps.scene, **theta),
                        params=theta, losses=losses, steps=steps)

    if prb is not None:
        value_and_grad = prb
    else:
        loss = make_loss(ps.scene, ps.camera, samples=samples,
                         max_depth=max_depth, light_samples=light_samples,
                         mode=mode, intersect=ps.intersect, loss_fn=loss_fn)

        def value_and_grad(theta, key):
            return jax.value_and_grad(loss)(theta, key, target)

    @jax.jit
    def step(theta, opt_state, key):
        l, grads = value_and_grad(theta, key)
        updates, opt_state = opt.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return _project(theta), opt_state, l

    base_key = jax.random.key(seed)
    losses = []
    for i in range(steps):
        key = jax.random.fold_in(base_key, i) if resample_keys else base_key
        theta, opt_state, l = step(theta, opt_state, key)
        losses.append(float(l))
        if callback is not None:
            callback(i, losses[-1])

    return FitResult(scene=dataclasses.replace(ps.scene, **theta),
                     params=theta, losses=losses, steps=steps)
