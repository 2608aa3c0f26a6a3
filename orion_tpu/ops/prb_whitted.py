"""Closed-form Whitted-mode material trainer (VERDICT r4 next #8):
Whitted fits leave reverse-mode AD.

The Whitted estimator (render.py _whitted_bounce; the reference's
point-light branch, /root/reference/orion/raytracer.cpp:195-207 +
material.hpp:72-93) is a finite product chain with NO sampling beyond
the primary jitter:

    L_c = sum_d T_{d,c} r_{d,c},   T_{d+1,c} = T_{d,c} * ks_{d,c}
    r_{d,c} = ke_c E_d + ka_c K_{d,c} + kd_c D_{d,c} + ks_c S_{d,c}

with per-bounce per-lane coefficients (over rtc point lights l):
    K_c = sum_l lit_l lc_{l,c} I_l / d_l^2          (ambient)
    D_c = sum_l lit_l lc_{l,c} ndotl_l I_l / d_l^2  (diffuse)
    S_c = sum_l lit_l lc_{l,c} spec_l I_l / d_l^2   (specular)
    E   = meshArea * cos at depth 0                  (emissive quirk)

Every coefficient is independent of the material colors, so the
FORWARD pass dumps (K, D, S, E, mesh, r) per bounce and the backward
pass is pure arithmetic — no AD graph, no residual shading recompute:

    d kd[m,c] += w_c T_{d,c} D_{d,c}                 [mesh_d == m]
    d ka[m,c] += w_c T_{d,c} K_{d,c}
    d ke[m,c] += w_c T_{d,c} E_d
    d ks[m,c] += w_c T_{d,c} S_{d,c}
              +  w_c T_{d,c} V_{d+1,c}               (throughput chain)

where V_{d+1,c} = sum_{j>d} (prod_{d<i<j} ks_{i,c}) r_{j,c} is the
suffix radiance NORMALIZED at bounce d+1 (V_d = r_d + ks_d V_{d+1},
built back-to-front). Unlike the path trainers' U/kd form this is
division-free and EXACT at ks = 0: the estimator still traces the
mirror chain there (prune_zero=False), so the true derivative is the
downstream radiance at unit throughput — which V carries.

This is the Phong-estimator extension of pallas_prb's path adjoints;
its mirror-chain term is simpler (deterministic reflection, no Russian
roulette, no tie splitting). Forward estimator values are the
production wavefront's own (shared phong pieces + quirks: any-hit
shadow blocking incl. geometry beyond the light, depth-0 emissive
scaled by mesh area).

Gate: point-light scenes, untextured materials (the dumped
coefficients must pair with TABLE colors), no normal maps.

Oracle: reverse-mode AD of render(mode="whitted", prune_zero=False)
on the identical lane set — tests/test_prb_whitted.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import primary_rays
from orion_tpu.ops.intersect import hit_attributes, take_rows
from orion_tpu.ops import shade
from orion_tpu.render import BIAS
from orion_tpu.scene import Scene


def whitted_train_supported(scene: Scene) -> bool:
    """Closed-form Whitted gate: point lights present, solid materials
    (no texture maps — coefficients pair with table colors)."""
    if int(getattr(scene, "num_lights", 0)) < 1:
        return False
    maps = np.concatenate([np.asarray(scene.mat_map_diffuse),
                           np.asarray(scene.mat_map_specular),
                           np.asarray(scene.mat_map_bump)])
    return bool((maps < 0).all())


def make_whitted_train_step(scene: Scene, camera, target, *,
                            samples: int, max_depth: int,
                            intersect, shadow_intersect=None,
                            dynamic_params: bool = True):
    """`step(params, key) -> (loss, grads)`: MSE against `target`, with
    closed-form gradients for any subset of
    {mat_diffuse, mat_specular, mat_ambient, mat_emissive}.

    The forward runs the bounce chain ONCE (same walks as a render);
    the backward is elementwise math over the per-bounce dumps plus a
    scatter-add by material id — fwd+bwd ~= one forward."""
    if not whitted_train_supported(scene):
        raise ValueError("scene outside the closed-form Whitted gate "
                         "(lights / textures)")
    H, W = camera.yres, camera.xres
    n_pix = H * W
    N = n_pix * samples
    L = int(scene.num_lights)
    M = int(np.asarray(scene.mat_diffuse).shape[0])
    target = jnp.asarray(target, jnp.float32).reshape(n_pix, 3)
    px, py = 2.0 / W, 2.0 / H
    s_fn = shadow_intersect if shadow_intersect is not None else intersect

    def _primaries(key):
        # render()'s per-sample jitter streams (shared_jitter), samples
        # stacked into one wavefront — identical per-ray values
        os_, ds_ = [], []
        for k in range(samples):
            k_jit, _ = jax.random.split(jax.random.fold_in(key, k))
            jit = jax.random.uniform(k_jit, (2,))
            o, d = primary_rays(camera, jit[0] * px, jit[1] * py)
            os_.append(o)
            ds_.append(d)
        return jnp.concatenate(os_), jnp.concatenate(ds_)

    def _impl(params, key):
        s = dataclasses.replace(scene, **params)
        kd_t = s.mat_diffuse
        ks_t = s.mat_specular
        ka_t = s.mat_ambient
        ke_t = s.mat_emissive

        orig, dirs = _primaries(key)
        T = jnp.ones((N, 3), jnp.float32)
        alive = jnp.ones(N, bool)
        dumps = []          # (K, D, S, E, mesh, r, Td) per depth
        acc = jnp.zeros((N, 3), jnp.float32)

        for depth in range(max_depth + 1):
            hit = intersect(s, orig, dirs, alive=alive)
            attrs = hit_attributes(s, orig, dirs, hit)
            hm = alive & hit.mask
            mesh = jnp.where(hm, attrs.mat_id, 0)
            hmf = hm.astype(jnp.float32)

            # depth-0 emissive coefficient (raytracer.cpp:127-128)
            if depth == 0:
                area = s.mesh_area[attrs.mesh_id]
                cosv = jnp.sum(shade.normalize(dirs) * (-attrs.s_normal),
                               axis=-1)
                E = (area * cosv) * hmf
            else:
                E = jnp.zeros(N, jnp.float32)

            # per-light coefficients (phong_eval's pieces; any
            # intersection blocks — raytracer.cpp:196-201 quirk)
            shadow_origin = attrs.point + BIAS * attrs.g_normal
            lpos = jnp.repeat(s.light_pos[:L], N, axis=0)
            point_all = jnp.tile(attrs.point, (L, 1))
            to_light = lpos - point_all
            s_hit = s_fn(s, jnp.tile(shadow_origin, (L, 1)), to_light,
                         alive=jnp.tile(hm, L))
            lit = (jnp.tile(hm, L) & ~s_hit.mask).astype(jnp.float32)

            d2 = jnp.sum(to_light * to_light, axis=-1)
            ldir = shade.normalize(to_light)
            n_all = jnp.tile(attrs.s_normal, (L, 1))
            ndotl = jnp.maximum(jnp.sum(n_all * ldir, axis=-1), 0.0)
            vdir = shade.normalize(-jnp.tile(dirs, (L, 1)))
            rdir = shade.reflect(-ldir, n_all)
            spec_cos = jnp.maximum(jnp.sum(vdir * rdir, axis=-1), 0.0)
            shin = jnp.tile(take_rows(s.mat_shininess, mesh), L)
            spec = 0.5 * jnp.power(spec_cos, shin)
            base = (jnp.repeat(s.light_color[:L], N, axis=0)
                    * (lit * jnp.repeat(s.light_intensity[:L], N)
                       / jnp.maximum(d2, 1e-20))[:, None])
            K = jnp.sum(base.reshape(L, N, 3), axis=0)
            D = jnp.sum((base * ndotl[:, None]).reshape(L, N, 3), axis=0)
            S = jnp.sum((base * spec[:, None]).reshape(L, N, 3), axis=0)

            kd = take_rows(kd_t, mesh)
            ks = take_rows(ks_t, mesh)
            ka = take_rows(ka_t, mesh)
            ke = take_rows(ke_t, mesh)
            r = (ke * E[:, None] + ka * K + kd * D + ks * S) * hmf[:, None]
            acc = acc + T * r
            dumps.append((K, D, S, E, mesh, r, T, ks))

            # mirror continuation (prune_zero=False semantics: dead
            # lanes keep zero throughput but the chain shape is fixed)
            cont = hm & (depth < max_depth)
            T = jnp.where(cont[:, None], T * ks, 0.0)
            new_dir = shade.reflect(dirs, attrs.s_normal)
            new_orig = attrs.point + attrs.s_normal * BIAS
            orig = jnp.where(cont[:, None], new_orig, orig)
            dirs = jnp.where(cont[:, None], new_dir, dirs)
            alive = cont

        # image + loss + per-lane cotangent
        lane_pix = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), samples)
        img = jnp.zeros((n_pix, 3), jnp.float32).at[lane_pix].add(acc)
        img = img / np.float32(samples)
        diff = img - target
        loss = jnp.mean(diff * diff)
        w3 = (diff * np.float32(2.0 / (n_pix * 3 * samples)))[lane_pix]

        # backward: suffix radiance U + per-bounce adjoints
        g_kd = jnp.zeros((M, 3), jnp.float32)
        g_ks = jnp.zeros((M, 3), jnp.float32)
        g_ka = jnp.zeros((M, 3), jnp.float32)
        g_ke = jnp.zeros((M, 3), jnp.float32)
        V = jnp.zeros((N, 3), jnp.float32)
        for (K, D, S, E, mesh, r, Td, ks) in reversed(dumps):
            # V == V_{d+1}: suffix radiance at unit throughput
            g_kd = g_kd.at[mesh].add(w3 * Td * D)
            g_ka = g_ka.at[mesh].add(w3 * Td * K)
            g_ke = g_ke.at[mesh].add(w3 * Td * E[:, None])
            g_ks = g_ks.at[mesh].add(w3 * Td * (S + V))
            V = r + ks * V
        grads = {"mat_diffuse": g_kd, "mat_specular": g_ks,
                 "mat_ambient": g_ka, "mat_emissive": g_ke}
        return loss, grads

    jitted = jax.jit(_impl)

    def step(params, key):
        bad = set(params) - {"mat_diffuse", "mat_specular",
                             "mat_ambient", "mat_emissive"}
        if bad:
            raise ValueError(f"closed-form Whitted differentiates "
                             f"material tables; got {sorted(bad)}")
        loss, g = jitted(dict(params), key)
        return loss, {k: g[k] for k in params}

    return step
