"""Pallas TPU megakernel: the Whitted ray tracer in VMEM.

The second member of the megakernel family (the path tracer lives in
ops/pallas_fused.py and shares its builders): the full Whitted estimator
of RayTracer::trace's point-light branch (/root/reference/orion/
raytracer.cpp:195-207) — primary generation, nearest Möller-Trumbore
sweep, one any-hit shadow sweep per light, Phong shading
(material.hpp:72-93), and the mirror-reflection continuation — as one
kernel whose per-ray state stays in VMEM across every sample and bounce.
Terminated lanes regenerate as their pixel's next sample exactly like
the path megakernel.

Scope (gate): whitted scenes (>= 1 point light, <= MAX_LIGHTS), solid
materials only (no texture maps — the reference's own nanosuit
benchmarks ran untextured, benchmarks.md:4-12; textured scenes render
through the wavefront), T <= FUSED_MAX_TRIS. Covers BASELINE configs 1
(cornell Whitted) and 3 (view_test).

Estimator parity with render._whitted_bounce: the depth-0 emissive term,
the shadow quirk (ANY intersection at any t blocks, even geometry beyond
the light — raytracer.cpp:196-201, PARITY.md), Phong's pow(0,0)=1
semantics, and zero-throughput pruning (value-identical: the reference
recurses and multiplies by zero). Sub-pixel jitter is the shared-pattern
PCG4D draw of the path megakernel — a different stream than the
wavefront's threefry, so images agree statistically, not bitwise
(tests/test_whitted_fused.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orion_tpu.ops.pallas_fused import (
    _BIG, _C_AREA, _C_KD, _C_KE, _C_MESH, _C_N0, _C_N1, _C_N2,
    _GN_ATTRS, _fused_t_pad, _gn_from_got, _interp_n, _make_geom,
    _make_primary, _norm3, BIAS, FUSED_CHUNK, FUSED_MAX_TRIS, RAY_BLOCK,
    camera_vec, fused_chunk_bounds, pack_fused_tri_table, seed_scalar)
from orion_tpu.scene import Scene

MAX_LIGHTS = 8

# whitted extension columns ([T_pad, 40] table: 0-29 as pallas_fused)
_C_KA, _C_KS, _C_SHIN = 32, 35, 38
_W_COLS = 40

_WHITTED_ATTRS = (tuple(range(_C_N0, _C_N0 + 9))
                  + (_C_KD, _C_KD + 1, _C_KD + 2,
                     _C_KE, _C_KE + 1, _C_KE + 2,
                     _C_AREA,
                     _C_KA, _C_KA + 1, _C_KA + 2,
                     _C_KS, _C_KS + 1, _C_KS + 2,
                     _C_SHIN) + _GN_ATTRS)


def pack_whitted_tri_table(scene: Scene) -> np.ndarray:
    """[T_pad, 40]: the fused table plus solid Ka/Ks/shininess columns."""
    base = pack_fused_tri_table(scene)                    # [T_pad, 32]
    T = int(scene.num_triangles)
    tab = np.zeros((base.shape[0], _W_COLS), np.float32)
    tab[:, :32] = base
    mat = np.asarray(scene.tri_mat)[:T]
    tab[:T, _C_KA:_C_KA + 3] = np.asarray(scene.mat_ambient)[mat]
    tab[:T, _C_KS:_C_KS + 3] = np.asarray(scene.mat_specular)[mat]
    tab[:T, _C_SHIN] = np.asarray(scene.mat_shininess)[mat]
    return tab


def _lights_consts(scene: Scene):
    L = int(scene.num_lights)
    pos = np.asarray(scene.light_pos)[:L]
    color = np.asarray(scene.light_color)[:L]
    inten = np.asarray(scene.light_intensity)[:L]
    return L, pos, color, inten


def fused_whitted_supported(scene: Scene) -> bool:
    """Gate: solid-material whitted scene with few lights, small T."""
    if _fused_t_pad(int(scene.num_triangles)) > FUSED_MAX_TRIS:
        return False
    if not (1 <= int(scene.num_lights) <= MAX_LIGHTS):
        return False
    if int(np.asarray(scene.tex_hw).max()) > 1:
        return False
    maps = np.concatenate([np.asarray(scene.mat_map_diffuse),
                           np.asarray(scene.mat_map_specular),
                           np.asarray(scene.mat_map_bump)])
    return bool((maps < 0).all())


def _pow_like_c(x, e):
    """powf semantics on planes: pow(0, 0) == 1, pow(0, e>0) == 0."""
    safe_x = jnp.where(x > 0.0, x, 1.0)
    px = jnp.exp(e * jnp.log(safe_x))
    return jnp.where(x > 0.0, px, jnp.where(e == 0.0, 1.0, 0.0))


def _make_whitted_kernel(T_pad: int, W: int, H: int, samples: int,
                         max_depth: int, lights, n_pix: int,
                         with_emissive: bool):
    n_lights, l_pos, l_color, l_inten = lights

    chunked = T_pad > FUSED_CHUNK

    def kernel(cam_ref, seed_ref, base_ref, clo_ref, chi_ref, tri_ref,
               out_ref):
        rb = out_ref.shape[1]
        seed = seed_ref[0]

        def cam(i):
            return cam_ref[i]

        def col(c):
            return tri_ref[:, c:c + 1]

        def col_dyn(off, c):
            return tri_ref[pl.ds(pl.multiple_of(off, FUSED_CHUNK),
                                 FUSED_CHUNK), c:c + 1]

        def chunk_box(k):
            return ((clo_ref[3 * k], clo_ref[3 * k + 1],
                     clo_ref[3 * k + 2]),
                    (chi_ref[3 * k], chi_ref[3 * k + 1],
                     chi_ref[3 * k + 2]))

        pix0 = pl.program_id(0) * rb + base_ref[0]
        pix = (jax.lax.broadcasted_iota(jnp.int32, (1, rb), 1) + pix0)
        in_image = pix < n_pix

        _, sweep = _make_geom(col, T_pad, chunk=FUSED_CHUNK,
                              col_dyn=col_dyn,
                              chunk_box=chunk_box if chunked else None)
        primary = _make_primary(cam, seed, pix, W, H)
        S = jnp.int32(samples)

        # ANY hit at any t blocks (raytracer.cpp:196-201 quirk)
        occluded = sweep.any_hit

        def body(carry):
            (ox, oy, oz, dx, dy, dz, tr, tg, tb,
             ar, ag, ab, depth, samp) = carry

            t, hit, u, v, got = sweep((ox, oy, oz), (dx, dy, dz),
                                      _WHITTED_ATTRS)
            hitf = hit.astype(jnp.float32)
            hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
            sn = _interp_n(u, v, got, _C_N0, _C_N1, _C_N2)
            gn = _gn_from_got(got)
            kd = (got[_C_KD], got[_C_KD + 1], got[_C_KD + 2])
            ka = (got[_C_KA], got[_C_KA + 1], got[_C_KA + 2])
            ks = (got[_C_KS], got[_C_KS + 1], got[_C_KS + 2])
            shin = got[_C_SHIN]

            r3 = [jnp.zeros_like(t) for _ in range(3)]
            if with_emissive:
                # depth-0 emissive (raytracer.cpp:127-128)
                ndx, ndy, ndz = _norm3(dx, dy, dz)
                cosv = -(ndx * sn[0] + ndy * sn[1] + ndz * sn[2])
                em_scale = jnp.where((depth == 0) & hit,
                                     got[_C_AREA] * cosv, 0.0)
                for c in range(3):
                    r3[c] += got[_C_KE + c] * em_scale

            # view/shadow shared terms
            vdx, vdy, vdz = _norm3(-dx, -dy, -dz)
            sox = hx + BIAS * gn[0]
            soy = hy + BIAS * gn[1]
            soz = hz + BIAS * gn[2]
            for li in range(n_lights):
                lp = [np.float32(l_pos[li, c]) for c in range(3)]
                tlx, tly, tlz = lp[0] - hx, lp[1] - hy, lp[2] - hz
                d2 = tlx * tlx + tly * tly + tlz * tlz
                lit = hit & jnp.logical_not(
                    occluded((sox, soy, soz), (tlx, tly, tlz)))
                ldx, ldy, ldz = _norm3(tlx, tly, tlz)
                ndotl = jnp.maximum(sn[0] * ldx + sn[1] * ldy
                                    + sn[2] * ldz, 0.0)
                # reflect(-light_dir, n) then cos against the view dir
                dot_ln = -(ldx * sn[0] + ldy * sn[1] + ldz * sn[2])
                rx = -ldx - 2.0 * dot_ln * sn[0]
                ry = -ldy - 2.0 * dot_ln * sn[1]
                rz = -ldz - 2.0 * dot_ln * sn[2]
                spec_cos = jnp.maximum(vdx * rx + vdy * ry + vdz * rz, 0.0)
                spec = 0.5 * _pow_like_c(spec_cos, shin)
                litf = lit.astype(jnp.float32)
                scale = litf * np.float32(l_inten[li]) \
                    / jnp.maximum(d2, 1e-20)
                for c in range(3):
                    r3[c] += (np.float32(l_color[li, c])
                              * (ka[c] + ndotl * kd[c] + spec * ks[c])
                              * scale)

            ar += tr * r3[0] * hitf
            ag += tg * r3[1] * hitf
            ab += tb * r3[2] * hitf

            # mirror continuation scaled by Ks (raytracer.cpp:203-206);
            # zero-throughput rays retire (value-identical pruning)
            n_tr, n_tg, n_tb = tr * ks[0], tg * ks[1], tb * ks[2]
            nonzero = (n_tr > 0.0) | (n_tg > 0.0) | (n_tb > 0.0)
            cont = hit & (depth < max_depth) & nonzero & (samp < S)
            dot_dn = dx * sn[0] + dy * sn[1] + dz * sn[2]
            bdx = dx - 2.0 * dot_dn * sn[0]
            bdy = dy - 2.0 * dot_dn * sn[1]
            bdz = dz - 2.0 * dot_dn * sn[2]
            n_ox = hx + sn[0] * BIAS
            n_oy = hy + sn[1] * BIAS
            n_oz = hz + sn[2] * BIAS

            n_samp = jnp.where(cont, samp, samp + 1)
            lane_on = n_samp < S
            p_ox, p_oy, p_oz, p_dx, p_dy, p_dz = primary(n_samp)
            onf = lane_on.astype(jnp.float32)
            ox = jnp.where(cont, n_ox, p_ox)
            oy = jnp.where(cont, n_oy, p_oy)
            oz = jnp.where(cont, n_oz, p_oz)
            dx = jnp.where(cont, bdx, p_dx)
            dy = jnp.where(cont, bdy, p_dy)
            dz = jnp.where(cont, bdz, p_dz)
            tr = jnp.where(cont, n_tr, onf)
            tg = jnp.where(cont, n_tg, onf)
            tb = jnp.where(cont, n_tb, onf)
            depth = jnp.where(cont, depth + 1, 0)
            return (ox, oy, oz, dx, dy, dz, tr, tg, tb,
                    ar, ag, ab, depth, n_samp)

        def cond(carry):
            return jnp.any(carry[13] < S)

        samp0 = jnp.where(in_image, 0, S)
        o0 = primary(samp0)
        onf0 = (samp0 < S).astype(jnp.float32)
        zeros = jnp.zeros((1, rb), jnp.float32)
        carry = (o0[0], o0[1], o0[2], o0[3], o0[4], o0[5],
                 onf0, onf0, onf0, zeros, zeros, zeros,
                 jnp.zeros((1, rb), jnp.int32), samp0)
        carry = jax.lax.while_loop(cond, body, carry)
        inv_s = np.float32(1.0 / samples)
        out_ref[0:1, :] = carry[9] * inv_s
        out_ref[1:2, :] = carry[10] * inv_s
        out_ref[2:3, :] = carry[11] * inv_s
        out_ref[3:8, :] = jnp.zeros((5, rb), jnp.float32)

    return kernel


def make_fused_whitted_renderer(scene: Scene, camera, *, samples: int,
                                max_depth: int,
                                ray_block: int = RAY_BLOCK,
                                interpret: bool | None = None):
    """Build `fn(key) -> [H, W, 3]` rendering with the Whitted megakernel."""
    if not fused_whitted_supported(scene):
        raise ValueError("scene outside the fused-whitted gate "
                         "(textures / lights / size)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = camera.yres, camera.xres
    n_pix = H * W
    n_pad = ((max(n_pix, ray_block) + ray_block - 1)
             // ray_block) * ray_block

    tab_np = pack_whitted_tri_table(scene)
    lo, hi = fused_chunk_bounds(scene)
    clo, chi = jnp.asarray(lo.ravel()), jnp.asarray(hi.ravel())
    tri_tab = jnp.asarray(tab_np)
    lights = _lights_consts(scene)
    kernel = _make_whitted_kernel(tri_tab.shape[0], W, H, samples,
                                  max_depth, lights, n_pix,
                                  with_emissive=scene.num_emissive > 0)
    cam_v = camera_vec(camera)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_pad // ray_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, ray_block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        interpret=interpret,
    )
    zero_base = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _impl(cv, seed):
        out = call(cv, seed, zero_base, clo, chi, tri_tab)
        return out[0:3, :n_pix].T.reshape(H, W, 3)

    def render_whitted_fused(key, camera_override=None) -> jax.Array:
        cv = cam_v if camera_override is None else camera_vec(
            camera_override)
        return _impl(cv, seed_scalar(key))

    return render_whitted_fused
