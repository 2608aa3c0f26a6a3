"""SoA scene representation — immutable arrays in HBM, registered as a pytree.

This inverts the reference's object graph (TracedModel -> TracedMesh ->
SBVH/Material, /root/reference/orion/model.hpp, mesh.hpp): instead of
per-mesh objects with virtual dispatch, the whole scene is a flat
structure-of-arrays over *triangles*, with integer tables mapping triangles
to meshes and materials. Rendering is then a pure jittable function of
(Scene, Camera, key).

Conventions:
  - Triangles are stored as (v0, e1, e2) like the reference
    (geometry.hpp:64-69): e1 = v1 - v0, e2 = v2 - v0.
  - Triangle arrays are padded to a multiple of `pad_to` lanes with
    degenerate triangles (e1 = e2 = 0 => Möller-Trumbore det = 0 => no hit).
  - Per-triangle surface areas use the correct 0.5*|cross(e1,e2)| formula —
    deliberately fixing the reference's `abs(dot(e1,e2))*0.5` bug
    (geometry.hpp:155-157); see PARITY.md.
  - One material per mesh (mesh id == material id), matching how the
    reference builds a TracedMesh per Assimp mesh (model.cpp:69-193).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import numpy as np

from orion_tpu.io.image import load_texture
from orion_tpu.io.obj import ObjScene, load_obj
from orion_tpu.io.rtc import RTCData, parse_rtc

LANE = 128  # TPU lane width; default triangle padding granularity


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    """Flat SoA scene. All fields are arrays (pytree leaves) unless marked static.

    Shapes: T = padded triangle count, Nm = mesh count, M = material count
    (== Nm), E = emissive mesh count (>= 1 slot), L = point light count
    (>= 1 slot), I = texture image count (>= 1 slot).
    """

    # geometry (differentiable)
    tri_v0: jax.Array  # [T, 3]
    tri_e1: jax.Array  # [T, 3]
    tri_e2: jax.Array  # [T, 3]
    # per-corner shading attributes
    n0: jax.Array  # [T, 3]
    n1: jax.Array  # [T, 3]
    n2: jax.Array  # [T, 3]
    uv0: jax.Array  # [T, 2]
    uv1: jax.Array  # [T, 2]
    uv2: jax.Array  # [T, 2]
    # topology tables
    tri_mat: jax.Array   # [T] int32, material (== mesh) id; padding rows -> 0
    tri_valid: jax.Array  # [T] bool, False on padding rows
    mesh_tri_start: jax.Array  # [Nm] int32 (unpadded triangle index space)
    mesh_tri_count: jax.Array  # [Nm] int32
    mesh_area: jax.Array       # [Nm] float32 (correct areas)
    # materials (differentiable)
    mat_ambient: jax.Array    # [M, 3]
    mat_diffuse: jax.Array    # [M, 3]
    mat_specular: jax.Array   # [M, 3]
    mat_emissive: jax.Array   # [M, 3]
    mat_shininess: jax.Array  # [M]
    mat_opacity: jax.Array    # [M]
    # texture maps: -1 = use solid color
    mat_map_diffuse: jax.Array   # [M] int32
    mat_map_specular: jax.Array  # [M] int32
    mat_map_bump: jax.Array      # [M] int32 (tangent-space normal map)
    tex_atlas: jax.Array  # [AH, AW, 3] float32, shelf-packed texture atlas
    tex_off: jax.Array    # [I, 2] int32 (y0, x0) into the atlas
    tex_hw: jax.Array     # [I, 2] int32 (h, w)
    # emissive meshes (for NEE); padded with id -1
    emissive_mesh_ids: jax.Array  # [E] int32
    # point lights from the .rtc; padded with zero intensity
    light_pos: jax.Array        # [L, 3]
    light_color: jax.Array      # [L, 3]
    light_intensity: jax.Array  # [L]

    # static metadata (hashable; triggers recompile when changed)
    num_triangles: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_meshes: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_emissive: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_lights: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def padded_triangles(self) -> int:
        return self.tri_v0.shape[0]


def pack_texture_atlas(tex_images):
    """Shelf-pack decoded textures into ONE [AH, AW, 3] atlas.

    Replaces the round-1 [I, Hmax, Wmax, 3] padded stack, whose HBM cost
    multiplied every slot by the LARGEST texture's extent (one 2048^2 map
    among thumbnails made every thumbnail cost 2048^2). Shelf packing:
    images sorted by height descend into rows of a fixed-width atlas —
    simple, deterministic, and within ~20% of optimal for the texture-set
    shapes games/scenes actually ship.

    Returns (atlas [AH, AW, 3] f32, off [I, 2] (y0, x0) i32, hw [I, 2] i32).
    """
    if not tex_images:
        return (np.zeros((1, 1, 3), np.float32),
                np.zeros((1, 2), np.int32), np.ones((1, 2), np.int32))
    AW = max(t.shape[1] for t in tex_images)
    order = sorted(range(len(tex_images)),
                   key=lambda i: -tex_images[i].shape[0])
    I = len(tex_images)
    off = np.zeros((I, 2), np.int32)
    hw = np.zeros((I, 2), np.int32)
    y = x = shelf_h = 0
    for i in order:
        h, w = tex_images[i].shape[:2]
        if x + w > AW:
            y += shelf_h
            x = shelf_h = 0
        off[i] = (y, x)
        hw[i] = (h, w)
        x += w
        shelf_h = max(shelf_h, h)
    atlas = np.zeros((y + shelf_h, AW, 3), np.float32)
    for i, t in enumerate(tex_images):
        y0, x0 = off[i]
        atlas[y0:y0 + t.shape[0], x0:x0 + t.shape[1]] = t
    return atlas, off, hw


def _corner_vertices(mesh_positions: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    v0 = mesh_positions[:, 0, :]
    e1 = mesh_positions[:, 1, :] - v0
    e2 = mesh_positions[:, 2, :] - v0
    return v0, e1, e2


def triangle_areas(e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """Correct triangle area: 0.5 * |e1 x e2| (fixes geometry.hpp:155-157)."""
    return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)


def build_scene(
    obj: ObjScene,
    rtc: Optional[RTCData] = None,
    pad_to: int = LANE,
    load_textures: bool = True,
) -> Scene:
    """Flatten an ObjScene (+ rtc lights) into a Scene SoA pytree."""
    import jax.numpy as jnp

    meshes = obj.meshes
    if not meshes:
        raise ValueError("scene has no meshes")

    v0s, e1s, e2s, n0s, n1s, n2s, uv0s, uv1s, uv2s = [], [], [], [], [], [], [], [], []
    tri_mat: List[np.ndarray] = []
    mesh_tri_start, mesh_tri_count, mesh_area = [], [], []
    emissive_ids = []

    # texture registry (deduped by resolved path, like model.cpp:195-227)
    tex_paths: List[str] = []
    tex_images: List[np.ndarray] = []

    def register_texture(rel_path: Optional[str]) -> int:
        if not load_textures or rel_path is None:
            return -1
        p = obj.directory / rel_path
        key = str(p)
        if key in tex_paths:
            return tex_paths.index(key)
        if not p.exists():
            return -1
        tex_images.append(load_texture(p))
        tex_paths.append(key)
        return len(tex_paths) - 1

    mat_rows = dict(ambient=[], diffuse=[], specular=[], emissive=[],
                    shininess=[], opacity=[], map_diffuse=[], map_specular=[],
                    map_bump=[])

    t_cursor = 0
    for mesh_id, mesh in enumerate(meshes):
        F = mesh.num_triangles
        v0, e1, e2 = _corner_vertices(mesh.positions)
        v0s.append(v0); e1s.append(e1); e2s.append(e2)
        n0s.append(mesh.normals[:, 0]); n1s.append(mesh.normals[:, 1]); n2s.append(mesh.normals[:, 2])
        uv0s.append(mesh.uvs[:, 0]); uv1s.append(mesh.uvs[:, 1]); uv2s.append(mesh.uvs[:, 2])
        tri_mat.append(np.full(F, mesh_id, np.int32))
        mesh_tri_start.append(t_cursor)
        mesh_tri_count.append(F)
        mesh_area.append(float(np.sum(triangle_areas(e1, e2))))
        t_cursor += F

        m = mesh.material
        mat_rows["ambient"].append(m.ambient)
        mat_rows["diffuse"].append(m.diffuse)
        mat_rows["specular"].append(m.specular)
        mat_rows["emissive"].append(m.emissive)
        mat_rows["shininess"].append(m.shininess)
        mat_rows["opacity"].append(m.opacity)
        mat_rows["map_diffuse"].append(register_texture(m.map_diffuse))
        mat_rows["map_specular"].append(register_texture(m.map_specular))
        mat_rows["map_bump"].append(register_texture(m.map_bump))
        if m.is_emissive:
            emissive_ids.append(mesh_id)

    T = t_cursor
    T_pad = max(_round_up(T, pad_to), pad_to)

    def cat_pad(chunks, width):
        arr = np.concatenate(chunks, axis=0).astype(np.float32).reshape(T, width)
        out = np.zeros((T_pad, width), np.float32)
        out[:T] = arr
        return out

    tri_mat_arr = np.zeros(T_pad, np.int32)
    tri_mat_arr[:T] = np.concatenate(tri_mat)
    tri_valid = np.zeros(T_pad, bool)
    tri_valid[:T] = True

    atlas, off, hw = pack_texture_atlas(tex_images)

    num_emissive = len(emissive_ids)
    em_ids = np.full(max(num_emissive, 1), -1, np.int32)
    em_ids[:num_emissive] = emissive_ids

    lights = rtc.lights if rtc is not None else []
    num_lights = len(lights)
    Lp = max(num_lights, 1)
    light_pos = np.zeros((Lp, 3), np.float32)
    light_color = np.zeros((Lp, 3), np.float32)
    light_intensity = np.zeros(Lp, np.float32)
    for i, l in enumerate(lights):
        light_pos[i] = l.position
        light_color[i] = l.color
        light_intensity[i] = l.intensity

    jarr = jnp.asarray
    return Scene(
        tri_v0=jarr(cat_pad(v0s, 3)), tri_e1=jarr(cat_pad(e1s, 3)), tri_e2=jarr(cat_pad(e2s, 3)),
        n0=jarr(cat_pad(n0s, 3)), n1=jarr(cat_pad(n1s, 3)), n2=jarr(cat_pad(n2s, 3)),
        uv0=jarr(cat_pad(uv0s, 2)), uv1=jarr(cat_pad(uv1s, 2)), uv2=jarr(cat_pad(uv2s, 2)),
        tri_mat=jarr(tri_mat_arr), tri_valid=jarr(tri_valid),
        mesh_tri_start=jarr(np.array(mesh_tri_start, np.int32)),
        mesh_tri_count=jarr(np.array(mesh_tri_count, np.int32)),
        mesh_area=jarr(np.array(mesh_area, np.float32)),
        mat_ambient=jarr(np.stack(mat_rows["ambient"]).astype(np.float32)),
        mat_diffuse=jarr(np.stack(mat_rows["diffuse"]).astype(np.float32)),
        mat_specular=jarr(np.stack(mat_rows["specular"]).astype(np.float32)),
        mat_emissive=jarr(np.stack(mat_rows["emissive"]).astype(np.float32)),
        mat_shininess=jarr(np.array(mat_rows["shininess"], np.float32)),
        mat_opacity=jarr(np.array(mat_rows["opacity"], np.float32)),
        mat_map_diffuse=jarr(np.array(mat_rows["map_diffuse"], np.int32)),
        mat_map_specular=jarr(np.array(mat_rows["map_specular"], np.int32)),
        mat_map_bump=jarr(np.array(mat_rows["map_bump"], np.int32)),
        tex_atlas=jarr(atlas), tex_off=jarr(off), tex_hw=jarr(hw),
        emissive_mesh_ids=jarr(em_ids),
        light_pos=jarr(light_pos), light_color=jarr(light_color),
        light_intensity=jarr(light_intensity),
        num_triangles=T, num_meshes=len(meshes),
        num_emissive=num_emissive, num_lights=num_lights,
    )


def make_synthetic_scene(num_triangles: int, seed: int = 0,
                         extent: float = 10.0,
                         with_light: bool = True) -> Scene:
    """Random triangle-soup Scene for large-scene benchmarks and tests.

    `num_triangles` uniformly-placed triangles in a cube of half-width
    `extent`, sized so expected local density stays roughly constant
    (edge ~ extent / cbrt(T)); one gray material; one point light above
    the cube when `with_light` (Whitted-renderable). The reference tops
    out at the 19k-triangle nanosuit; this generates the >= 200k-triangle
    scenes the treelet path (engine._make_treelet_intersect) exists for.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    T = num_triangles
    T_pad = max(_round_up(T, LANE), LANE)
    size = 4.0 * extent / max(float(T) ** (1.0 / 3.0), 1.0)
    v0 = rng.uniform(-extent, extent, (T, 3)).astype(np.float32)
    e1 = rng.normal(0.0, size, (T, 3)).astype(np.float32)
    e2 = rng.normal(0.0, size, (T, 3)).astype(np.float32)

    def pad(a):
        out = np.zeros((T_pad,) + a.shape[1:], np.float32)
        out[:T] = a
        return out

    gn = np.cross(e1, e2)
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-20)
    uv = rng.uniform(0.0, 1.0, (T, 2)).astype(np.float32)

    tri_valid = np.zeros(T_pad, bool)
    tri_valid[:T] = True
    areas = triangle_areas(e1, e2)

    L = 1 if with_light else 0
    jarr = jnp.asarray
    return Scene(
        tri_v0=jarr(pad(v0)), tri_e1=jarr(pad(e1)), tri_e2=jarr(pad(e2)),
        n0=jarr(pad(gn)), n1=jarr(pad(gn)), n2=jarr(pad(gn)),
        uv0=jarr(pad(uv)), uv1=jarr(pad(uv)), uv2=jarr(pad(uv)),
        tri_mat=jarr(np.zeros(T_pad, np.int32)),
        tri_valid=jarr(tri_valid),
        mesh_tri_start=jarr(np.array([0], np.int32)),
        mesh_tri_count=jarr(np.array([T], np.int32)),
        mesh_area=jarr(np.array([float(areas.sum())], np.float32)),
        mat_ambient=jarr(np.full((1, 3), 0.05, np.float32)),
        mat_diffuse=jarr(np.full((1, 3), 0.7, np.float32)),
        mat_specular=jarr(np.zeros((1, 3), np.float32)),
        mat_emissive=jarr(np.zeros((1, 3), np.float32)),
        mat_shininess=jarr(np.array([8.0], np.float32)),
        mat_opacity=jarr(np.ones(1, np.float32)),
        mat_map_diffuse=jarr(np.full(1, -1, np.int32)),
        mat_map_specular=jarr(np.full(1, -1, np.int32)),
        mat_map_bump=jarr(np.full(1, -1, np.int32)),
        tex_atlas=jarr(np.zeros((1, 1, 3), np.float32)),
        tex_off=jarr(np.zeros((1, 2), np.int32)),
        tex_hw=jarr(np.ones((1, 2), np.int32)),
        emissive_mesh_ids=jarr(np.full(1, -1, np.int32)),
        light_pos=jarr(np.array([[0.0, 2.5 * extent, 0.0]], np.float32)),
        light_color=jarr(np.ones((1, 3), np.float32)),
        light_intensity=jarr(np.full(
            1, 25.0 * extent * extent if with_light else 0.0, np.float32)),
        num_triangles=T, num_meshes=1, num_emissive=0, num_lights=L,
    )


def subdivide_scene(scene: Scene, levels: int = 1,
                    skip_emissive: bool = True) -> Scene:
    """4-to-1 midpoint subdivision of every triangle: a geometrically
    IDENTICAL scene with 4^levels the triangle count.

    The workhorse for triangle-count scaling studies (the chunked fused
    sweep, BVH vs brute crossover): the rendered image is the same
    surface set, so estimators agree up to sampling noise while T grows.
    Corner normals/uvs are interpolated unnormalized at edge midpoints —
    barycentric interpolation over a child reproduces the parent's
    interpolant exactly. skip_emissive leaves emissive meshes
    unsubdivided so the NEE weight (triArea * triCount, mesh.hpp:178-184)
    and the fused kernel's per-emitter unrolled select stay unchanged.
    """
    import jax.numpy as jnp

    for _ in range(levels):
        T = scene.num_triangles
        em = set(int(i) for i in np.asarray(scene.emissive_mesh_ids)
                 if i >= 0) if skip_emissive else set()
        starts = np.asarray(scene.mesh_tri_start)
        counts = np.asarray(scene.mesh_tri_count)
        f = {k: (np.asarray(getattr(scene, k))[:T]).astype(np.float32)
             for k in ("tri_v0", "tri_e1", "tri_e2", "n0", "n1", "n2",
                       "uv0", "uv1", "uv2")}
        mat = np.asarray(scene.tri_mat)[:T]

        out = {k: [] for k in f}
        out_mat, new_starts, new_counts = [], [], []
        pos = 0
        for m in range(scene.num_meshes):
            s, c = int(starts[m]), int(counts[m])
            new_starts.append(pos)
            sl = slice(s, s + c)
            if m in em or c == 0:
                for k in f:
                    out[k].append(f[k][sl])
                out_mat.append(mat[sl])
                pos += c
                new_counts.append(c)
                continue
            v0, e1, e2 = f["tri_v0"][sl], f["tri_e1"][sl], f["tri_e2"][sl]
            # children in (corner a, corner b, corner c, center) order;
            # each stored as (v0', e1', e2') with e = half-edges
            ch_v0 = [v0, v0 + 0.5 * e1, v0 + 0.5 * e2, v0 + 0.5 * e1]
            ch_e1 = [0.5 * e1, 0.5 * e1, 0.5 * e1, 0.5 * e2]
            ch_e2 = [0.5 * e2, 0.5 * e2, 0.5 * e2, 0.5 * (e2 - e1)]
            for k, ch in (("tri_v0", ch_v0), ("tri_e1", ch_e1),
                          ("tri_e2", ch_e2)):
                out[k].append(np.stack(ch, 1).reshape(-1, 3))
            # corner attributes: a=corner0, b=corner1, c=corner2;
            # child corners follow the (v0', v0'+e1', v0'+e2') layout
            for base in ("n", "uv"):
                a = f[f"{base}0"][sl]
                b = f[f"{base}1"][sl]
                cc = f[f"{base}2"][sl]
                ab, ac, bc = (0.5 * (a + b), 0.5 * (a + cc),
                              0.5 * (b + cc))
                corners = [(a, ab, ac), (ab, b, bc), (ac, bc, cc),
                           (ab, bc, ac)]
                for ci in range(3):
                    out[f"{base}{ci}"].append(
                        np.stack([corners[ch][ci] for ch in range(4)],
                                 1).reshape(-1, a.shape[1]))
            out_mat.append(np.repeat(mat[sl], 4))
            pos += 4 * c
            new_counts.append(4 * c)

        new_T = pos
        T_pad = max(_round_up(new_T, LANE), LANE)

        def padded(chunks, width):
            a = np.concatenate(chunks, axis=0)
            full = np.zeros((T_pad, width), np.float32)
            full[:new_T] = a
            return jnp.asarray(full)

        valid = np.zeros(T_pad, bool)
        valid[:new_T] = True
        mat_full = np.zeros(T_pad, np.int32)
        mat_full[:new_T] = np.concatenate(out_mat)
        scene = dataclasses.replace(
            scene,
            tri_v0=padded(out["tri_v0"], 3),
            tri_e1=padded(out["tri_e1"], 3),
            tri_e2=padded(out["tri_e2"], 3),
            n0=padded(out["n0"], 3), n1=padded(out["n1"], 3),
            n2=padded(out["n2"], 3),
            uv0=padded(out["uv0"], 2), uv1=padded(out["uv1"], 2),
            uv2=padded(out["uv2"], 2),
            tri_mat=jnp.asarray(mat_full),
            tri_valid=jnp.asarray(valid),
            mesh_tri_start=jnp.asarray(np.array(new_starts, np.int32)),
            mesh_tri_count=jnp.asarray(np.array(new_counts, np.int32)),
            num_triangles=new_T)
    return scene


def load_scene(rtc_path: str | Path, pad_to: int = LANE,
               load_textures: bool = True) -> Tuple[Scene, RTCData]:
    """Parse an .rtc file and load its OBJ scene (traceRTC's setup phase,
    raytracer.cpp:19-41)."""
    rtc_path = Path(rtc_path)
    rtc = parse_rtc(rtc_path)
    obj_path = rtc_path.parent / rtc.obj_file
    obj = load_obj(obj_path)
    scene = build_scene(obj, rtc, pad_to=pad_to, load_textures=load_textures)
    return scene, rtc
