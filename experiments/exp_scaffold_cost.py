"""Round-3: attribute the wavefront's non-traversal time, with CORRECT
axon-tunnel timing (dispatch n calls back-to-back, fetch ONE scalar at
the end — block_until_ready alone does not force execution here; see
bench.py's methodology note).

Pieces timed on the flagship shape (N = 256*256*16 = 1,048,576 rays):
  - argsort 1M i32 + 6-array permute (the sort_bounces step)
  - hit_attributes on a realistic Hit (the gather stack)
  - _nee scaffold with a stubbed intersect (tiling + sample_mesh_point)
  - threefry uniforms per bounce
  - one full _path_bounce with stubbed intersect
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc, primary_rays
from orion_tpu.ops.intersect import Hit, hit_attributes
from orion_tpu.render import _nee, _path_bounce
from orion_tpu.ops import shade
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"
N = 256 * 256 * 16


def timeit(fn, *args, iters=10):
    out = fn(*args)                     # compile
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    return (time.perf_counter() - t0) / iters


def main():
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    r.xres = r.yres = 256
    cam = camera_from_rtc(r)
    key = jax.random.key(0)

    orig, dirs = primary_rays(cam, 0.0, 0.0)
    orig = jnp.tile(orig, (16, 1))
    dirs = jnp.tile(dirs, (16, 1))
    T = scene.num_triangles

    # realistic hit: random tri ids, t ~ 1
    tri = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    hit = Hit(t=jnp.full((N,), 1.0), tri_id=tri)

    # 1. sort + permute
    @jax.jit
    def sort_step(o, d, seed):
        k = (d[:, 0] * 997.0).astype(jnp.int32) + seed
        perm = jnp.argsort(k, stable=True)
        arrs = (o, d, o * 0.5, d * 0.5)
        out = tuple(a[perm] for a in arrs)
        return out[0]

    dt = timeit(sort_step, orig, dirs, 1)
    print(f"argsort+4x[N,3] permute:   {dt * 1e3:8.2f} ms")

    # 2. hit_attributes
    @jax.jit
    def attrs_fn(o, d, t, ti):
        a = hit_attributes(scene, o, d, Hit(t=t, tri_id=ti))
        return a.point + a.s_normal + a.uv[:, :1] + a.g_normal

    dt = timeit(attrs_fn, orig, dirs, hit.t, hit.tri_id)
    print(f"hit_attributes:            {dt * 1e3:8.2f} ms")

    # 3. NEE scaffold with stub intersect
    def stub(scene, o, d, *, alive=None):
        n = o.shape[0]
        return Hit(t=jnp.ones((n,)), tri_id=jnp.zeros((n,), jnp.int32))

    @jax.jit
    def nee_fn(o, d, t, ti):
        a = hit_attributes(scene, o, d, Hit(t=t, tri_id=ti))
        kd = shade.diffuse_color(scene, a.mat_id, a.uv)
        return _nee(scene, a, kd, jnp.ones((N,), bool), key, 2, stub)

    dt = timeit(nee_fn, orig, dirs, hit.t, hit.tri_id)
    print(f"nee scaffold (stub walk):  {dt * 1e3:8.2f} ms")

    # 4. threefry per bounce
    @jax.jit
    def rng_fn(k):
        k1, k2, k3 = jax.random.split(k, 3)
        u = jax.random.uniform(k1, (2, 3, N))
        v = jax.random.uniform(k2, (N,))
        w = jax.random.uniform(k3, (2, N))
        return u[0, 0] + v + w[0]

    dt = timeit(rng_fn, key)
    print(f"threefry (2,3,N)+(N)+(2,N):{dt * 1e3:8.2f} ms")

    # 5. full path bounce with stub intersect
    @jax.jit
    def bounce_fn(o, d):
        carry = (o, d, jnp.ones((N, 3)), jnp.ones((N,), bool))
        carry, rad = _path_bounce(scene, carry, 1, key, 2, 8, stub, False)
        return rad + carry[0]

    dt = timeit(bounce_fn, orig, dirs)
    print(f"full bounce (stub walks):  {dt * 1e3:8.2f} ms")

    # 6. cosine_sample + reflect-ish shading tail alone
    @jax.jit
    def tail_fn(o, d):
        a = hit_attributes(scene, o, d, hit)
        u = jax.random.uniform(key, (2, N))
        nd = shade.cosine_sample(a.s_normal, u[0], u[1])
        return nd + a.point
    dt = timeit(tail_fn, orig, dirs)
    print(f"attrs+cosine tail:         {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
