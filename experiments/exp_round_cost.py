"""Round-3: isolate the ~92ms fixed cost of one binned round."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.camera import camera_from_rtc
from orion_tpu.ops import pallas_binned as pb
from orion_tpu.scene import load_scene, subdivide_scene

N, K = 262144, 134
rb = 512
n_pad = N
G = n_pad // rb


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter() - t0) / iters * 1e3:9.3f} ms",
          flush=True)


def main():
    kk = jax.random.split(jax.random.key(0), 8)
    e_s = jnp.sort(jax.random.uniform(kk[0], (N, K)), axis=1)
    ord_s = jax.random.randint(kk[1], (N, K), 0, K, jnp.int32)
    done = jax.random.randint(kk[2], (N,), 0, K, jnp.int32)
    key = jax.random.randint(kk[3], (N,), 0, K + 1, jnp.int32)
    st = jax.random.normal(kk[4], (16, n_pad), jnp.float32)
    t = jax.random.normal(kk[5], (n_pad,), jnp.float32)

    bench("take_along e_s [N,K] by done",
          lambda e, i: jnp.take_along_axis(
              e, jnp.minimum(i, K - 1)[:, None], axis=1)[:, 0], e_s, done)
    bench("take_along BOTH (e_s, ord_s)",
          lambda e, o, i: (jnp.take_along_axis(
              e, jnp.minimum(i, K - 1)[:, None], axis=1),
              jnp.take_along_axis(
                  o, jnp.minimum(i, K - 1)[:, None], axis=1)),
          e_s, ord_s, done)
    bench("one_hot dot instead of gather",
          lambda e, i: jnp.einsum("nk,nk->n",
                                  e, jax.nn.one_hot(i, K, dtype=e.dtype)),
          e_s, done)
    bench("argsort key [N]", lambda k: jnp.argsort(k), key)
    perm = jnp.argsort(key)
    bench("perm-gather st 8 rows",
          lambda s, p: s[:8, p], st, perm)
    bench("scatter t by perm",
          lambda t, p: t.at[p].set(t), t, perm)

    # the pallas round call with NO active blocks
    scene, r = load_scene("/root/reference/assets/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    bins, tab, _ = pb.binned_device_data(scene, max_rows=512)
    call = pb.build_bin_round_call(bins.k, n_pad, rb, False)
    r0c = jnp.asarray(bins.row0)
    nbc = jnp.asarray(bins.n_bundles)
    blk_dead = jnp.full((G,), bins.k, jnp.int32)
    blk_hi_dead = jnp.full((G,), bins.k - 1, jnp.int32)
    bini = jnp.full((8, n_pad), bins.k, jnp.int32)
    bench("pallas round, all blocks dead",
          lambda st, bini: call(r0c, nbc, blk_dead, blk_hi_dead, st, bini,
                                tab), st, bini, iters=5)
    blk_one = blk_dead.at[0].set(0)
    bini1 = bini.at[0, :rb].set(0)
    bench("pallas round, 1 active block",
          lambda st, bini: call(r0c, nbc, blk_one, blk_hi_dead, st, bini,
                                tab), st, bini1, iters=5)


if __name__ == "__main__":
    main()
