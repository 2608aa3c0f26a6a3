"""Round-3: cost of the binned-sweep jnp scaffold pieces at wavefront
scale (N=1M rays, K=134 bins) on the real chip — decides whether the
round loop carries [N,K] arrays or a one-time top-R selection."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, K, R = 1 << 20, 134, 12


def bench(name, fn, *args, iters=10):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - t0) / iters * 1e3:8.3f} ms",
          flush=True)
    return out


def main():
    kk = jax.random.split(jax.random.key(0), 8)
    o = jax.random.normal(kk[0], (3, N), jnp.float32)
    d = jax.random.normal(kk[1], (3, N), jnp.float32)
    lo = jax.random.normal(kk[2], (K, 3), jnp.float32)
    hi = lo + jnp.abs(jax.random.normal(kk[3], (K, 3))) + 0.1
    entry = jax.random.uniform(kk[4], (N, K), jnp.float32)
    keys = jax.random.randint(kk[5], (N,), 0, K + 1, jnp.int32)
    st = jax.random.normal(kk[6], (8, N), jnp.float32)

    def slab_entry(o, d, lo, hi):
        inv = 1.0 / d                                   # [3, N]
        t0 = (lo.T[:, None, :] - o[:, :, None]) * inv[:, :, None]
        t1 = (hi.T[:, None, :] - o[:, :, None]) * inv[:, :, None]
        tn = jnp.minimum(t0, t1).max(axis=0)            # [N, K]
        tf = jnp.maximum(t0, t1).min(axis=0)
        ok = tf >= jnp.maximum(tn, 0.0)
        return jnp.where(ok, jnp.maximum(tn, 0.0), jnp.inf)

    bench("slab entry [N,K]", slab_entry, o, d, lo, hi)
    bench("min+argmin [N,K]",
          lambda e: (e.min(axis=1), e.argmin(axis=1)), entry)
    bench("masked update [N,K]",
          lambda e, b: jnp.where(
              jax.nn.one_hot(b, K, dtype=bool), jnp.inf, e),
          entry, keys % K)
    bench("full sort [N,K] pairs",
          lambda e: jax.lax.sort(
              (e, jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32),
                                   (N, K))), num_keys=1, dimension=1),
          entry)
    bench(f"top_k R={R} (via -entry)",
          lambda e: jax.lax.top_k(-e, R), entry)
    bench("argsort keys [N]",
          lambda k: jnp.argsort(k, stable=True), keys)
    perm = jnp.argsort(keys)
    bench("gather 8 planes by perm",
          lambda s, p: s[:, p], st, perm)
    bench("scatter 8 planes by perm",
          lambda s, p: jnp.zeros_like(s).at[:, p].set(s), st, perm)
    bench("gather [N,32] rows (attr)",
          lambda tabT, r: tabT[r],
          jax.random.normal(kk[7], (52 * 1024, 32)),
          (keys.astype(jnp.int32) * 379) % (52 * 1024))


if __name__ == "__main__":
    main()
