"""Follow-up: verify sort costs with varying inputs and replicate the
trace_wavefront scan+permute structure to find the 0.9s."""

import time

import jax
import jax.numpy as jnp

N = 1 << 20


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


@jax.jit
def sort_fresh(seed):
    k = jax.random.fold_in(jax.random.key(0), seed)
    keys = jax.random.randint(k, (N,), 0, 1 << 21, dtype=jnp.int32)
    perm = jnp.argsort(keys)
    return perm[0] + perm[-1]


@jax.jit
def scan_sorted(seed):
    k = jax.random.fold_in(jax.random.key(0), seed)
    orig = jax.random.normal(k, (N, 3))
    dirs = jax.random.normal(k, (N, 3))
    thr = jnp.ones((N, 3))
    alive = jnp.ones((N,), bool)
    pix = jnp.arange(N, dtype=jnp.int32)
    acc = jnp.zeros((N, 3))

    def body(carry, depth):
        orig, dirs, thr, alive, pix, acc = carry
        # stand-in for the bounce: touch everything cheaply
        acc = acc + thr * 0.1
        dirs = dirs * 0.999
        key = (dirs[:, 0] * 1000).astype(jnp.int32) + depth
        perm = jnp.argsort(jnp.where(alive, key, 1 << 30), stable=True)
        carry = tuple(a[perm] for a in (orig, dirs, thr, alive, pix, acc))
        return carry, None

    carry, _ = jax.lax.scan(body, (orig, dirs, thr, alive, pix, acc),
                            jnp.arange(9))
    return jnp.zeros((N, 3)).at[carry[4]].set(carry[5]).sum()


@jax.jit
def scan_unsorted(seed):
    k = jax.random.fold_in(jax.random.key(0), seed)
    orig = jax.random.normal(k, (N, 3))
    dirs = jax.random.normal(k, (N, 3))
    thr = jnp.ones((N, 3))
    alive = jnp.ones((N,), bool)

    def body(carry, depth):
        orig, dirs, thr, alive = carry
        acc = thr * 0.1
        dirs = dirs * 0.999
        return (orig, dirs, thr, alive), acc

    _, accs = jax.lax.scan(body, (orig, dirs, thr, alive), jnp.arange(9))
    return accs.sum()


def main():
    for name, fn in [("sort fresh-keys", sort_fresh),
                     ("scan 9x sort+permute+scatter", scan_sorted),
                     ("scan 9x no sort", scan_unsorted)]:
        dt = timeit(fn, 1)
        print(f"{name}: {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
