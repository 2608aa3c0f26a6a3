"""Micro-bench: what does reordering a 1M-ray wavefront actually cost?

argsort vs sort_key_val vs counting-sort-by-small-key, plus the gather
that applies the permutation to the ray state.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.key(0)
    keys32 = jax.random.randint(key, (N,), 0, 1 << 21, dtype=jnp.int32)
    state = jax.random.normal(key, (N, 12), jnp.float32)
    state_rows = jax.random.normal(key, (12, N), jnp.float32)

    argsort = jax.jit(lambda k: jnp.argsort(k))
    dt = timeit(lambda: argsort(keys32))
    print(f"argsort 1M i32:            {dt * 1e3:.2f} ms")

    skv = jax.jit(lambda k: jax.lax.sort_key_val(
        k, jnp.arange(N, dtype=jnp.int32)))
    dt = timeit(lambda: skv(keys32))
    print(f"sort_key_val 1M:           {dt * 1e3:.2f} ms")

    perm = argsort(keys32)

    gather_rowmajor = jax.jit(lambda s, p: s[p])
    dt = timeit(lambda: gather_rowmajor(state, perm))
    print(f"gather [N,12] rows:        {dt * 1e3:.2f} ms")

    gather_cols = jax.jit(lambda s, p: s[:, p])
    dt = timeit(lambda: gather_cols(state_rows, perm))
    print(f"gather [12,N] cols:        {dt * 1e3:.2f} ms")

    # sort key + full state in ONE multi-operand lax.sort
    def sort_all(k, s):
        ops = (k,) + tuple(s[i] for i in range(12))
        out = jax.lax.sort(ops, num_keys=1)
        return out[1]

    sort_all_j = jax.jit(sort_all)
    dt = timeit(lambda: sort_all_j(keys32, state_rows))
    print(f"lax.sort key+12 operands:  {dt * 1e3:.2f} ms")

    # small-key counting sort: 2048 buckets via histogram + searchsorted
    def counting(k):
        hist = jnp.zeros(2048, jnp.int32).at[k >> 10].add(1)
        offs = jnp.cumsum(hist) - hist
        # rank within bucket via stable argsort fallback comparison only
        return offs

    print("(counting-sort rank step needs scatter-rank; skipped)")


if __name__ == "__main__":
    main()
