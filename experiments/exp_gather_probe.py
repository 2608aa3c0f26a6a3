"""Round-3 probe: which dynamic-gather forms does Mosaic lower in-kernel?

Per-lane node pointers in a BVH traversal need SOME vectorized gather:
  A. take_along_axis along lanes:   tab [8, M], idx [8, 128]
  B. gather rows by vector index:   tab [M, 128], idx [8, 128] (sublane dim)
  C. jnp.take flat:                 tab [1, M] -> idx [8, 128]
  D. one-hot matmul fallback:       always works, O(M) per gather

Each is tried in its own pallas_call; failures print the exception class.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 2048


def run(name, kernel, outshape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=outshape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        out = jax.jit(fn)(*args)
        s = float(jnp.sum(out))
        print(f"{name}: OK sum={s:.1f}")
        return fn
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")
        return None


def main():
    tab_lane = jnp.arange(8 * M, dtype=jnp.float32).reshape(8, M)
    tab_sub = jnp.arange(M * 128, dtype=jnp.float32).reshape(M, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 7) % M

    def k_a(tab_ref, idx_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(
            tab_ref[:, :], idx_ref[:, :], axis=1)

    run("A take_along_axis lanes", k_a,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), tab_lane, idx)

    def k_b(tab_ref, idx_ref, o_ref):
        o_ref[:, :] = tab_ref[idx_ref[:, :], 0]

    run("B int-array row index", k_b,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), tab_sub, idx)

    def k_c(tab_ref, idx_ref, o_ref):
        flat = tab_ref[0, :]
        o_ref[:, :] = jnp.take(flat, idx_ref[:, :])

    run("C jnp.take flat", k_c,
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        tab_lane[0:1], idx)

    def k_d(tab_ref, idx_ref, o_ref):
        # one-hot: [8,128] idx vs M -> contraction over M
        oh = (idx_ref[:, :, None]
              == jax.lax.broadcasted_iota(jnp.int32, (1, 1, M), 2))
        o_ref[:, :] = jnp.einsum("glm,m->gl", oh.astype(jnp.float32),
                                 tab_ref[0, :],
                                 preferred_element_type=jnp.float32)

    run("D one-hot contraction", k_d,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), tab_lane[0:1], idx)

    # E: gather along SUBLANES: tab [M8, 128] where value wanted per lane l
    # is tab[idx[s,l], l] — "dynamic gather" per-lane row select
    def k_e(tab_ref, idx_ref, o_ref):
        o_ref[:, :] = jnp.take_along_axis(tab_ref[:, :], idx_ref[:, :],
                                          axis=0)

    run("E take_along_axis sublanes", k_e,
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
        tab_sub[:8], (idx % 8))

    # E2: same but taller table (gather across 2048 sublanes)
    run("E2 take_along_axis sublanes tall", k_e,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), tab_sub, idx)

    # timings for whichever worked, at realistic traversal sizes
    def timeit(fn, *args, iters=20):
        out = jax.jit(fn)(*args)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jax.jit(fn)(*args)
        float(jnp.sum(out))
        return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    main()
