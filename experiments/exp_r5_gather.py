"""Round-5: price the per-bounce winner-attribute gather layouts.

The flagship pipeline gathers attrs = tab[:, rows] per bounce —
[32, B_pad] indexed along the LANE axis by ~1M winner rows. The
scaffold probe (exp_r5_scaffold) put the gather's share at up to
0.46 s of the 1.14 s pipeline. Candidate layouts:

  lane-gather   : tab[:, rows]            (production: strided reads,
                                           32 x B_pad*4B apart)
  row-gather    : tabT[rows]              ([B_pad, 32] row-major:
                                           each pick reads 128
                                           contiguous bytes)
  row-gather+T  : tabT[rows].T            (what the shade kernel's
                                           [32, rb] blocks want)
  row-gather-16 : tabT16[rows]            (only the 16 shade-needed
                                           rows -> half the bytes)

Indices in three regimes: clustered (sorted wavefront reality),
random, and constant.

Run on real TPU: python experiments/exp_r5_gather.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 20
B_PAD = 35 * 1024


def timeit(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.asarray(out).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).sum())
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((32, B_PAD), np.float32))
    tabT = jnp.asarray(np.asarray(tab).T.copy())
    tabT16 = tabT[:, :16].copy()

    rows_rand = jnp.asarray(rng.integers(0, B_PAD, N, np.int32))
    # clustered: sorted rays hit nearby leaves — emulate with a noisy ramp
    ramp = (np.linspace(0, B_PAD - 1, N)
            + rng.integers(-256, 256, N)).clip(0, B_PAD - 1)
    rows_clus = jnp.asarray(ramp.astype(np.int32))
    rows_const = jnp.zeros(N, jnp.int32)

    variants = {
        "lane-gather": jax.jit(lambda r: tab[:, r]),
        "row-gather": jax.jit(lambda r: tabT[r]),
        "row-gather+T": jax.jit(lambda r: tabT[r].T),
        "row-gather-16": jax.jit(lambda r: tabT16[r]),
    }
    for name, fn in variants.items():
        for rname, rows in [("clustered", rows_clus),
                            ("random", rows_rand),
                            ("const", rows_const)]:
            dt = timeit(fn, rows)
            print(f"{name:14s} {rname:9s} {dt * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
