"""Round-3: profile ONE binned closest-hit sweep on the dumped depth-1
bounce wavefront — time + round count + per-round live sizes."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from orion_tpu.ops import pallas_binned as pb
from orion_tpu.ops.pallas_fused import _BIG
from orion_tpu.scene import load_scene, subdivide_scene

ASSETS = "/root/reference/assets"


def main():
    d = np.load("/tmp/bounce_dump.npz")
    scene, r = load_scene(f"{ASSETS}/cornell-box.rtc")
    scene = subdivide_scene(scene, levels=5)
    bins, tab, _ = pb.binned_device_data(scene, max_rows=512)
    print(f"K={bins.k}")

    for dep in (0, 1):
        orig = jnp.asarray(d[f"orig{dep}"])      # [N, 3]
        dirs = jnp.asarray(d[f"dirs{dep}"])
        alive = jnp.asarray(d[f"alive{dep}"])
        N = orig.shape[0]
        o = tuple(orig[:, i][None] for i in range(3))
        dd = tuple(dirs[:, i][None] for i in range(3))
        n_pad = ((N + 511) // 512) * 512
        call = pb.build_bin_round_call(bins.k, n_pad, 512, False)
        consts = pb.binned_consts(bins, tab)

        @jax.jit
        def fn(o, dd, a, consts):
            sweep = pb.binned_sweep_from(consts, k=bins.k, n_rays=N,
                                         call=call, ray_block=512)
            return sweep(o, dd, (22,), alive=a)[0]

        out = jax.block_until_ready(fn(o, dd, alive[None], consts))
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(o, dd, alive[None], consts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        nl = int(alive.sum())
        print(f"depth {dep}: N={N} live={nl} sweep={dt * 1e3:8.2f} ms "
              f"({nl / dt / 1e6:.2f}M rays/s)", flush=True)

    # round-by-round anatomy on depth 1 (manual loop, counts + timing)
    dep = 1
    orig = jnp.asarray(d[f"orig{dep}"])
    dirs = jnp.asarray(d[f"dirs{dep}"])
    alive = np.asarray(d[f"alive{dep}"])
    N = orig.shape[0]
    of = tuple(orig[:, i] for i in range(3))
    df = tuple(dirs[:, i] for i in range(3))
    K = bins.k
    rb = 512
    n_pad = ((N + rb - 1) // rb) * rb
    G = n_pad // rb
    call = pb.build_bin_round_call(K, n_pad, rb, False)
    r0c = jnp.asarray(bins.row0)
    nbc = jnp.asarray(bins.n_bundles)
    entry = pb._bin_entries(of, df, jnp.asarray(bins.lo),
                            jnp.asarray(bins.hi))
    entry = jnp.where(jnp.asarray(alive)[:, None], entry, jnp.inf)
    e_s, ord_s = jax.lax.sort(
        (entry, jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32), (N, K))),
        num_keys=1, dimension=1)
    pad = n_pad - N
    opad = [jnp.pad(p, (0, pad)) for p in of]
    dpad = [jnp.pad(p, (0, pad), constant_values=1.0) for p in df]
    t = jnp.pad(jnp.where(jnp.asarray(alive), _BIG, -_BIG), (0, pad),
                constant_values=-_BIG)
    row = jnp.full((n_pad,), pb._NO_ROW, jnp.float32)
    done = jnp.zeros((N,), jnp.int32)

    @jax.jit
    def one_round(t, row, done, e_s, ord_s, opad, dpad):
        idx = jnp.minimum(done, K - 1)[:, None]
        nxt = jnp.take_along_axis(e_s, idx, axis=1)[:, 0]
        b = jnp.take_along_axis(ord_s, idx, axis=1)[:, 0]
        live = (nxt < t[:N]) & (done < K)
        key = jnp.where(live, b, K)
        key = jnp.pad(key, (0, pad), constant_values=K)
        perm = jnp.argsort(key)
        key_s = key[perm]
        blk_lo = key_s.reshape(G, rb).min(axis=1)
        blk_hi = jnp.minimum(key_s.reshape(G, rb).max(axis=1), K - 1)
        st = jnp.zeros((16, n_pad), jnp.float32)
        for i in range(3):
            st = st.at[i].set(opad[i][perm]).at[3 + i].set(dpad[i][perm])
        st = st.at[6].set(t[perm]).at[7].set(row[perm])
        bini = jnp.zeros((8, n_pad), jnp.int32).at[0].set(key_s)
        out = call(r0c, nbc, blk_lo, blk_hi, st, bini, tab)
        t2 = t.at[perm].set(out[0])
        row2 = row.at[perm].set(out[1])
        return t2, row2, done + live.astype(jnp.int32), live.sum(), \
            blk_lo, blk_hi

    for rnd in range(12):
        jax.block_until_ready((t, row))
        t0 = time.perf_counter()
        t, row, done, nlive, blk_lo, blk_hi = one_round(
            t, row, done, e_s, ord_s, opad, dpad)
        nl = int(nlive)
        jax.block_until_ready(t)
        dt = time.perf_counter() - t0
        span = np.asarray(jnp.maximum(blk_hi - blk_lo + 1, 0))
        act = span[np.asarray(blk_lo) < K]
        print(f"round {rnd}: live={nl:7d} {dt * 1e3:8.2f} ms "
              f"blocks_active={len(act):4d} mean_span={act.mean() if len(act) else 0:6.1f} "
              f"max_span={act.max() if len(act) else 0}", flush=True)
        if nl == 0:
            break


if __name__ == "__main__":
    main()
