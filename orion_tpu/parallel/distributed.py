"""Multi-host initialization and distributed render orchestration.

The reference is strictly single-process shared-memory OpenMP
(/root/reference/orion/raytracer.cpp:70, SURVEY.md §2.4). The TPU-native
scaling story spans hosts: `jax.distributed.initialize` brings every
host's chips into one global device view; the ray-sharded mesh then spans
the pod slice, with forward rendering needing zero cross-host traffic
(tile decomposition) and training all-reducing scene-parameter gradients
over ICI/DCN via the shard_map/GSPMD machinery in this package.

Usage on each host of a pod slice (or under SLURM/GKE auto-detection):

    from orion_tpu.parallel.distributed import init_distributed, host_tile
    init_distributed()                      # env-based auto-config
    mesh = make_mesh()                      # spans ALL hosts' devices
    img = render_shardmap(scene, cam, key, mesh=mesh, ...)

Every host computes the full-image accumulation of its addressable shard;
`host_tile` exposes which output rows belong to this host when writing
per-host tiles instead of a replicated image.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX (no-op on a single process).

    With no arguments, relies on jax.distributed's environment
    auto-detection (TPU pod metadata, SLURM, GKE). Returns a summary of
    the resulting topology.

    NOTE: must run before anything touches the XLA backend — including
    jax.process_count()/jax.devices(). The already-initialized check
    therefore reads the distributed client state, not the backend.
    """
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # private-API drift: assume not initialized
        already = False
    if not already and (coordinator_address or num_processes):
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif not already:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / no coordinator: stay local
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def render_multihost(scene, camera, key, *, samples: int,
                     max_depth: int = 1, light_samples: int = 2,
                     mode=None, intersect=None, shadow_intersect=None):
    """Sample-parallel multi-host render: process i renders the sample
    range [i*S/P, (i+1)*S/P) locally (render()'s sample_offset keeps the
    per-sample RNG streams identical to a single-process [0, S) render),
    then ONE cross-process all-gather merges the partial accumulations.
    The result matches the single-process image to float summation
    tolerance on every host.

    This is the tile decomposition of the reference's OpenMP pixel loop
    (raytracer.cpp:69-88) lifted across hosts, with the one collective
    the reference never needs. Returns a numpy [H, W, 3] image.
    """
    import numpy as np
    from jax.experimental import multihost_utils

    from orion_tpu.render import render

    p, n = jax.process_index(), jax.process_count()
    base, extra = divmod(samples, n)
    mine = base + (1 if p < extra else 0)
    offset = p * base + min(p, extra)
    if mine > 0:
        img = render(scene, camera, key, samples=mine,
                     max_depth=max_depth, light_samples=light_samples,
                     mode=mode, intersect=intersect,
                     shadow_intersect=shadow_intersect,
                     sample_offset=offset)
        part = img * (mine / samples)
    else:
        H, W = camera.yres, camera.xres
        part = jax.numpy.zeros((H, W, 3), jax.numpy.float32)
    parts = multihost_utils.process_allgather(part)      # [P, H, W, 3]
    return np.asarray(parts).sum(axis=0)


def measure_collective_bytes(jitted_fn, *args, **kwargs) -> dict:
    """Lower + compile a jitted function and report the bytes its
    cross-device collectives move per call, by walking the optimized HLO
    for all-reduce / all-gather / reduce-scatter / collective-permute
    ops. Replaces BENCHMARKS.md's former asserted-not-measured figure."""
    import re

    compiled = jitted_fn.lower(*args, **kwargs).compile()
    text = compiled.as_text()
    sizes = {"all-reduce": 0, "all-gather": 0, "reduce-scatter": 0,
             "collective-permute": 0}
    count = 0
    # line-based: handles both scalar results
    #   %all-reduce.1 = f32[8,128]{1,0} all-reduce(...)
    # and TUPLE results (a multi-operand psum fuses into one op)
    #   %all-reduce = (f32[], f32[128,8]{1,0}, f32[3]{0}) all-reduce(...)
    op_pat = re.compile(
        r"=\s*(.*?)\s*"
        r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
        r"(?:-start)?\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                   "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1,
                   "u8": 1}
    for line in text.splitlines():
        m = op_pat.search(line)
        if not m:
            continue
        shapes, op = m.groups()
        for dt, shape in shape_pat.findall(shapes):
            n = 1
            for d in shape.split(","):
                if d:
                    n *= int(d)
            sizes[op] += n * dtype_bytes.get(dt, 4)
        count += 1
    total = sum(sizes.values())
    return {"ops": count, "bytes_per_call": total, "by_kind": sizes}


def host_tile(total_rows: int) -> tuple[int, int]:
    """[start, end) image-row range owned by this host under an even
    row-major split — for writing per-host image tiles."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-total_rows // n)
    start = min(p * per, total_rows)
    return start, min(start + per, total_rows)


def scaling_report(seconds_1chip: float, seconds_nchip: float,
                   n_chips: int) -> dict:
    """Scaling efficiency metric (BASELINE.md north star: >= 85%)."""
    speedup = seconds_1chip / max(seconds_nchip, 1e-12)
    return {
        "chips": n_chips,
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / n_chips, 4),
    }
