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
    """
    already = jax.process_count() > 1
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
