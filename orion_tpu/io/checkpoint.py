"""Resumable render accumulation (checkpoint / resume).

The reference has no render checkpointing (SURVEY.md §5) — its only
persisted state is the viewer's camera dump. Long renders (the README's
cornell box took 85 minutes, /root/reference/README.md:40-46) should
survive preemption: we render in sample chunks and persist
(accumulated radiance, samples done, seed) after each chunk; re-running
with the same checkpoint path resumes where it stopped.

Determinism: in the standard mode, chunk k always draws its jitter/path
keys from fold_in(base_key, chunk_start + i) per sample index i, so the
final image is a function of (seed, total samples) alone — independent of
chunk size or how many times the render was interrupted and resumed. The
regen mode (regen=True) draws chunk keys from fold_in(key, chunk_start),
so its image additionally depends on the chunk size: resume with the same
`every` to reproduce.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path
from typing import Optional

import jax
import numpy as np


def save_checkpoint(path: str | Path, accum: np.ndarray, samples_done: int,
                    seed_key: np.ndarray, config: str = "") -> None:
    """Atomic save: write to a temp file in the same directory, then rename.

    `config` is an opaque render-configuration tag; resume refuses to mix
    accumulations produced under different estimator settings (mode, depth,
    light samples, regen) — see render_accumulate.
    """
    path = Path(path)
    fd, tmp = tempfile.mkstemp(dir=path.parent or Path("."),
                               suffix=".ckpt.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, accum=accum, samples_done=np.int64(samples_done),
                     key_data=seed_key, config=np.str_(config))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str | Path):
    """Returns (accum, samples_done, key_data, config) or None if absent."""
    path = Path(path)
    if not path.exists():
        return None
    with np.load(path) as z:
        config = str(z["config"]) if "config" in z else ""
        return z["accum"], int(z["samples_done"]), z["key_data"], config


def _progress_line(done: int, samples: int, chunk_rays: int,
                   chunk_seconds: float, start_done: int,
                   elapsed: float) -> str:
    """One in-flight progress line per chunk: samples done, rays/s, ETA.

    The operator-experience counterpart of the reference's per-scanline
    tqdm bar (/root/reference/orion/raytracer.cpp:66-68) — a multi-minute
    checkpointed render should never be silent between flushes."""
    rate = chunk_rays / max(chunk_seconds, 1e-9)
    done_since = done - start_done
    eta = (samples - done) * elapsed / max(done_since, 1)
    return (f"[render] {done}/{samples} spp  "
            f"{rate / 1e6:.2f}M primary rays/s  "
            f"chunk {chunk_seconds:.1f}s  ETA {eta:.0f}s")


def render_accumulate(ps, key, *, samples: int, light_samples: int,
                      max_depth: int, mode: Optional[str],
                      path: str | Path, every: int = 64,
                      regen: bool = False, mesh=None,
                      progress: bool = True) -> np.ndarray:
    """Render `samples` spp with checkpointed accumulation; returns the mean
    radiance image. Resumes from `path` when it exists and matches.
    `progress=True` prints a per-chunk progress line (spp done, rays/s,
    ETA) — the tqdm-per-scanline parity item (raytracer.cpp:66-68).

    With `regen=True`, chunks go through the regenerative wavefront path
    tracer (orion_tpu.regen) — much faster at high depth caps, but the
    image is then a function of (seed, samples, chunk size): regen draws
    chunk keys as fold_in(key, chunk_start), so resume with the same
    `every` to keep determinism.

    mesh: an optional jax.sharding.Mesh — chunks render via the shard_map
    paths (rays sharded per chip, scene replicated). Shard keys fold per
    chip, so images are then deterministic per (seed, device count, chunk
    size)."""
    from orion_tpu.render import render

    if regen and (mode == "whitted"
                  or (mode is None and ps.scene.num_lights > 0)):
        raise ValueError(
            "regen=True is path-mode only (render_regen has no Whitted "
            "support); this scene would render Whitted")

    key_data = np.asarray(jax.random.key_data(key))
    H, W = ps.rtc.yres, ps.rtc.xres
    accum = np.zeros((H, W, 3), np.float32)
    done = 0

    # the estimator configuration this accumulation is valid under: resuming
    # with a different mode/depth/light_samples/regen would silently average
    # two different estimators into one image
    resolved_mode = (mode if mode is not None
                     else ("whitted" if ps.scene.num_lights > 0 else "path"))
    config = (f"mode={resolved_mode};max_depth={max_depth};"
              f"light_samples={light_samples};regen={bool(regen)}"
              + (f";every={every}" if regen else ""))

    ck = load_checkpoint(path)
    if ck is not None:
        c_accum, c_done, c_key, c_config = ck
        if (c_accum.shape == accum.shape
                and np.array_equal(c_key, key_data)
                and c_config == config):
            accum, done = np.asarray(c_accum, np.float32), c_done
        # else: incompatible checkpoint -> start over (and overwrite)

    import sys
    import time

    start_done, t_start = done, time.perf_counter()
    while done < samples:
        t_chunk = time.perf_counter()
        n = min(every, samples - done)
        if regen and mesh is not None:
            from orion_tpu.regen import render_regen_shardmap

            img = render_regen_shardmap(
                ps.scene, ps.camera, jax.random.fold_in(key, done),
                mesh=mesh, samples=n, max_depth=max_depth,
                light_samples=light_samples, intersect=ps.intersect)
        elif regen:
            from orion_tpu.regen import render_regen

            img = render_regen(ps.scene, ps.camera,
                               jax.random.fold_in(key, done), samples=n,
                               max_depth=max_depth,
                               light_samples=light_samples,
                               intersect=ps.intersect)
        elif mesh is not None:
            from orion_tpu.parallel.shardmap_render import render_shardmap

            img = render_shardmap(
                ps.scene, ps.camera, jax.random.fold_in(key, done),
                mesh=mesh, samples=n, max_depth=max_depth,
                light_samples=light_samples, mode=mode,
                intersect=ps.intersect)
        else:
            # sample_offset keeps sample i's keys chunk-invariant (render
            # folds fold_in(key, done + i)), so resumes bit-match a
            # one-shot render
            img = render(ps.scene, ps.camera, key, samples=n,
                         max_depth=max_depth, light_samples=light_samples,
                         mode=mode, intersect=ps.intersect,
                         sample_offset=done,
                         shadow_intersect=ps.shadow_intersect)
        accum = accum + np.asarray(img, np.float32) * n
        done += n
        save_checkpoint(path, accum, done, key_data, config)
        if progress:
            print(_progress_line(done, samples, n * H * W,
                                 time.perf_counter() - t_chunk, start_done,
                                 time.perf_counter() - t_start),
                  file=sys.stderr, flush=True)

    return accum / float(max(done, 1))
