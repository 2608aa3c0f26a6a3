"""Render every bundled reference scene (smoke demo).

Usage: python examples/render_scenes.py [outdir] [--small]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import time
import jax

from orion_tpu import prepare
from orion_tpu.io.image import save_image
from orion_tpu.render import render

ASSETS = Path("/root/reference/assets")
SCENES = {
    # name: (spp, depth override or None)
    "cornell-box": (16, 6),
    "view_test": (4, None),
    "nanosuit": (2, 2),
    "hindu": (4, None),
}


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("renders")
    small = "--small" in sys.argv
    outdir.mkdir(parents=True, exist_ok=True)
    for name, (spp, depth) in SCENES.items():
        ps = prepare(ASSETS / f"{name}.rtc",
                     xres=320 if small else None,
                     yres=180 if small else None)
        md = depth if depth is not None else max(ps.rtc.recursion_level, 1)
        t0 = time.perf_counter()
        import numpy as np

        img = np.asarray(render(ps.scene, ps.camera, jax.random.key(0),
                                samples=spp, max_depth=md, light_samples=2,
                                intersect=ps.intersect))
        dt = time.perf_counter() - t0
        out = outdir / f"{name}.png"
        save_image(out, img)
        print(f"{name:12s} [{ps.backend:12s}] {img.shape[1]}x{img.shape[0]} "
              f"@{spp}spp depth{md} in {dt:.1f}s -> {out}")


if __name__ == "__main__":
    main()
