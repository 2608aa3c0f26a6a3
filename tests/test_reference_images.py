"""Statistical comparison against the REFERENCE's own committed render.

The self-generated goldens (tests/test_golden.py) catch regressions but
could never catch "wrong since round 1"; this test anchors the renderer
to ground truth the reference project shipped:
/root/reference/images/cornell-box_fhd.png — its README flagship
(1920x1080, 2048 spp, depth 100, light samples 2, README.md:38-46),
written through its own brighten-to-max PNG normalization
(raytracer.cpp:264-271).

Method: render the same scene/camera at a downscaled resolution and spp,
tone-map both images identically (divide by max), and compare per-region
means over the image interior (the cornell box occupies the center of the
16:9 frame; the side margins are black and carry only noise). Tolerances
account for (a) Monte-Carlo noise at test spp, (b) the documented
estimator deviations in PARITY.md (normalized sampling frame, full-
precision normalize, corrected triangle areas).
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from orion_tpu.engine import prepare, render_prepared

REF_IMAGE = Path("/root/reference/images/cornell-box_fhd.png")


@pytest.fixture(scope="module")
def pair(assets_dir):
    from PIL import Image

    W, H = 192, 108  # 1/10th of the reference render, same 16:9 camera
    ps = prepare(assets_dir / "cornell-box.rtc", xres=W, yres=H)
    img = np.asarray(render_prepared(ps, jax.random.key(7), samples=24,
                                     max_depth=8, light_samples=2,
                                     mode="path"))
    ours = img / img.max()

    ref = np.asarray(Image.open(REF_IMAGE)).astype(np.float32)[..., :3] / 255.0
    refd = ref.reshape(H, 10, W, 10, 3).mean(axis=(1, 3))  # block-mean 10x
    return ours, refd


def test_pixel_correlation(pair):
    """Tone-mapped pixelwise correlation: structure must match (walls,
    boxes, light patch in the same places at the same relative levels)."""
    ours, ref = pair
    c = np.corrcoef(ours.flatten(), ref.flatten())[0, 1]
    assert c > 0.93, f"pixel correlation vs reference render: {c:.4f}"


def test_interior_region_means(pair):
    """3x3 region means over the box interior within 35% of the reference.

    35% covers Monte-Carlo noise at 24 spp (the reference used 2048) plus
    the PARITY.md estimator deviations; measured agreement is ~10-17% in
    lit regions (see BENCHMARKS.md "Ground truth" section).
    """
    ours, ref = pair
    H, W = ours.shape[:2]
    x0, x1 = W // 4, W - W // 4   # central half: the box occupies ~16:9
    o = ours[:, x0:x1]
    r = ref[:, x0:x1]
    gy = gx = 3
    h, w = (H // gy) * gy, ((x1 - x0) // gx) * gx
    om = o[:h, :w].reshape(gy, h // gy, gx, w // gx, 3).mean(axis=(1, 3))
    rm = r[:h, :w].reshape(gy, h // gy, gx, w // gx, 3).mean(axis=(1, 3))
    rel = np.abs(om - rm) / np.maximum(rm, 0.05)
    assert rel.max() < 0.35, f"region mean rel diffs:\n{rel.max(axis=-1)}"


def test_brightness_scale(pair):
    """Overall tone-mapped brightness within 25% of the reference."""
    ours, ref = pair
    ratio = ours.mean() / ref.mean()
    assert 0.75 < ratio < 1.25, f"brightness ratio vs reference: {ratio:.3f}"
