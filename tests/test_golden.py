"""Golden-image regression tests.

Goldens were rendered on the CPU backend at fixed seeds (tests/goldens/,
regenerate with the snippet in each golden's name spec below if renderer
behavior changes *intentionally* — and record why in the commit).

The reference project verified by eyeballing committed renders
(/root/reference/images/, SURVEY.md §4); these make that machine-checked.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from orion_tpu.engine import prepare, render_prepared

GOLDENS = Path(__file__).parent / "goldens"

SPECS = {
    "cornell_path_48x32_s4": ("cornell-box.rtc", dict(xres=48, yres=32),
                              dict(samples=4, max_depth=4, light_samples=2,
                                   mode="path")),
    "view_test_whitted_48x32_s2": ("view_test.rtc", dict(xres=48, yres=32),
                                   dict(samples=2, max_depth=1,
                                        light_samples=1, mode="whitted")),
    "nanosuit_whitted_32x48_s1": ("nanosuit.rtc", dict(xres=32, yres=48),
                                  dict(samples=1, max_depth=2,
                                       light_samples=1, mode="whitted")),
    "hindu_whitted_48x32_s2": ("hindu.rtc", dict(xres=48, yres=32),
                               dict(samples=2, max_depth=1,
                                    light_samples=1, mode="whitted")),
}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_golden(assets_dir, name):
    rtc, prep_kw, render_kw = SPECS[name]
    golden_path = GOLDENS / f"{name}.npz"
    assert golden_path.exists(), f"golden missing: {golden_path}"
    with np.load(golden_path) as z:
        golden = z["image"]

    ps = prepare(assets_dir / rtc, **prep_kw)
    img = np.asarray(render_prepared(ps, jax.random.key(42), **render_kw))
    assert img.shape == golden.shape
    np.testing.assert_allclose(img, golden, rtol=1e-4, atol=1e-5)
