"""Viewer tests: fly camera math, scripted preview loop, rtc round-trip."""

import math

import numpy as np

from orion_tpu.io.rtc import parse_rtc
from orion_tpu.viewer import FlyCamera, run_viewer


def test_flycamera_front_roundtrip(assets_dir):
    rtc = parse_rtc(assets_dir / "view_test.rtc")
    cam = FlyCamera.from_rtc(rtc)
    front_ref = np.asarray(rtc.look_at) - np.asarray(rtc.view_point)
    front_ref = front_ref / np.linalg.norm(front_ref)
    np.testing.assert_allclose(cam.front, front_ref, atol=1e-6)


def test_flycamera_moves_along_front(assets_dir):
    rtc = parse_rtc(assets_dir / "view_test.rtc")
    cam = FlyCamera.from_rtc(rtc)
    p0 = cam.position.copy()
    cam.move(forward=2)
    assert np.linalg.norm(cam.position - p0) > 0
    np.testing.assert_allclose(
        (cam.position - p0) / np.linalg.norm(cam.position - p0),
        cam.front, atol=1e-6)


def test_viewer_scripted_session(assets_dir, tmp_path):
    """Drive the loop with a key script: move, turn, dump camera, quit."""
    out = tmp_path / "preview.png"
    dump = tmp_path / "dump.rtc"
    msgs = []
    cam = run_viewer(str(assets_dir / "view_test.rtc"),
                     xres=32, yres=18, out=str(out), dump_path=str(dump),
                     input_stream=["w", "\x1b[C", "p", "q"],
                     echo=msgs.append)
    assert out.exists()
    assert dump.exists()
    # dumped rtc parses back and matches the final camera state direction
    dumped = parse_rtc(dump)
    cam2 = FlyCamera.from_rtc(dumped)
    # p was pressed before the final quit; yaw advanced by one TURN
    assert math.isfinite(cam2.yaw)
    np.testing.assert_allclose(np.asarray(dumped.view_point),
                               cam.position, atol=1e-5)
    assert any("dumped" in m for m in msgs)
