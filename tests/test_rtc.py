"""Tests for the .rtc parser/writer (format parity with rtc_parser.cpp)."""

import math

import pytest

from orion_tpu.io.rtc import RTCData, PointLight, parse_rtc, write_rtc


def test_parse_cornell(assets_dir):
    rtc = parse_rtc(assets_dir / "cornell-box.rtc")
    assert rtc.obj_file == "cornell-box/cornell-box.obj"
    assert rtc.texture_file == "view_test.png"
    assert rtc.recursion_level == 20
    assert (rtc.xres, rtc.yres) == (1920, 1080)
    assert rtc.view_point == pytest.approx((-0.10141, 1.0, 3.00498))
    assert rtc.look_at == pytest.approx((-0.10141, 1.0, 2.00498))
    assert rtc.vector_up == (0.0, 1.0, 0.0)
    assert rtc.y_view == 1.0
    assert rtc.lights == []  # the only L line is commented out
    assert rtc.aspect_ratio == pytest.approx(1920 / 1080)


def test_parse_view_test(assets_dir):
    rtc = parse_rtc(assets_dir / "view_test.rtc")
    assert rtc.obj_file == "view_test.obj"
    assert rtc.recursion_level == 1
    assert (rtc.xres, rtc.yres) == (600, 400)
    assert len(rtc.lights) == 1
    light = rtc.lights[0]
    assert light.position == (0.5, 0.5, 0.5)
    # rgb normalized /255 (rtc_parser.cpp:116)
    assert light.color == pytest.approx((1.0, 1.0, 250 / 255))
    assert light.intensity == 32.0


def test_parse_nanosuit_commented_lights(assets_dir):
    rtc = parse_rtc(assets_dir / "nanosuit.rtc")
    assert rtc.obj_file == "nanosuit2/nanosuit2.obj"
    assert len(rtc.lights) == 1  # two more are commented out


def test_roundtrip(tmp_path):
    rtc = RTCData(
        obj_file="scene.obj", texture_file="tex.png", recursion_level=7,
        xres=320, yres=240, view_point=(1.5, -2.0, 3.25),
        look_at=(0.0, 0.0, 0.0), vector_up=(0.0, 1.0, 0.0), y_view=1.25,
        lights=[PointLight((1, 2, 3), (1.0, 0.5, 0.0), 10.0)],
    )
    p = tmp_path / "dump.rtc"
    write_rtc(p, rtc)
    back = parse_rtc(p)
    assert back.obj_file == rtc.obj_file
    assert back.recursion_level == 7
    assert (back.xres, back.yres) == (320, 240)
    assert back.view_point == pytest.approx(rtc.view_point)
    assert back.y_view == pytest.approx(1.25)
    assert len(back.lights) == 1
    assert back.lights[0].position == pytest.approx((1, 2, 3))
    # color quantized to 0-255 ints on write
    assert back.lights[0].color[0] == pytest.approx(1.0)
    assert back.lights[0].intensity == 10.0


def test_comments_and_blank_lines(tmp_path):
    p = tmp_path / "scene.rtc"
    p.write_text(
        "# header comment\n\nmodel.obj\n  \ntex.png\n3\n# mid comment\n"
        "100 50\n0 0 5\n0 0 0\n0 1 0\n1.5\nL 1 1 1 255 0 0 2\n"
    )
    rtc = parse_rtc(p)
    assert rtc.obj_file == "model.obj"
    assert rtc.recursion_level == 3
    assert (rtc.xres, rtc.yres) == (100, 50)
    assert rtc.lights[0].color == pytest.approx((1.0, 0.0, 0.0))


def test_incomplete_raises(tmp_path):
    p = tmp_path / "bad.rtc"
    p.write_text("model.obj\ntex.png\n3\n")
    with pytest.raises(ValueError):
        parse_rtc(p)
