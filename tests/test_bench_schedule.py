"""Bench harness schedule integrity (bench.py).

The driver's record is only as good as the schedule: a config name that
drifts out of CONFIGS silently drops from the record (the round-4/5
whitted-train parking made the "runnable by hand" note false), and a
BATCHES typo would error mid-run. bench.py imports no jax at module
level, so these checks are cheap.
"""

import importlib.util
import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_batches_are_known_configs(bench):
    for batch in bench.BATCHES:
        for name in batch:
            assert name in bench.CONFIGS, name


def test_no_config_scheduled_twice(bench):
    flat = [n for b in bench.BATCHES for n in b]
    assert len(flat) == len(set(flat))
    assert bench.HEADLINE not in flat  # headline runs before the batches
    assert "canary" not in flat


def test_headline_and_canary_exist(bench):
    assert bench.HEADLINE in bench.CONFIGS
    assert "canary" in bench.CONFIGS


def test_unscheduled_subset_of_configs(bench):
    # UNSCHEDULED names must stay runnable by hand via --config
    assert bench.UNSCHEDULED <= set(bench.CONFIGS)


def test_every_config_scheduled_or_explicitly_parked(bench):
    """main()'s actual schedule (compute_batches): every config must
    either run or sit in UNSCHEDULED on purpose."""
    ran = {bench.HEADLINE, "canary"}
    for b in bench.compute_batches():
        ran.update(b)
    assert ran | bench.UNSCHEDULED >= set(bench.CONFIGS)


def test_unscheduled_excluded_from_schedule(bench, monkeypatch):
    """Parking a config in UNSCHEDULED keeps it out of compute_batches'
    catch-all, while an unparked new config still gets picked up."""
    parked, picked = "_parked_for_test", "_new_for_test"
    monkeypatch.setitem(bench.CONFIGS, parked, (lambda: {}, 60))
    monkeypatch.setitem(bench.CONFIGS, picked, (lambda: {}, 60))
    monkeypatch.setattr(bench, "UNSCHEDULED", {parked})
    flat = [n for b in bench.compute_batches() for n in b]
    assert parked not in flat
    assert picked in flat


def test_config_timeouts_positive(bench):
    for name, (fn, timeout) in bench.CONFIGS.items():
        assert callable(fn), name
        assert timeout > 0, name


def test_marker_parsing_roundtrip(bench):
    lines = [
        "noise line",
        bench._MARK + json.dumps({"name": "a", "seconds": 1.5}),
        "more noise " + bench._MARK,  # marker not at line start: ignored
        bench._MARK + json.dumps({"name": "b", "error": "exit 1"}),
    ]
    got = bench._parse_markers("\n".join(lines))
    assert set(got) == {"a", "b"}
    assert got["a"]["seconds"] == 1.5
    assert "error" in got["b"]
