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
    """Replicates main()'s schedule: headline + batches + catch-all.
    Every config must either run or sit in UNSCHEDULED on purpose."""
    scheduled = {bench.HEADLINE, "canary"}
    for b in bench.BATCHES:
        scheduled.update(n for n in b if n in bench.CONFIGS)
    catch_all = {n for n in bench.CONFIGS
                 if n not in scheduled and n not in bench.UNSCHEDULED}
    covered = scheduled | catch_all | bench.UNSCHEDULED
    assert covered >= set(bench.CONFIGS)


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
