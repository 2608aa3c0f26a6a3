"""Driver entry points (__graft_entry__.py).

The driver compile-checks `entry()` single-chip and executes
`dryrun_multichip(N)` on a virtual CPU mesh every round; a regression
here fails the round's MULTICHIP record, so the suite guards both.
"""

import sys
import pathlib

import jax
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_traces_to_image():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (36, 64, 3)
    assert out.dtype == jax.numpy.float32


def test_dryrun_rejects_too_few_devices():
    with pytest.raises(RuntimeError, match="need 99 devices"):
        graft.dryrun_multichip(99)


def test_dryrun_multichip_two_devices():
    # The full driver path at its smallest mesh: GSPMD + shard_map +
    # regen + primitive-sharded TP + sharded bounce-PRB, one step each
    # on tiny shapes (~40 s on CPU).
    graft.dryrun_multichip(2)
