"""Driver entry points must stay green: jit compile + multichip dryrun."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge  # noqa: E402

pytestmark = pytest.mark.slow  # >5s measured on the 1-core CI host


def test_entry_compiles():
    fn, args = ge.entry()
    fake, score = jax.jit(fn)(*args)
    assert fake.shape == (8, 5, 32, 32)
    assert score.shape == (8, 1, 32, 32)
    assert np.isfinite(np.asarray(score)).all()


@pytest.mark.exhaustive  # canonical: the driver executes dryrun_multichip(N)
# on a virtual mesh EVERY round and records MULTICHIP_r{N}.json (ok: true)
# — in-suite it costs ~124 s of shard_map compiles on the 1-core host, so
# the default tier keeps only the single-chip entry() compile
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


@pytest.mark.exhaustive  # canonical: test_dryrun_multichip_8 (the driver also dryruns every round)
def test_dryrun_multichip_4():
    ge.dryrun_multichip(4)


@pytest.mark.exhaustive  # canonical: test_dryrun_multichip_8
def test_dryrun_multichip_odd():
    ge.dryrun_multichip(3)  # falls back to pure-DP mesh
