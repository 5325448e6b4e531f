"""Multi-chip dry-run as a test: full sharded train step on the 8-device
virtual mesh (mirrors the driver's dryrun_multichip contract)."""

import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    loss = float(out[0])
    assert np.isfinite(loss)
