"""Multi-chip sharding dry run on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    n = min(8, len(jax.devices()))
    if n < 2:
        pytest.skip("needs multiple devices")
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    x, y, k, status = out
    assert np.isfinite(float(y))
