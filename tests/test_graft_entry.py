"""Driver-contract tests: entry() compile-check + multichip dryrun."""

import jax
import numpy as np
import pytest


def test_entry_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 128, 128, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)  # dp=2, tp=1 on the virtual CPU devices
