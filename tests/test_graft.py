"""Driver entry-point contract (__graft_entry__.py): the single-chip forward
compiles and runs, and the multi-chip dp x sp training step executes on the
8-device simulation mesh."""

import pytest

# integration-scale module: excluded from the fast tier (-m 'not slow and not heavy')
pytestmark = pytest.mark.heavy

import numpy as np

import jax


def test_entry_contract():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    masked, gains = jax.tree.map(np.asarray, out)
    assert masked.shape == (4, 1025, 173)
    assert gains.shape == (4, 4)
    assert np.all(np.isfinite(gains))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    # non-power-of-4 counts fall back to a pure-dp mesh
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)
