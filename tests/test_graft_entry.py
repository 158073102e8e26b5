"""Driver entry points must compile and run on the virtual CPU mesh."""

import numpy as np
import jax

import __graft_entry__ as g


def test_entry_compiles_and_runs():
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    palette, valid, pmap = out
    assert palette.shape == (32, 3)
    assert pmap.shape == (64 * 64,)
    assert int(np.asarray(valid).sum()) >= 1
    labels = np.asarray(pmap)
    assert labels.min() >= 0 and labels.max() < 32


def test_dryrun_multichip_8():
    assert jax.device_count() >= 8
    g.dryrun_multichip(8)
