"""Driver entry-point contracts: entry() is jit-compilable with matching
example args; dryrun_multichip runs a sharded step on the CPU mesh."""

import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_shapes_without_execution():
    """Validate fn/args via tracing only — the flagship model is too big
    to execute in unit tests on a 1-core CPU host."""
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    params, x, t, ctx = args
    assert out.shape == x.shape
    assert x.shape[1:] == (64, 64, 3)
    assert ctx.shape[1:] == (4, 512)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 3.0e8 < n_params < 6.0e8  # flagship scale


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)  # raises on any sharding/compile failure
