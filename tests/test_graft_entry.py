"""Driver contract: entry() compiles single-device; dryrun_multichip runs a
real dp/tp/sp training step on the 8-device mesh."""

import sys
import os

import jax
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 256, 512)
    assert bool(jax.numpy.isfinite(out).all())


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
