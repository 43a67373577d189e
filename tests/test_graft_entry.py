"""Keep the driver entry points green: single-chip compile + 8-device dryrun."""

import os
import sys

import jax


def test_entry_compiles():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024,)


def test_dryrun_multichip_on_virtual_mesh():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g

    assert jax.device_count() >= 8  # conftest forces 8 CPU devices
    g.dryrun_multichip(8)
