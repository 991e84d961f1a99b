"""Driver-contract regression tests: __graft_entry__ must always compile/run.

The round driver compile-checks entry() single-chip and executes
dryrun_multichip(N) on a virtual CPU mesh; breaking either fails the round.
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == () and str(out.dtype) == "float32"


def test_dryrun_multichip_shapes():
    graft.dryrun_multichip(8)  # dp=4 tp=2
    graft.dryrun_multichip(1)  # degenerate single-device mesh
