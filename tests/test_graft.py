"""Driver-contract guard: entry() compiles and runs; dryrun_multichip
executes with dp x tp shardings on the virtual 8-device CPU mesh."""
import sys
import os

import numpy as np
import pytest
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 128)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-3
        )

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)  # raises on failure

    def test_dryrun_multichip_4(self):
        import __graft_entry__ as g

        g.dryrun_multichip(4)
