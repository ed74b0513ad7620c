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


def test_n_devices_beyond_available_raises():
    """Requesting more mesh devices than exist must fail with a clear
    error instead of silently truncating the mesh (the S/shard math
    would then crash deep inside the programs)."""
    import jax
    import numpy as np
    import pytest

    from pandelos_tpu.bench.synth import SynthSpec, generate
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.index import build_index
    from pandelos_tpu.ops.candidate import compute_cells_candidate

    ds = generate(SynthSpec(n_genomes=2, n_families=4,
                            singleton_per_genome=1, min_len=40,
                            max_len=80, seed=0))
    idx = build_index(ds, k=3)
    too_many = len(jax.devices()) + 1
    with pytest.raises(ValueError, match="n_devices"):
        compute_cells_candidate(
            idx, PipelineConfig(backend="pallas", row_block=8,
                                col_block=128, n_devices=too_many)
        )
