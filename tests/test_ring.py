"""Ring-sharded extraction (ops/ring.py) produces cells identical to
the replicated candidate engine / oracle, on a virtual multi-device
mesh — the memory-scaling mode where signatures are column-sharded and
rotated with ppermute instead of replicated."""

import numpy as np
import pytest

import jax

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.ksel import select_k

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs >= 8 virtual devices"
)


def _cells_as_set(cells):
    return {
        (int(r), int(c)): (int(i), int(p), int(t))
        for r, c, i, p, t in zip(
            cells.row, cells.col, cells.intersection,
            cells.perc_cnt, cells.tr_perc_cnt,
        )
    }


def _valid_oracle_cells(index):
    from pandelos_tpu.net import finalize_scores
    from pandelos_tpu.oracle.cells import compute_cells_oracle

    cells = compute_cells_oracle(index)
    # ring/candidate return only validity-passing cells; restrict the
    # oracle the same way for comparison
    lens = index.kseq_lengths
    k2 = 2 * index.k
    valid = (k2 * cells.perc_cnt >= lens[cells.row]) | (
        k2 * cells.tr_perc_cnt >= lens[cells.col]
    )
    from pandelos_tpu.oracle.cells import ScoreCells

    return ScoreCells(
        cells.row[valid], cells.col[valid], cells.intersection[valid],
        cells.perc_cnt[valid], cells.tr_perc_cnt[valid],
    )


@pytest.mark.parametrize("n_dev,seed", [(2, 3), (8, 4)])
def test_ring_cells_match_oracle(n_dev, seed):
    from pandelos_tpu.ops.ring import compute_cells_ring

    ds = generate(SynthSpec(
        n_genomes=5, n_families=40, singleton_per_genome=4,
        min_len=50, max_len=220, seed=seed,
    ))
    index = build_index(ds, k=select_k(ds.sequences))
    cfg = PipelineConfig(
        backend="pallas", row_block=16, col_block=128, n_devices=n_dev,
        candidate_cap=32, ring_extract=True,
    )
    got = _cells_as_set(compute_cells_ring(index, cfg))
    want = _cells_as_set(_valid_oracle_cells(index))
    assert got == want


def test_ring_matches_replicated_engine():
    from pandelos_tpu.ops.candidate import compute_cells_candidate
    from pandelos_tpu.ops.ring import compute_cells_ring

    ds = generate(SynthSpec(
        n_genomes=4, n_families=60, singleton_per_genome=2,
        min_len=60, max_len=300, seed=9,
    ))
    index = build_index(ds, k=select_k(ds.sequences))
    ring_cfg = PipelineConfig(
        backend="pallas", row_block=16, col_block=128, n_devices=4,
        candidate_cap=64, ring_extract=True,
    )
    got = _cells_as_set(compute_cells_ring(index, ring_cfg))
    rep_cfg = PipelineConfig(
        backend="pallas", row_block=16, col_block=128, n_devices=1,
        candidate_cap=64,
    )
    want = _cells_as_set(compute_cells_candidate(index, rep_cfg))
    assert got == want


def test_ring_requires_multi_device():
    from pandelos_tpu.ops.ring import compute_cells_ring

    ds = generate(SynthSpec(
        n_genomes=2, n_families=5, singleton_per_genome=1,
        min_len=40, max_len=80, seed=1,
    ))
    index = build_index(ds, k=3)
    with pytest.raises(ValueError, match="multi-device"):
        compute_cells_ring(
            index, PipelineConfig(backend="pallas", n_devices=1,
                                  ring_extract=True)
        )


@pytest.mark.parametrize("n_dev", [2, 4])
def test_ring_device_bbh_matches_host(n_dev):
    """Ring extraction composed with the device BBH (VERDICT r4 next
    #4): config.ring_extract + device_bbh must produce edges byte-equal
    to the host BBH path, with the signatures column-sharded + rotated
    instead of replicated."""
    from pandelos_tpu.net import build_network, finalize_scores
    from pandelos_tpu.ops.net_device import compute_network_device
    from pandelos_tpu.oracle.cells import compute_cells_oracle

    ds = generate(SynthSpec(
        n_genomes=5, n_families=40, singleton_per_genome=4,
        min_len=50, max_len=220, seed=6,
    ))
    index = build_index(ds, k=select_k(ds.sequences))
    cfg = PipelineConfig(
        backend="pallas", row_block=16, col_block=128, n_devices=n_dev,
        candidate_cap=64, ring_extract=True,
    )
    out = compute_network_device(index, cfg)
    assert out is not None
    edges, stats = out
    assert stats["ring_extract"] is True
    assert stats["n_devices"] == n_dev
    got = {(a, b): np.float32(s) for a, b, s in edges}

    cells = compute_cells_oracle(index)
    fin = finalize_scores(cells, index.kseq_lengths, index.k)
    want = build_network(
        fin, np.asarray(index.seq_genome), index.n_genomes,
        index.n_sequences,
    )
    ref = {(a, b): np.float32(s) for a, b, s in want.edges}
    assert got == ref


def test_ring_device_bbh_overflow_retry():
    """Candidate-cap overflow inside the ring + device-BBH composition
    reruns the ring extraction at a widened cap and still matches."""
    from pandelos_tpu.net import build_network, finalize_scores
    from pandelos_tpu.ops.net_device import compute_network_device
    from pandelos_tpu.oracle.cells import compute_cells_oracle

    ds = generate(SynthSpec(
        n_genomes=4, n_families=12, singleton_per_genome=2,
        min_len=40, max_len=120, seed=2,
    ))
    index = build_index(ds, k=3)
    cfg = PipelineConfig(
        backend="pallas", row_block=8, col_block=128, n_devices=2,
        candidate_cap=2, ring_extract=True,
    )
    out = compute_network_device(index, cfg)
    assert out is not None
    got = {(a, b): np.float32(s) for a, b, s in out[0]}
    cells = compute_cells_oracle(index)
    fin = finalize_scores(cells, index.kseq_lengths, index.k)
    want = build_network(
        fin, np.asarray(index.seq_genome), index.n_genomes,
        index.n_sequences,
    )
    assert got == {(a, b): np.float32(s) for a, b, s in want.edges}
