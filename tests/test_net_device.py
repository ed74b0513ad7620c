import numpy as np
import pytest

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.net import build_network, finalize_scores
from pandelos_tpu.ops.net_device import compute_network_device
from pandelos_tpu.oracle.cells import compute_cells_oracle

from tests.test_cells_and_net import _random_ds


def _host_edges(idx):
    cells = compute_cells_oracle(idx)
    fin = finalize_scores(cells, idx.kseq_lengths, idx.k)
    net = build_network(
        fin, np.asarray(idx.seq_genome), idx.n_genomes, idx.n_sequences
    )
    return {(a, b): np.float32(s) for a, b, s in net.edges}


@pytest.mark.parametrize("seed", [0, 1, 4, 9])
def test_device_bbh_matches_host(seed):
    rng = np.random.default_rng(seed)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=16, col_block=128, candidate_cap=64)
    out = compute_network_device(idx, cfg)
    assert out is not None
    edges, stats = out
    got = {(a, b): np.float32(s) for a, b, s in edges}
    want = _host_edges(idx)
    assert got == want


def test_device_bbh_overflow_retry_matches_host():
    # a tiny candidate cap forces the on-device widened retry path
    rng = np.random.default_rng(2)
    ds = _random_ds(rng, n_genomes=4, n_fams=8)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=8, col_block=128, candidate_cap=2)
    out = compute_network_device(idx, cfg)
    assert out is not None
    edges, _ = out
    got = {(a, b): np.float32(s) for a, b, s in edges}
    assert got == _host_edges(idx)


def test_device_bbh_paralogs_and_identical_genes():
    from pandelos_tpu.io.faa import FaaDataset

    a = "ACDEFGHIKLMNPQRSTVWY" * 2
    b = a[:-3] + "WYW"
    ds = FaaDataset(
        sequences=[a, a, b, a, b],
        names=[f"s{i}" for i in range(5)],
        descriptions=["d"] * 5,
        seq_genome=[0, 0, 0, 1, 1],
        genome_names=["g0", "g1"],
    )
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=8, col_block=128, candidate_cap=8)
    out = compute_network_device(idx, cfg)
    assert out is not None
    edges, _ = out
    got = {(x, y): np.float32(s) for x, y, s in edges}
    want = _host_edges(idx)
    assert got == want
