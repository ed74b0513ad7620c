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


@pytest.mark.parametrize("n_devices", [1, 2, 4])
def test_device_bbh_pallas_multidevice_matches_host(n_devices):
    """Pallas-join BBH through the mesh: the per-row maxima merge is an
    all_gather collective (library.cpp:515 reborn), so edge sets must be
    invariant in device count and equal to the host path."""
    rng = np.random.default_rng(7)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(
        backend="pallas", row_block=8, col_block=128, candidate_cap=32,
        n_devices=n_devices,
    )
    out = compute_network_device(idx, cfg)
    assert out is not None
    edges, stats = out
    got = {(a, b): np.float32(s) for a, b, s in edges}
    assert got == _host_edges(idx)
    assert stats["n_devices"] == n_devices


def test_device_bbh_stats_match_host_path():
    """The shipped accepted cells reproduce build_network's genome-pair
    aggregates (the structured analogue of Pangenes.java:130-143)."""
    rng = np.random.default_rng(5)
    ds = _random_ds(rng, n_genomes=3, n_fams=12)
    idx = build_index(ds, k=3)
    cells = compute_cells_oracle(idx)
    fin = finalize_scores(cells, idx.kseq_lengths, idx.k)
    want = build_network(
        fin, np.asarray(idx.seq_genome), idx.n_genomes, idx.n_sequences
    )
    out = compute_network_device(
        idx, PipelineConfig(
            backend="pallas", row_block=8, col_block=128, candidate_cap=64
        ),
    )
    assert out is not None
    _, stats = out
    assert stats["n_inter_edges"] == want.n_inter_edges
    assert stats["n_intra_edges"] == want.n_intra_edges
    assert stats["n_accepted_inter_cells"] == want.stats[
        "n_accepted_inter_cells"
    ]
    assert stats["n_cells"] == want.stats["n_cells"]
    assert stats["genome_pairs"] == want.stats["genome_pairs"]


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


def test_many_genomes_no_pair_stats():
    """Past 128 genomes the O(n_gen^2) genome-pair stats matrices are
    omitted (documented degradation, matching the host path's
    ``n_genomes <= 128`` gate in net.py) — edges must still byte-match
    the host BBH."""
    rng = np.random.default_rng(11)
    ds = _random_ds(rng, n_genomes=130, n_fams=2)
    idx = build_index(ds, k=3)
    assert idx.n_genomes > 128
    out = compute_network_device(
        idx, PipelineConfig(row_block=16, col_block=128, candidate_cap=64)
    )
    assert out is not None
    edges, stats = out
    assert "genome_pairs" not in stats
    got = {(a, b): np.float32(s) for a, b, s in edges}
    assert got == _host_edges(idx)


def test_unpacked_edge_fetch_branch(monkeypatch):
    """The G >= 65535 / long-sequence fetch path ships unpacked edge
    arrays (net_device.py pack_ok gate); forced via PANDELOS_NO_EDGE_PACK
    it must produce identical edges and stats to the packed default."""
    rng = np.random.default_rng(3)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=16, col_block=128, candidate_cap=64)
    out_packed = compute_network_device(idx, cfg)
    monkeypatch.setenv("PANDELOS_NO_EDGE_PACK", "1")
    out_unpacked = compute_network_device(idx, cfg)
    assert out_packed is not None and out_unpacked is not None
    assert out_packed[0] == out_unpacked[0]

    def _no_times(stats):
        return {k: v for k, v in stats.items() if k != "phase_s"}

    assert _no_times(out_packed[1]) == _no_times(out_unpacked[1])
