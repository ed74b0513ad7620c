import numpy as np
import pytest

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import FaaDataset
from pandelos_tpu.ops.score import compute_cells_xla
from pandelos_tpu.oracle.cells import apply_validity, compute_cells_oracle

from tests.test_cells_and_net import _random_ds


def _cells_dict(cells):
    return {
        (int(r), int(c)): (int(i), int(p), int(t))
        for r, c, i, p, t in zip(
            cells.row, cells.col, cells.intersection, cells.perc_cnt,
            cells.tr_perc_cnt,
        )
    }


def _oracle_valid(idx):
    """Oracle cells with the device-side validity filter applied (the XLA
    path drops invalid cells before extraction)."""
    return apply_validity(compute_cells_oracle(idx), idx.kseq_lengths, idx.k)


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_xla_cells_match_oracle(seed):
    rng = np.random.default_rng(seed)
    ds = _random_ds(rng, n_genomes=3, n_fams=7)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=16, col_block=128, level_cap=4)
    got = _cells_dict(compute_cells_xla(idx, cfg))
    want = _cells_dict(_oracle_valid(idx))
    assert got == want


def test_xla_cells_level_cap_correction():
    # Homopolymer runs force per-(gene,kmer) counts far above level_cap.
    ds = FaaDataset(
        sequences=["A" * 30 + "CDE", "A" * 25 + "CDE", "CDECDECDE"],
        names=["a", "b", "c"],
        descriptions=["d"] * 3,
        seq_genome=[0, 1, 1],
        genome_names=["g0", "g1"],
    )
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=8, col_block=128, level_cap=2)
    got = _cells_dict(compute_cells_xla(idx, cfg))
    want = _cells_dict(_oracle_valid(idx))
    assert got == want
    # sanity: AAA count is 28 in gene a, 23 in gene b -> min 23 > cap
    key = (0, 1)
    assert want[key][0] >= 23


def test_xla_cells_empty_and_tiny():
    ds = FaaDataset(
        sequences=["ACDEF", "GHIKL"],
        names=["a", "b"],
        descriptions=["d"] * 2,
        seq_genome=[0, 1],
        genome_names=["g0", "g1"],
    )
    idx = build_index(ds, k=3)
    cells = compute_cells_xla(idx, PipelineConfig())
    assert len(cells) == 0


@pytest.mark.parametrize("row_block,col_block", [(8, 128), (32, 256)])
def test_xla_blocking_invariance(row_block, col_block):
    rng = np.random.default_rng(9)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=row_block, col_block=col_block)
    got = _cells_dict(compute_cells_xla(idx, cfg))
    want = _cells_dict(_oracle_valid(idx))
    assert got == want


def test_xla_overflow_retry():
    # Force the per-block extraction capacity to overflow so truncated
    # blocks are recomputed with a larger cap.
    rng = np.random.default_rng(13)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=8, col_block=128, nnz_cap_per_row=1)
    got = _cells_dict(compute_cells_xla(idx, cfg))
    want = _cells_dict(_oracle_valid(idx))
    assert got == want


def test_xla_f32_matmul_dtype():
    rng = np.random.default_rng(11)
    ds = _random_ds(rng, n_genomes=2, n_fams=5)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(matmul_dtype="f32", row_block=8, col_block=128)
    got = _cells_dict(compute_cells_xla(idx, cfg))
    want = _cells_dict(_oracle_valid(idx))
    assert got == want
