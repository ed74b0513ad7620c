import numpy as np
import pytest

import jax

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.ops.candidate import compute_cells_candidate

from tests.test_cells_and_net import _random_ds
from tests.test_xla_score import _cells_dict

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_multidevice_cells_match_single(n_devices):
    rng = np.random.default_rng(31)
    ds = _random_ds(rng, n_genomes=4, n_fams=12)
    idx = build_index(ds, k=3)
    base = PipelineConfig(row_block=8, col_block=128, candidate_cap=32)
    single = _cells_dict(compute_cells_candidate(idx, base))
    multi_cfg = PipelineConfig(
        row_block=8, col_block=128, candidate_cap=32, n_devices=n_devices
    )
    multi = _cells_dict(compute_cells_candidate(idx, multi_cfg))
    assert multi == single


def test_multidevice_with_overflow_retry():
    rng = np.random.default_rng(33)
    ds = _random_ds(rng, n_genomes=4, n_fams=8)
    idx = build_index(ds, k=3)
    single = _cells_dict(
        compute_cells_candidate(
            idx, PipelineConfig(row_block=8, col_block=128, candidate_cap=2)
        )
    )
    multi = _cells_dict(
        compute_cells_candidate(
            idx,
            PipelineConfig(
                row_block=8, col_block=128, candidate_cap=2, n_devices=4
            ),
        )
    )
    assert multi == single


@pytest.mark.parametrize("n_devices", [2, 4])
def test_multidevice_pallas_join_matches_single(n_devices):
    """The sharded pair join (contiguous unique-pair shards per device)
    must produce the same cells as the single-device pallas path."""
    rng = np.random.default_rng(33)
    ds = _random_ds(rng, n_genomes=4, n_fams=10)
    idx = build_index(ds, k=3)
    single = _cells_dict(
        compute_cells_candidate(
            idx,
            PipelineConfig(
                backend="pallas", row_block=8, col_block=128,
                candidate_cap=32,
            ),
        )
    )
    multi = _cells_dict(
        compute_cells_candidate(
            idx,
            PipelineConfig(
                backend="pallas", row_block=8, col_block=128,
                candidate_cap=32, n_devices=n_devices,
            ),
        )
    )
    assert multi == single
