import numpy as np
import pytest

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.index import build_index
from pandelos_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native core unavailable (no g++?)"
)


def _assert_index_equal(a, b):
    assert a.k == b.k
    assert a.vocab_size == b.vocab_size
    assert a.total_vocab == b.total_vocab
    np.testing.assert_array_equal(a.profile_ptr, b.profile_ptr)
    np.testing.assert_array_equal(a.profile_ids, b.profile_ids)
    np.testing.assert_array_equal(a.profile_counts, b.profile_counts)
    np.testing.assert_array_equal(a.computation_costs, b.computation_costs)
    np.testing.assert_array_equal(a.kseq_lengths, b.kseq_lengths)


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 5)])
def test_native_matches_numpy(seed, k):
    ds = generate(
        SynthSpec(
            n_genomes=3,
            n_families=30,
            singleton_per_genome=5,
            min_len=20,
            max_len=120,
            seed=seed,
        )
    )
    nat = build_index(ds, k=k, use_native=True)
    ref = build_index(ds, k=k, use_native=False)
    _assert_index_equal(nat, ref)


def test_native_short_sequences_and_homopolymers():
    from pandelos_tpu.io.faa import FaaDataset

    ds = FaaDataset(
        sequences=["A" * 50, "A" * 40 + "C", "AC", "C", "ACACAC"],
        names=[f"s{i}" for i in range(5)],
        descriptions=["d"] * 5,
        seq_genome=[0, 0, 1, 1, 1],
        genome_names=["g0", "g1"],
    )
    nat = build_index(ds, k=3, use_native=True)
    ref = build_index(ds, k=3, use_native=False)
    _assert_index_equal(nat, ref)
