import numpy as np
import pytest

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import FaaDataset
from pandelos_tpu.ops.candidate import (
    _bf16_round_up,
    build_signatures,
    compute_cells_candidate,
)
from pandelos_tpu.oracle.cells import apply_validity, compute_cells_oracle

from tests.test_cells_and_net import _random_ds


def _valid_dict(cells, idx):
    c = apply_validity(cells, idx.kseq_lengths, idx.k)
    return {
        (int(r), int(cc)): (int(i), int(p), int(t))
        for r, cc, i, p, t in zip(
            c.row, c.col, c.intersection, c.perc_cnt, c.tr_perc_cnt
        )
    }


def test_bf16_round_up_is_upper_bound():
    rng = np.random.default_rng(0)
    x = (rng.random(10000) * 2000).astype(np.float32)
    up = _bf16_round_up(x)
    assert (up >= x).all()
    # exact bf16 values unchanged
    exact = np.asarray([0.0, 1.0, 2.0, 256.0, 0.5], np.float32)
    np.testing.assert_array_equal(_bf16_round_up(exact), exact)


@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_candidate_matches_oracle(seed, backend):
    rng = np.random.default_rng(seed)
    ds = _random_ds(rng, n_genomes=4, n_fams=9)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(
        backend=backend,
        row_block=16, col_block=128, candidate_cap=64, signature_buckets=512
    )
    got = _valid_dict(compute_cells_candidate(idx, cfg), idx)
    want = _valid_dict(compute_cells_oracle(idx), idx)
    assert got == want


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_candidate_overflow_fallback(backend):
    # tiny candidate cap forces the host posting-walk fallback
    rng = np.random.default_rng(3)
    ds = _random_ds(rng, n_genomes=4, n_fams=6)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(
        backend=backend,
        row_block=8, col_block=128, candidate_cap=2, signature_buckets=256
    )
    got = _valid_dict(compute_cells_candidate(idx, cfg), idx)
    want = _valid_dict(compute_cells_oracle(idx), idx)
    assert got == want


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_candidate_device_retry(backend):
    # cap small enough to overflow but with a widened device retry
    # (K2 <= 4096), exercising the upper-only mirror path for pallas
    rng = np.random.default_rng(13)
    ds = _random_ds(rng, n_genomes=4, n_fams=6)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(
        backend=backend,
        row_block=8, col_block=128, candidate_cap=8, signature_buckets=256
    )
    got = _valid_dict(compute_cells_candidate(idx, cfg), idx)
    want = _valid_dict(compute_cells_oracle(idx), idx)
    assert got == want


def test_candidate_no_duplicate_cells():
    rng = np.random.default_rng(5)
    ds = _random_ds(rng, n_genomes=3, n_fams=6)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(
        row_block=8, col_block=128, candidate_cap=3, signature_buckets=256
    )
    cells = compute_cells_candidate(idx, cfg)
    keys = list(zip(cells.row.tolist(), cells.col.tolist()))
    assert len(keys) == len(set(keys))


def test_candidate_homopolymer_counts():
    ds = FaaDataset(
        sequences=["A" * 40 + "CDE", "A" * 33 + "CDE", "CDECDECDE"],
        names=["a", "b", "c"],
        descriptions=["d"] * 3,
        seq_genome=[0, 1, 1],
        genome_names=["g0", "g1"],
    )
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(row_block=8, col_block=128, candidate_cap=8,
                         signature_buckets=128)
    got = _valid_dict(compute_cells_candidate(idx, cfg), idx)
    want = _valid_dict(compute_cells_oracle(idx), idx)
    assert got == want
    assert got[(0, 1)][0] >= 31  # min(38, 31) on the AAA run


def test_signature_bound_holds():
    """The signature bound must dominate the true perc counters."""
    from pandelos_tpu.ops.score import pad_profiles

    rng = np.random.default_rng(11)
    ds = _random_ds(rng, n_genomes=3, n_fams=8)
    idx = build_index(ds, k=3)
    padded = pad_profiles(idx, 8, 128)
    sig, n_buckets, shift = build_signatures(idx, padded, force_host=True)
    sig = np.asarray(sig).astype(np.float32)
    pres = (sig > 0).astype(np.float32)
    bound = sig @ pres.T
    cells = compute_cells_oracle(idx)
    for r, c, p in zip(cells.row, cells.col, cells.perc_cnt):
        assert bound[r, c] >= p


def test_device_histogram_matches_host():
    from pandelos_tpu.ops.pallas_hist import (
        BUCKET_CHUNK,
        device_histogram,
        host_histogram,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    G_pad, W, n_buckets, shift = 16, 128, BUCKET_CHUNK, 2
    vocab = n_buckets << shift
    ids = np.sort(
        rng.integers(0, vocab, size=(G_pad, W)).astype(np.int32), axis=1
    )
    counts = rng.integers(1, 5, size=(G_pad, W)).astype(np.int32)
    # sentinel-pad some tails (must contribute nothing)
    for g in range(G_pad):
        n = rng.integers(0, W)
        ids[g, n:] = vocab + 7
        counts[g, n:] = 0

    out = device_histogram(
        jnp.asarray(ids), jnp.asarray(counts), n_buckets=n_buckets, shift=shift
    )
    want = host_histogram(ids, counts, n_buckets, shift)
    np.testing.assert_array_equal(np.asarray(out), want)

    # fused bf16 round-up path: an upper bound, exact where representable
    up = np.asarray(
        device_histogram(
            jnp.asarray(ids), jnp.asarray(counts),
            n_buckets=n_buckets, shift=shift, round_up_bf16=True,
        ).astype(jnp.float32)
    )
    assert (up >= want).all()
    np.testing.assert_array_equal(up, _bf16_round_up(want))


def test_device_histogram_large_counts_exact():
    """Integer exactness of the MXU contraction with counts > bf16 range."""
    from pandelos_tpu.ops.pallas_hist import device_histogram, host_histogram
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    G_pad, W, n_buckets, shift = 8, 256, 4096, 3
    vocab = n_buckets << shift
    ids = np.sort(
        rng.integers(0, vocab, size=(G_pad, W)).astype(np.int32), axis=1
    )
    counts = rng.integers(1, 60000, size=(G_pad, W)).astype(np.int32)
    out = device_histogram(
        jnp.asarray(ids), jnp.asarray(counts), n_buckets=n_buckets, shift=shift
    )
    want = host_histogram(ids, counts, n_buckets, shift)
    np.testing.assert_array_equal(np.asarray(out), want)


def test_candidate_full_pipeline_equivalence(tmp_path):
    from pandelos_tpu.bench.synth import SynthSpec, generate
    from pandelos_tpu.io.clus import read_clus
    from pandelos_tpu.io.net import diff_nets, read_net
    from pandelos_tpu.pipeline import run_pipeline

    ds = generate(
        SynthSpec(n_genomes=3, n_families=12, singleton_per_genome=3,
                  min_len=30, max_len=90, seed=5)
    )
    p1 = str(tmp_path / "oracle")
    p2 = str(tmp_path / "cand")
    run_pipeline("", p1, PipelineConfig(backend="oracle"), dataset=ds)
    run_pipeline(
        "",
        p2,
        PipelineConfig(backend="xla", row_block=16, col_block=128,
                       candidate_cap=32),
        dataset=ds,
    )
    rep = diff_nets(read_net(p1 + ".net"), read_net(p2 + ".net"), tolerance=0.0)
    assert rep["identical"], rep
    assert read_clus(p1 + ".clus") == read_clus(p2 + ".clus")


@pytest.mark.parametrize("seed", [0, 3])
def test_bound_bits_extraction_bit_identical(seed):
    """T-mode extraction (one matmul + T | T^T reads) must produce the
    same grow/counts and the same candidate SET per row as the legacy
    two-matmul pass (T-mode lists are perm-ordered, not gene-ordered) —
    the mask symmetry argument of _bound_bits_blocks, verified."""
    import jax

    from pandelos_tpu.ops.candidate import get_runner
    from pandelos_tpu.ops.score import pad_profiles

    rng = np.random.default_rng(seed)
    ds = _random_ds(rng, n_genomes=3, n_fams=10)
    idx = build_index(ds, k=3)
    cfg = PipelineConfig(backend="pallas", row_block=8, col_block=128)
    padded = pad_profiles(idx, 8, 128)
    runner = get_runner(idx, padded, None, cfg)
    sig, _, _ = build_signatures(idx, padded, cfg)
    runner.set_sig(sig)
    G = idx.n_sequences
    widths = np.diff(idx.profile_ptr)
    perm = np.argsort(widths, kind="stable").astype(np.int32)
    n_blocks = -(-G // 8)
    perm_pad = np.full(n_blocks * 8, G, dtype=np.int32)
    perm_pad[:G] = perm
    perm_ext = np.concatenate([perm_pad, np.full(8, G, np.int32)])
    starts = np.arange(0, n_blocks * 8, 8, np.int32)
    assert runner.use_bound_bits(len(starts), 8)
    for upper_only in (False, True):
        legacy = [np.asarray(x) for x in runner.extract(
            perm_ext, starts, 8, padded.width, 32,
            do_join=False, upper_only=upper_only, from_T=False)]
        tmode = [np.asarray(x) for x in runner.extract(
            perm_ext, starts, 8, padded.width, 32,
            do_join=False, upper_only=upper_only, from_T=True)]
        np.testing.assert_array_equal(legacy[0], tmode[0])  # grow
        np.testing.assert_array_equal(legacy[2], tmode[2])  # counts
        # candidate SETS per row (order differs by design)
        np.testing.assert_array_equal(
            np.sort(legacy[1], axis=-1), np.sort(tmode[1], axis=-1)
        )
