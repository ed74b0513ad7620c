import numpy as np
import pytest

import jax

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.ops.score import _score_row_block, pad_profiles
from pandelos_tpu.parallel.mesh import (
    genome_pair_stats,
    make_mesh,
    replicate,
    shard_rows,
    sharded_score_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >= 4 virtual devices"
)


def _setup(n_devices, row_pad_to):
    ds = generate(
        SynthSpec(n_genomes=4, n_families=20, singleton_per_genome=2,
                  min_len=30, max_len=90, seed=17)
    )
    idx = build_index(ds, k=3)
    padded = pad_profiles(idx, 16, 128)
    G_pad = padded.ids.shape[0]
    rem = (-G_pad) % row_pad_to
    ids = np.concatenate(
        [padded.ids, np.full((rem, padded.width), idx.vocab_size, np.int32)]
    )
    counts = np.concatenate(
        [padded.counts, np.zeros((rem, padded.width), np.int32)]
    )
    return idx, padded, ids, counts, G_pad


def test_sharded_step_matches_single_device():
    n_dev = 4
    idx, padded, ids, counts, G_pad = _setup(n_dev, n_dev * 8)
    mesh = make_mesh(n_dev)

    seq_genome_pad = np.zeros(G_pad, np.int32)
    seq_genome_pad[: idx.n_sequences] = idx.seq_genome
    lens_pad = np.zeros(G_pad, np.float32)
    lens_pad[: idx.n_sequences] = idx.kseq_lengths
    row_lens = np.zeros(ids.shape[0], np.float32)
    row_lens[: idx.n_sequences] = idx.kseq_lengths

    step = sharded_score_step(
        mesh,
        vocab_size=idx.vocab_size,
        n_genomes=idx.n_genomes,
        k=idx.k,
        col_block=128,
        level_cap=4,
    )
    inter_sh, perc_sh, tr_sh, M_full = step(
        shard_rows(mesh, ids),
        shard_rows(mesh, counts),
        replicate(mesh, padded.ids),
        replicate(mesh, padded.counts),
        replicate(mesh, seq_genome_pad),
        replicate(mesh, lens_pad),
        shard_rows(mesh, row_lens),
        shard_rows(mesh, np.arange(ids.shape[0], dtype=np.int32)),
    )
    inter_sh = np.asarray(inter_sh)

    # single-device reference: whole row range in one block
    inter_1, perc_1, tr_1 = _score_row_block(
        ids,
        counts,
        padded.ids,
        padded.counts,
        vocab_size=idx.vocab_size,
        col_block=128,
        level_cap=4,
        matmul_dtype="bf16",
    )
    np.testing.assert_array_equal(inter_sh, np.asarray(inter_1))
    np.testing.assert_array_equal(np.asarray(perc_sh), np.asarray(perc_1))
    np.testing.assert_array_equal(np.asarray(tr_sh), np.asarray(tr_1))

    # all-gathered maxima must be replicated and consistent with the
    # host-side maxima from the oracle network builder
    assert M_full.shape == (ids.shape[0], idx.n_genomes)
    from pandelos_tpu.net import build_network, finalize_scores
    from pandelos_tpu.oracle.cells import compute_cells_oracle

    cells = compute_cells_oracle(idx)
    fin = finalize_scores(cells, idx.kseq_lengths, idx.k)
    net = build_network(
        fin, np.asarray(idx.seq_genome), idx.n_genomes, idx.n_sequences
    )
    got_M = np.asarray(M_full)[: idx.n_sequences]
    # device maxima come from device-side f32 division: compare loosely
    np.testing.assert_allclose(got_M, net.genome_max, atol=1e-5)

    stats = genome_pair_stats(
        M_full[: idx.n_sequences],
        np.asarray(idx.seq_genome, np.int32),
        n_genomes=idx.n_genomes,
    )
    assert stats.shape == (idx.n_genomes, idx.n_genomes)


def test_two_level_mesh_matches_single_device():
    """hosts x rows mesh (DCN x ICI layout): row axis sharded over both
    levels must give identical results."""
    from pandelos_tpu.parallel.mesh import make_mesh_2d

    n_hosts, n_per = 2, 4
    idx, padded, ids, counts, G_pad = _setup(8, 8 * 8)
    mesh = make_mesh_2d(n_hosts, n_per)
    axis = ("hosts", "rows")

    seq_genome_pad = np.zeros(G_pad, np.int32)
    seq_genome_pad[: idx.n_sequences] = idx.seq_genome
    lens_pad = np.zeros(G_pad, np.float32)
    lens_pad[: idx.n_sequences] = idx.kseq_lengths
    row_lens = np.zeros(ids.shape[0], np.float32)
    row_lens[: idx.n_sequences] = idx.kseq_lengths

    step = sharded_score_step(
        mesh,
        vocab_size=idx.vocab_size,
        n_genomes=idx.n_genomes,
        k=idx.k,
        col_block=128,
        level_cap=4,
        axis=axis,
    )
    inter_sh, _, _, M_full = step(
        shard_rows(mesh, ids, axis=axis),
        shard_rows(mesh, counts, axis=axis),
        replicate(mesh, padded.ids),
        replicate(mesh, padded.counts),
        replicate(mesh, seq_genome_pad),
        replicate(mesh, lens_pad),
        shard_rows(mesh, row_lens, axis=axis),
        shard_rows(mesh, np.arange(ids.shape[0], dtype=np.int32), axis=axis),
    )
    inter_1, _, _ = _score_row_block(
        ids,
        counts,
        padded.ids,
        padded.counts,
        vocab_size=idx.vocab_size,
        col_block=128,
        level_cap=4,
        matmul_dtype="bf16",
    )
    np.testing.assert_array_equal(np.asarray(inter_sh), np.asarray(inter_1))
    assert M_full.shape == (ids.shape[0], idx.n_genomes)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # candidate-engine scan: [n_blocks, row_block] grow + [.., K] cand
    assert out[0].shape == (4, 16)
    assert out[1].shape == (4, 16, 32)

    ge.dryrun_multichip(8)
