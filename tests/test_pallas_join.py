"""Interpret-mode correctness of the Pallas compare-and-rotate join
kernel vs a direct NumPy multiset-join oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pandelos_tpu.ops.pallas_join import join_pairs, pack_profiles


def _numpy_counters(ids_a, cnt_a, ids_b, cnt_b):
    """Counters for one pair from (id, count) profiles (0-count = pad)."""
    da = {int(i): int(c) for i, c in zip(ids_a, cnt_a) if c > 0}
    db = {int(i): int(c) for i, c in zip(ids_b, cnt_b) if c > 0}
    shared = set(da) & set(db)
    inter = sum(min(da[v], db[v]) for v in shared)
    perc = sum(da[v] for v in shared)
    tr = sum(db[v] for v in shared)
    return inter, perc, tr


@pytest.mark.parametrize("seed,n_genes,W,n_pairs", [(0, 8, 128, 40), (1, 12, 256, 90)])
def test_join_pairs_interpret(seed, n_genes, W, n_pairs):
    rng = np.random.default_rng(seed)
    vocab, max_cnt = 400, 5
    G_pad = n_genes + 2
    ids = np.full((G_pad, W), vocab, dtype=np.int32)
    counts = np.zeros((G_pad, W), dtype=np.int32)
    widths = np.zeros(G_pad, dtype=np.int64)
    for g in range(n_genes):
        w = int(rng.integers(0, W + 1))
        ids[g, :w] = np.sort(
            rng.choice(vocab, size=w, replace=False)
        ).astype(np.int32)
        counts[g, :w] = rng.integers(1, max_cnt, size=w)
        widths[g] = w

    # pair list with duplicates and mirrored pairs
    i = rng.integers(0, n_genes, size=n_pairs)
    j = rng.integers(0, n_genes, size=n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    i = np.concatenate([i, j[:5]])
    j = np.concatenate([j, i[:5]])

    all_pair = pack_profiles(ids, counts)
    inter, perc, tr = join_pairs(
        jnp.asarray(all_pair),
        i,
        j,
        widths,
        w_pad=W,
        pad_gene=n_genes,
        interpret=True,
    )
    for p in range(len(i)):
        want = _numpy_counters(
            ids[i[p]], counts[i[p]], ids[j[p]], counts[j[p]]
        )
        got = (int(inter[p]), int(perc[p]), int(tr[p]))
        assert got == want, (p, i[p], j[p], got, want)


def test_join_pairs_empty():
    all_pair = pack_profiles(
        np.full((2, 128), 9, np.int32), np.zeros((2, 128), np.int32)
    )
    inter, perc, tr = join_pairs(
        jnp.asarray(all_pair),
        np.zeros(0, np.int64),
        np.zeros(0, np.int64),
        np.zeros(2, np.int64),
        w_pad=128,
        pad_gene=1,
        interpret=True,
    )
    assert len(inter) == 0


@pytest.mark.parametrize("seed,W", [(3, 256), (4, 512)])
def test_banded_kernel_matches_plain(seed, W):
    """The sorted-band tile windowing (the TPU path's na x nb ->
    ~max(na, nb) optimization) must be output-identical to the
    all-tile-pairs path on ragged sorted profiles."""
    from pandelos_tpu.ops.pallas_join import join_pairs_core

    rng = np.random.default_rng(seed)
    vocab = 3000
    n_genes = 16
    G_pad = n_genes + 1
    ids = np.full((G_pad, W), vocab, dtype=np.int32)
    counts = np.zeros((G_pad, W), dtype=np.int32)
    for g in range(n_genes):
        w = int(rng.integers(0, W + 1))
        ids[g, :w] = np.sort(
            rng.choice(vocab, size=w, replace=False)
        ).astype(np.int32)
        counts[g, :w] = rng.integers(1, 6, size=w)
    all_pair = jnp.asarray(pack_profiles(ids, counts))

    P = 128
    a_idx = jnp.asarray(rng.integers(0, G_pad, size=P).astype(np.int32))
    b_idx = jnp.asarray(rng.integers(0, G_pad, size=P).astype(np.int32))

    plain = join_pairs_core(all_pair, a_idx, b_idx, w_pad=W, chunk=P,
                            interpret=True, banded=False)
    band = join_pairs_core(all_pair, a_idx, b_idx, w_pad=W, chunk=P,
                           interpret=True, banded=True)
    for p, b in zip(plain, band):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(b))
