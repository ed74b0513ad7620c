"""Interpret-mode correctness of the Pallas compare-and-rotate join
kernel vs a direct NumPy multiset-join oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from pandelos_tpu.ops.pallas_join import pair_join_counters, pack_profiles

_LANE = 128


def _numpy_counters(ids_a, cnt_a, ids_b, cnt_b):
    """Counters for one pair from (id, count) profiles (0-count = pad)."""
    da = {int(i): int(c) for i, c in zip(ids_a, cnt_a) if c > 0}
    db = {int(i): int(c) for i, c in zip(ids_b, cnt_b) if c > 0}
    shared = set(da) & set(db)
    inter = sum(min(da[v], db[v]) for v in shared)
    perc = sum(da[v] for v in shared)
    tr = sum(db[v] for v in shared)
    return inter, perc, tr


def _random_problem(rng, n_genes, W, K, vocab=500, max_cnt=5):
    G_pad = n_genes + 2  # one empty pad gene + round slack
    ids = np.full((G_pad, W), vocab, dtype=np.int32)
    counts = np.zeros((G_pad, W), dtype=np.int32)
    widths = np.zeros(G_pad, dtype=np.int32)
    for g in range(n_genes):
        w = int(rng.integers(0, W + 1))
        vs = np.sort(rng.choice(vocab, size=w, replace=False)).astype(np.int32)
        ids[g, :w] = vs
        counts[g, :w] = rng.integers(1, max_cnt, size=w)
        widths[g] = w

    R_tot = n_genes + 1  # one padding row
    perm = np.concatenate(
        [rng.permutation(n_genes), [n_genes]]
    ).astype(np.int32)
    cand = np.full((R_tot, K), n_genes, dtype=np.int32)  # pad gene
    cnt = np.zeros(R_tot, dtype=np.int32)
    for r in range(n_genes):
        n = int(rng.integers(0, K + 1))
        cand[r, :n] = rng.integers(0, n_genes, size=n)
        cnt[r] = n
    return ids, counts, widths, perm, cand, cnt


@pytest.mark.parametrize("seed,n_genes,W,K", [(0, 6, 128, 8), (1, 12, 256, 16), (2, 9, 384, 24)])
def test_pair_join_counters_interpret(seed, n_genes, W, K):
    rng = np.random.default_rng(seed)
    ids, counts, widths, perm, cand, cnt = _random_problem(
        rng, n_genes, W, K
    )
    all_pair = pack_profiles(ids, counts)
    inter, perc, tr = pair_join_counters(
        jnp.asarray(all_pair),
        jnp.asarray(perm),
        jnp.asarray(cand),
        jnp.asarray(cnt),
        jnp.asarray(widths),
        k_cap=K,
        w_pad=W,
        interpret=True,
    )
    inter = np.asarray(inter)
    perc = np.asarray(perc)
    tr = np.asarray(tr)
    for r in range(len(perm)):
        g = perm[r]
        for s in range(K):
            if s < cnt[r]:
                j = cand[r, s]
                want = _numpy_counters(
                    ids[g], counts[g], ids[j], counts[j]
                )
                got = (int(inter[r, s]), int(perc[r, s]), int(tr[r, s]))
                assert got == want, (r, s, g, j, got, want)
            else:
                assert inter[r, s] == 0
