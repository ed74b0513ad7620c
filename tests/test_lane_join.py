"""Interpret-mode correctness of the lane-bucketed Pallas join kernel
(ops/lane_join.py) vs a direct NumPy multiset-join oracle, plus the
host lane-packing layout invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from pandelos_tpu.ops.lane_join import (
    _LANE,
    _PAIR_BLOCK,
    join_pairs_lane_device,
    pack_lane_profiles,
)


class _FakeIndex:
    def __init__(self, profiles):
        """profiles: list of (sorted ids array, counts array)."""
        self.n_sequences = len(profiles)
        self.profile_ids = np.concatenate(
            [p[0] for p in profiles] or [np.zeros(0, np.int64)]
        ).astype(np.int64)
        self.profile_counts = np.concatenate(
            [p[1] for p in profiles] or [np.zeros(0, np.int64)]
        ).astype(np.int64)
        self.profile_ptr = np.concatenate(
            [[0], np.cumsum([len(p[0]) for p in profiles])]
        ).astype(np.int64)


def _numpy_counters(pa, pb):
    da = dict(zip(pa[0].tolist(), pa[1].tolist()))
    db = dict(zip(pb[0].tolist(), pb[1].tolist()))
    shared = set(da) & set(db)
    inter = sum(min(da[v], db[v]) for v in shared)
    perc = sum(da[v] for v in shared)
    tr = sum(db[v] for v in shared)
    return inter, perc, tr


def _random_profiles(rng, n_genes, vocab, max_w, max_cnt):
    profiles = []
    for _ in range(n_genes):
        w = int(rng.integers(0, max_w + 1))
        ids = np.sort(rng.choice(vocab, size=w, replace=False))
        cnts = rng.integers(1, max_cnt, size=w)
        profiles.append((ids.astype(np.int64), cnts.astype(np.int64)))
    return profiles


def test_pack_layout_invariants():
    rng = np.random.default_rng(3)
    profiles = _random_profiles(rng, 10, vocab=2000, max_w=300, max_cnt=4)
    idx = _FakeIndex(profiles)
    packed, D = pack_lane_profiles(idx, G_pad=12)
    assert packed.shape == (12, 2 * D * _LANE)
    ids_part = packed[:, : D * _LANE].reshape(12, D, _LANE)
    cnt_part = packed[:, D * _LANE :].reshape(12, D, _LANE)
    for g, (ids, cnts) in enumerate(profiles):
        # every entry present, in lane id & 127, depth ascending with id
        for v, c in zip(ids.tolist(), cnts.tolist()):
            lane = v & (_LANE - 1)
            hits = np.flatnonzero(ids_part[g, :, lane] == v)
            assert len(hits) == 1
            assert cnt_part[g, hits[0], lane] == c
        for lane in range(_LANE):
            col = ids_part[g, :, lane]
            valid = col[cnt_part[g, :, lane] > 0]
            assert np.all(np.diff(valid) > 0)  # ascending within lane
    # padding rows: id -1, count 0 everywhere
    assert np.all(ids_part[10:] == -1)
    assert np.all(cnt_part[10:] == 0)


@pytest.mark.parametrize("seed,n_genes,vocab,max_w", [
    (0, 8, 500, 140), (1, 12, 3000, 400), (2, 6, 64, 30),
])
def test_lane_join_matches_oracle(seed, n_genes, vocab, max_w):
    rng = np.random.default_rng(seed)
    profiles = _random_profiles(rng, n_genes, vocab, max_w, max_cnt=5)
    idx = _FakeIndex(profiles)
    G_pad = n_genes + 2
    packed, D = pack_lane_profiles(idx, G_pad=G_pad)

    n_pairs = 2 * _PAIR_BLOCK
    i = rng.integers(0, n_genes, size=n_pairs).astype(np.int32)
    j = rng.integers(0, n_genes, size=n_pairs).astype(np.int32)
    # include self pairs, pad-gene pairs, identical dup pairs
    i[:3] = [0, n_genes, 1]
    j[:3] = [0, n_genes + 1, 1]

    inter, perc, tr = join_pairs_lane_device(
        jnp.asarray(packed), jnp.asarray(i), jnp.asarray(j),
        D=D, chunk=_PAIR_BLOCK, interpret=True,
    )
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    for p in range(n_pairs):
        pa = profiles[i[p]] if i[p] < n_genes else empty
        pb = profiles[j[p]] if j[p] < n_genes else empty
        want = _numpy_counters(pa, pb)
        got = (int(inter[p]), int(perc[p]), int(tr[p]))
        assert got == want, (p, i[p], j[p], got, want)


def _padded_arrays(idx, G_pad, W, sentinel):
    """pad_profiles layout: id-sorted, left-packed, count 0 = padding."""
    ids = np.full((G_pad, W), sentinel, np.int32)
    cnts = np.zeros((G_pad, W), np.int32)
    ptr = idx.profile_ptr
    for g in range(idx.n_sequences):
        w = int(ptr[g + 1] - ptr[g])
        ids[g, :w] = idx.profile_ids[ptr[g]:ptr[g + 1]]
        cnts[g, :w] = idx.profile_counts[ptr[g]:ptr[g + 1]]
    return ids, cnts


@pytest.mark.parametrize("seed,n_genes,vocab,max_w", [
    (0, 10, 500, 140), (7, 13, 5000, 400), (9, 5, 64, 30),
])
def test_device_pack_matches_host_pack(seed, n_genes, vocab, max_w):
    from pandelos_tpu.ops.lane_join import lane_depth, pack_lane_device

    rng = np.random.default_rng(seed)
    profiles = _random_profiles(rng, n_genes, vocab, max_w, max_cnt=5)
    profiles[-1] = (np.zeros(0, np.int64), np.zeros(0, np.int64))  # empty
    idx = _FakeIndex(profiles)
    G_pad = n_genes + 3
    host, D_host = pack_lane_profiles(idx, G_pad=G_pad)
    D = lane_depth(idx)
    assert D == D_host
    W = ((max_w + 127) // 128) * 128
    ids, cnts = _padded_arrays(idx, G_pad, W, sentinel=vocab)
    dev = np.asarray(pack_lane_device(jnp.asarray(ids), jnp.asarray(cnts), D))
    np.testing.assert_array_equal(dev, host)


@pytest.mark.parametrize("seed,n_genes,vocab,max_w", [
    (0, 8, 500, 140), (1, 12, 3000, 400), (2, 6, 64, 30),
])
def test_lane2_join_matches_oracle(seed, n_genes, vocab, max_w):
    from pandelos_tpu.ops.lane_join import (
        join_pairs_lane2_device,
        lane_depth,
        lane_depths,
        pack_lane_device,
    )

    rng = np.random.default_rng(seed)
    profiles = _random_profiles(rng, n_genes, vocab, max_w, max_cnt=5)
    idx = _FakeIndex(profiles)
    G_pad = n_genes + 2
    D = lane_depth(idx)
    W = ((max_w + 127) // 128) * 128
    ids, cnts = _padded_arrays(idx, G_pad, W, sentinel=vocab)
    packed = pack_lane_device(jnp.asarray(ids), jnp.asarray(cnts), D,
                              packed=True)

    n_pairs = 2 * _PAIR_BLOCK
    i = rng.integers(0, n_genes, size=n_pairs).astype(np.int32)
    j = rng.integers(0, n_genes, size=n_pairs).astype(np.int32)
    i[:3] = [0, n_genes, 1]
    j[:3] = [0, n_genes + 1, 1]

    dg = np.zeros(G_pad, np.int32)
    dg[:n_genes] = lane_depths(idx)
    da_oct = dg[i].reshape(-1, 8).max(axis=1)
    db_oct = dg[j].reshape(-1, 8).max(axis=1)
    inter, perc, tr = join_pairs_lane2_device(
        packed, jnp.asarray(i), jnp.asarray(j),
        jnp.asarray(da_oct), jnp.asarray(db_oct),
        D=D, chunk=_PAIR_BLOCK, interpret=True,
    )
    empty = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    for p in range(n_pairs):
        pa = profiles[i[p]] if i[p] < n_genes else empty
        pb = profiles[j[p]] if j[p] < n_genes else empty
        want = _numpy_counters(pa, pb)
        got = (int(inter[p]), int(perc[p]), int(tr[p]))
        assert got == want, (p, i[p], j[p], got, want)


def test_lane_join_empty_index():
    idx = _FakeIndex([])
    packed, D = pack_lane_profiles(idx, G_pad=4)
    assert packed.shape == (4, 2 * D * _LANE)
    inter, perc, tr = join_pairs_lane_device(
        jnp.asarray(packed),
        jnp.zeros(_PAIR_BLOCK, jnp.int32),
        jnp.zeros(_PAIR_BLOCK, jnp.int32),
        D=D, chunk=_PAIR_BLOCK, interpret=True,
    )
    assert float(np.asarray(inter).sum()) == 0.0
