import math
import os
from collections import Counter

import numpy as np

from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import FaaDataset, read_faa
from pandelos_tpu.ksel import k_report, select_k

from tests.reference_impl import kmer_multisets, shared_multisets

DATA = os.path.join(os.path.dirname(__file__), "data")


def _direct_k(sequences):
    # direct transcription of calculate_k.py:23-30
    total = sum(len(s) for s in sequences)
    alphabet = Counter()
    for s in sequences:
        alphabet.update(s)
    k = 0.0
    size = sum(alphabet.values())
    for count in alphabet.values():
        k += -math.log(count / size, len(alphabet)) * (count / size)
    return math.floor(math.log(total, len(alphabet)) / k)


def test_select_k_matches_formula():
    ds = read_faa(os.path.join(DATA, "toy.faa"))
    assert select_k(ds.sequences) == _direct_k(ds.sequences)
    rep = k_report(ds.sequences)
    assert rep["k"] == _direct_k(ds.sequences)
    assert rep["total_length"] == sum(len(s) for s in ds.sequences)


def _tiny_ds(seqs, genomes=None):
    n = len(seqs)
    genomes = genomes or [0] * n
    gn = sorted(set(genomes))
    return FaaDataset(
        sequences=list(seqs),
        names=[f"s{i}" for i in range(n)],
        descriptions=["d"] * n,
        seq_genome=list(genomes),
        genome_names=[f"g{g}" for g in gn],
    )


def test_index_profiles_match_bruteforce():
    rng = np.random.default_rng(0)
    letters = "ACDEFG"
    seqs = [
        "".join(rng.choice(list(letters), size=rng.integers(5, 40)))
        for _ in range(30)
    ]
    seqs.append("AC")  # shorter than k -> empty profile
    k = 3
    ds = _tiny_ds(seqs, genomes=[i % 3 for i in range(len(seqs))])
    idx = build_index(ds, k=k)

    shared = shared_multisets(seqs, k)
    full = kmer_multisets(seqs, k)

    # kseq_lengths = len - k + 1 clamped at 0 (library.cpp:250-262)
    for i, s in enumerate(seqs):
        assert idx.kseq_lengths[i] == max(len(s) - k + 1, 0)

    # per-gene profile contents (sorted by id, counts exact)
    # reconstruct id -> kmer string mapping via sorted order of shared vocab
    all_shared = sorted({km for m in shared for km in m})
    assert idx.vocab_size == len(all_shared)
    id_of = {km: i for i, km in enumerate(all_shared)}
    for i in range(len(seqs)):
        ids, counts = idx.profile(i)
        got = dict(zip(ids.tolist(), counts.tolist()))
        want = {id_of[km]: c for km, c in shared[i].items()}
        assert got == want

    # total vocab counts every distinct kmer incl. singletons
    assert idx.total_vocab == len({km for m in full for km in m})

    # computation costs: sum over shared entries of posting-group size
    entry_count = Counter()
    for m in full:
        for km in m:
            entry_count[km] += 1
    for i in range(len(seqs)):
        want_cost = sum(
            entry_count[km] for km in full[i] if entry_count[km] >= 2
        )
        assert idx.computation_costs[i] == want_cost


def test_index_complexity_report():
    ds = _tiny_ds(["AAAA", "AAAB", "BBBB"])
    idx = build_index(ds, k=2)
    rep = idx.complexity_report()
    assert rep["total_lookups"] == int(idx.computation_costs.sum())
    assert rep["reference_eta_ms"] > 0


def test_index_only_complexity_mode():
    ds = _tiny_ds(["AAAA", "AAAB", "BBBB"])
    idx = build_index(ds, k=2, only_complexity=True)
    assert idx.profile_ids.size == 0
    assert idx.computation_costs.sum() > 0


def test_index_save_load(tmp_path):
    ds = _tiny_ds(["ACDEFG", "ACDEFF", "GFEDCA"], genomes=[0, 1, 1])
    idx = build_index(ds, k=2)
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    from pandelos_tpu.index import KmerIndex

    idx2 = KmerIndex.load(p)
    assert idx2.k == idx.k
    np.testing.assert_array_equal(idx2.profile_ids, idx.profile_ids)
    np.testing.assert_array_equal(idx2.profile_counts, idx.profile_counts)
    np.testing.assert_array_equal(idx2.profile_ptr, idx.profile_ptr)


def test_index_wide_k_overflow_matches_bruteforce():
    """base^k > 2^64 forces the multi-limb exact path (the reference
    switches to Rabin-Karp hashing there, library.cpp:81-86); k=12 over a
    48-char alphabet exercises 2 limbs, k=20 over proteins 3 limbs.  The
    native core returns -2 on overflow and build_index must fall through
    to this path transparently."""
    import string

    rng = np.random.default_rng(11)
    for k, letters in (
        (12, string.ascii_letters[:48]),
        (20, "ACDEFGHIKLMNPQRSTVWY"),
    ):
        assert len(letters) ** k >= 2 ** 64  # really the overflow regime
        base = "".join(rng.choice(list(letters), size=k + 6))
        seqs = []
        for i in range(12):
            # shared windows across genes so postings have >= 2 entries
            s = base[i % 4 :] + "".join(
                rng.choice(list(letters), size=int(rng.integers(0, 10)))
            )
            seqs.append(s)
        seqs.append(letters[:5])  # shorter than k -> empty profile
        ds = _tiny_ds(seqs, genomes=[i % 3 for i in range(len(seqs))])
        idx = build_index(ds, k=k)

        shared = shared_multisets(seqs, k)
        all_shared = sorted({km for m in shared for km in m})
        assert idx.vocab_size == len(all_shared)
        assert idx.vocab_size > 0  # the planted overlap survived
        id_of = {km: i for i, km in enumerate(all_shared)}
        for i in range(len(seqs)):
            ids, counts = idx.profile(i)
            got = dict(zip(ids.tolist(), counts.tolist()))
            want = {id_of[km]: c for km, c in shared[i].items()}
            assert got == want
        full = kmer_multisets(seqs, k)
        assert idx.total_vocab == len({km for m in full for km in m})
