import numpy as np
import pytest

from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import FaaDataset
from pandelos_tpu.net import build_network, finalize_scores
from pandelos_tpu.oracle.cells import compute_cells_oracle

from tests.reference_impl import (
    brute_force_cells,
    brute_force_finalize,
    brute_force_network,
)


def _random_ds(rng, n_genomes=3, n_fams=6, sub=0.1, letters="ACDEFGHIKL"):
    """Small synthetic dataset with family structure so BBH paths fire."""
    seqs, genomes = [], []
    fams = [
        "".join(rng.choice(list(letters), size=rng.integers(12, 60)))
        for _ in range(n_fams)
    ]
    for g in range(n_genomes):
        for f, anc in enumerate(fams):
            if rng.random() < 0.85:
                s = list(anc)
                for i in range(len(s)):
                    if rng.random() < sub:
                        s[i] = rng.choice(list(letters))
                seqs.append("".join(s))
                genomes.append(g)
                # occasional exact paralog duplicate
                if rng.random() < 0.15:
                    seqs.append("".join(s))
                    genomes.append(g)
    return FaaDataset(
        sequences=seqs,
        names=[f"s{i}" for i in range(len(seqs))],
        descriptions=["d"] * len(seqs),
        seq_genome=genomes,
        genome_names=[f"g{g}" for g in range(n_genomes)],
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_cells_match_bruteforce(seed):
    rng = np.random.default_rng(seed)
    ds = _random_ds(rng)
    k = 3
    idx = build_index(ds, k=k)
    cells = compute_cells_oracle(idx)
    got = {
        (int(r), int(c)): (int(i), int(p), int(t))
        for r, c, i, p, t in zip(
            cells.row, cells.col, cells.intersection, cells.perc_cnt,
            cells.tr_perc_cnt,
        )
    }
    want = brute_force_cells(ds.sequences, k)
    assert got == want


@pytest.mark.parametrize("seed", [0, 3, 4])
def test_finalize_and_network_match_java_semantics(seed):
    rng = np.random.default_rng(seed)
    ds = _random_ds(rng, n_genomes=4, n_fams=8)
    k = 3
    idx = build_index(ds, k=k)
    cells = compute_cells_oracle(idx)

    fin = finalize_scores(cells, idx.kseq_lengths, k)
    bf_cells = brute_force_cells(ds.sequences, k)
    bf_fin = brute_force_finalize(bf_cells, idx.kseq_lengths, k)

    got_f = {
        (int(r), int(c)): (s, p, t)
        for r, c, s, p, t in zip(fin.row, fin.col, fin.score, fin.perc, fin.tr_perc)
    }
    assert set(got_f) == set(bf_fin)
    for key in bf_fin:
        assert got_f[key][0] == bf_fin[key][0], key  # exact f32 equality
        assert got_f[key][1] == bf_fin[key][1]
        assert got_f[key][2] == bf_fin[key][2]

    net = build_network(
        fin, np.asarray(ds.seq_genome), ds.n_genomes, ds.n_sequences
    )
    got_edges = {(a, b): np.float32(s) for a, b, s in net.edges}
    want_edges = brute_force_network(
        bf_fin, list(ds.seq_genome), ds.n_genomes
    )
    assert got_edges == want_edges


def test_validity_threshold_drops_weak_pairs():
    # Two genes sharing one kmer out of many -> perc below 1/(2k) both ways.
    base1 = "ACACACACACACACACAC"
    base2 = "MNMNMNMNMNMNMNMNMN"
    shared = "WWW"
    s1 = base1 + shared + base1
    s2 = base2 + shared + base2
    ds = FaaDataset(
        sequences=[s1, s2, s1],  # third copy so kmers aren't singletons
        names=["a", "b", "c"],
        descriptions=["d"] * 3,
        seq_genome=[0, 1, 1],
        genome_names=["g0", "g1"],
    )
    k = 3
    idx = build_index(ds, k=k)
    cells = compute_cells_oracle(idx)
    fin = finalize_scores(cells, idx.kseq_lengths, k)
    pairs = set(zip(fin.row.tolist(), fin.col.tolist()))
    assert (0, 2) in pairs  # identical genes survive
    assert (0, 1) not in pairs  # single shared kmer fails 1/(2k)


def test_row_threshold_blocks_intra_without_inter():
    """A genome with two mutually-best paralogs but no inter-genome BBH
    edge for the row gene gets no intra edge (threshold stays +inf,
    Pangenes.java:147)."""
    # genome 0 has two identical genes; genome 1 has one unrelated gene
    # (needs a second copy of the unrelated gene so its kmers survive
    # pruning but don't connect to genome 0)
    a = "ACDEFGHIKLMNPQRSTVWY"
    u = "YWVTSRQPNMLKIHGFEDCA"
    ds = FaaDataset(
        sequences=[a, a, u, u],
        names=["p1", "p2", "u1", "u2"],
        descriptions=["d"] * 4,
        seq_genome=[0, 0, 1, 1],
        genome_names=["g0", "g1"],
    )
    k = 3
    idx = build_index(ds, k=k)
    cells = compute_cells_oracle(idx)
    fin = finalize_scores(cells, idx.kseq_lengths, k)
    net = build_network(fin, np.asarray(ds.seq_genome), 2, 4)
    # genes 0,1 are identical paralogs but have no inter edges -> blocked
    assert (0, 1) not in {(a_, b_) for a_, b_, _ in net.edges}
