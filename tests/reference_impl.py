"""Independent brute-force reimplementations used ONLY as test oracles.

These are deliberately naive, dictionary-based transcriptions of the
reference semantics (library.cpp / Pangenes.java), structured differently
from the production code so that agreement is meaningful.
"""

from collections import Counter

import numpy as np


def kmer_multisets(sequences, k):
    """Per-gene k-mer multisets (Counter of k-mer strings)."""
    out = []
    for s in sequences:
        if len(s) < k:
            out.append(Counter())
        else:
            out.append(Counter(s[i : i + k] for i in range(len(s) - k + 1)))
    return out


def shared_multisets(sequences, k):
    """Multisets restricted to k-mers occurring in >= 2 (gene, kmer) entries
    — mirrors the reference's singleton-rank pruning (library.cpp:308)."""
    multis = kmer_multisets(sequences, k)
    entry_count = Counter()
    for m in multis:
        for km in m:
            entry_count[km] += 1
    return [
        Counter({km: c for km, c in m.items() if entry_count[km] >= 2})
        for m in multis
    ]


def brute_force_cells(sequences, k):
    """All ordered-pair integer accumulators; dict (i, j) ->
    (intersection, perc_cnt, tr_perc_cnt)."""
    multis = shared_multisets(sequences, k)
    n = len(sequences)
    cells = {}
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            inter = perc = tr = 0
            for km, ci in multis[i].items():
                cj = multis[j].get(km, 0)
                if cj:
                    inter += min(ci, cj)
                    perc += ci
                    tr += cj
            if inter > 0:
                cells[(i, j)] = (inter, perc, tr)
    return cells


def brute_force_finalize(cells, kseq_lengths, k):
    """f32 score finalization per library.cpp:493-512; dict (i, j) ->
    (score, perc, tr_perc), only score > 0 cells."""
    out = {}
    thr = np.float32(1.0) / (np.float32(2.0) * np.float32(k))
    for (i, j), (inter, perc_cnt, tr_cnt) in cells.items():
        a = int(kseq_lengths[i])
        b = int(kseq_lengths[j])
        union = a + b - inter
        perc = np.float32(perc_cnt) / np.float32(a)
        tr_perc = np.float32(tr_cnt) / np.float32(b)
        valid = bool(perc >= thr or tr_perc >= thr)
        score = np.float32(inter) / np.float32(union) if valid else np.float32(0)
        if score > 0:
            out[(i, j)] = (score, perc, tr_perc)
    return out


def brute_force_network(fcells, seq_genome, n_genomes):
    """Per-genome BBH passes transcribed from Pangenes.java:60-183.

    ``fcells``: dict (i, j) -> (score, perc, tr_perc) with score > 0.
    Returns the canonical undirected edge dict {(min, max): score}.
    """
    n_seq = len(seq_genome)
    edges = {}

    def add_edge(a, b, s):
        if a > b:
            a, b = b, a
        edges.setdefault((a, b), s)

    for g in range(n_genomes):
        rows = [i for i in range(n_seq) if seq_genome[i] == g]
        part = [
            (i, j, v[0], v[1], v[2])
            for (i, j), v in sorted(fcells.items())
            if seq_genome[i] == g
        ]
        # native maxima (library.cpp:513-515)
        max_genome_score = {(i, tg): np.float32(0) for i in rows for tg in range(n_genomes)}
        col_max = [np.float32(0)] * n_seq
        for (i, j, s, _, _) in part:
            tg = seq_genome[j]
            if s > max_genome_score[(i, tg)]:
                max_genome_score[(i, tg)] = s
            if s > col_max[j]:
                col_max[j] = s

        # pass 1: inter-genome BBH (Pangenes.java:98-128)
        inter_max_score = [np.float32(0)] * n_genomes
        accepted = []
        for (i, j, s, perc, trp) in part:
            sg = seq_genome[j]
            if sg != g and s == max_genome_score[(i, sg)] and s == col_max[j]:
                add_edge(i, j, s)
                accepted.append((i, j, s, sg))
                if s < 1.0 and s > inter_max_score[sg]:
                    inter_max_score[sg] = s

        # row thresholds (Pangenes.java:146-155)
        row_threshold = [np.float32(np.inf)] * n_seq
        for (i, j, s, sg) in accepted:
            if inter_max_score[sg] < row_threshold[i]:
                row_threshold[i] = inter_max_score[sg]

        # pass 2: intra-genome paralogs (Pangenes.java:164-176)
        for (i, j, s, perc, trp) in part:
            if (
                i < j
                and seq_genome[j] == g
                and s == max_genome_score[(i, g)]
                and s == max_genome_score[(j, g)]
                and s >= row_threshold[i]
            ):
                add_edge(i, j, s)

    return edges
