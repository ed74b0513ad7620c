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


def netclu_families(edges, seq_genome, n_sequences):
    """Faithful networkx transcription of netclu_ng.py's clustering
    (graph build :43-56, get_max_collision :79-96, split_until_max_k
    :98-115, main loop :142-175).  Edge order matters: the graph is
    built in the given order, exactly as netclu reads the .net file.
    Returns (families, singletons); families are sorted member lists,
    singletons are genes never placed in any family."""
    import networkx as nx

    pnet = nx.Graph()
    inodes = set()
    for a, b, w in edges:
        a, b = int(a), int(b)
        if a not in inodes:
            inodes.add(a)
            pnet.add_node(a)
        if (b not in inodes) and (a != b):
            inodes.add(b)
            pnet.add_node(b)
        if a != b:
            pnet.add_edge(a, b, weight=float(w))
            pnet.add_edge(b, a, weight=float(w))

    def get_max_collision(coco, g):
        collisions = {}
        for s in coco:
            collisions.setdefault(seq_genome[s], []).append(s)
        max_k = 0
        for v in collisions.values():
            for s1 in v:
                s_k = 0
                for s2 in v:
                    if s1 != s2 and not (
                        g.has_edge(s1, s2) or g.has_edge(s2, s1)
                    ):
                        s_k += 1
                if s_k > max_k:
                    max_k = s_k
        return max_k

    def split_until_max_k(coco, g):
        import networkx.algorithms.community.centrality as nxc

        snet = g.subgraph(coco)
        coms = tuple(sorted(c) for c in next(nxc.girvan_newman(snet)))
        rcoms = []
        for com in coms:
            if get_max_collision(com, snet) > 0:
                rcoms = rcoms + split_until_max_k(com, snet)
            else:
                rcoms.append(com)
        return rcoms

    remaining = set(range(n_sequences))
    families = []
    for coco in nx.algorithms.components.connected_components(pnet):
        if get_max_collision(coco, pnet) > 0:
            for com in split_until_max_k(coco, pnet):
                families.append(sorted(int(x) for x in com))
                remaining -= set(int(x) for x in com)
        else:
            families.append(sorted(int(x) for x in coco))
            remaining -= set(int(x) for x in coco)
    return families, sorted(remaining)
