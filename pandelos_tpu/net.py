"""Score finalization + bidirectional-best-hit network construction.

Shared by every scoring backend (oracle / XLA / Pallas): backends produce
exact integer :class:`~pandelos_tpu.oracle.cells.ScoreCells`; this module
finalizes f32 scores and applies the BBH + paralog filters with the exact
semantics of ``Pangenes.java:98-176`` and ``library.cpp:493-517``.

Finalization per cell (library.cpp:493-517), all in IEEE f32 like the
reference's C floats:
- ``union = |A| + |B| - intersection``
- ``perc = perc_cnt / |A|``, ``tr_perc = tr_perc_cnt / |B|``
- validity: ``perc >= 1/(2k)`` OR ``tr_perc >= 1/(2k)``
- ``score = intersection / union``; only valid, score > 0 cells survive.

The score matrix is symmetric (intersection and union are), so the
reference's two max structures collapse to one:
``M[i, g] = max over j in genome g of score(i, j)``; the reference's
``max_genome_score[row][g]`` is ``M[row, g]`` and its per-source-genome
``max_genome_score_col[col]`` (library.cpp:515) is ``M[col, source_genome]``.

Filters (Pangenes.java):
- inter-genome BBH (:98-128): genome(i) != genome(j), score == M[i, gj]
  and score == M[j, gi] -> undirected edge.
- per-genome-pair ``inter_max_score[gi][gj]``: max accepted score < 1.0
  (:116-118), 0.0 when none.
- row threshold (:146-155): min over row i's accepted cells (i, j) of
  ``inter_max_score[gi][gj]``; +inf when row i has no accepted cells.
- intra-genome paralog edges (:164-176): i < j, same genome g,
  score == M[i, g] == M[j, g], and score >= row_threshold[i].
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from pandelos_tpu.oracle.cells import ScoreCells


@dataclasses.dataclass
class FinalizedCells:
    row: np.ndarray  # int32
    col: np.ndarray  # int32
    score: np.ndarray  # float32
    perc: np.ndarray  # float32
    tr_perc: np.ndarray  # float32


def finalize_scores(
    cells: ScoreCells, kseq_lengths: np.ndarray, k: int
) -> FinalizedCells:
    """Integer accumulators -> f32 scores; drops invalid / zero cells."""
    a = kseq_lengths[cells.row].astype(np.float32)
    b = kseq_lengths[cells.col].astype(np.float32)
    inter = cells.intersection.astype(np.float32)
    union = (
        kseq_lengths[cells.row].astype(np.int64)
        + kseq_lengths[cells.col].astype(np.int64)
        - cells.intersection
    ).astype(np.float32)
    perc = cells.perc_cnt.astype(np.float32) / a
    tr_perc = cells.tr_perc_cnt.astype(np.float32) / b
    threshold = np.float32(1.0) / (np.float32(2.0) * np.float32(k))
    valid = (perc >= threshold) | (tr_perc >= threshold)
    score = np.where(valid, inter / union, np.float32(0.0)).astype(np.float32)
    keep = score > 0.0
    return FinalizedCells(
        cells.row[keep],
        cells.col[keep],
        score[keep],
        perc[keep].astype(np.float32),
        tr_perc[keep].astype(np.float32),
    )


@dataclasses.dataclass
class NetworkResult:
    edges: List[Tuple[int, int, float]]  # undirected, canonical src <= dst
    n_inter_edges: int
    n_intra_edges: int
    genome_max: np.ndarray  # M[i, g] f32 [G, n_genomes]
    inter_max_score: np.ndarray  # f32 [n_genomes, n_genomes]
    stats: dict


def build_network(
    cells: FinalizedCells,
    seq_genome: np.ndarray,
    n_genomes: int,
    n_sequences: int,
) -> NetworkResult:
    G = n_sequences
    gi = seq_genome[cells.row].astype(np.int64)
    gj = seq_genome[cells.col].astype(np.int64)
    row64 = cells.row.astype(np.int64)
    col64 = cells.col.astype(np.int64)

    # M[i, g] = max score of gene i against genome g (score > 0 cells only,
    # as the reference only updates maxima for stored cells,
    # library.cpp:505-516).
    M = np.zeros((G, n_genomes), dtype=np.float32)
    np.maximum.at(M, (row64, gj), cells.score)

    # --- inter-genome BBH acceptance (Pangenes.java:98-104)
    inter_mask = gi != gj
    accepted = (
        inter_mask
        & (cells.score == M[row64, gj])
        & (cells.score == M[col64, gi])
    )

    # --- per-genome-pair max accepted score < 1.0 (Pangenes.java:116-118)
    inter_max_score = np.zeros((n_genomes, n_genomes), dtype=np.float32)
    lt1 = accepted & (cells.score < 1.0)
    np.maximum.at(inter_max_score, (gi[lt1], gj[lt1]), cells.score[lt1])

    # --- per-row threshold (Pangenes.java:146-155)
    row_threshold = np.full(G, np.inf, dtype=np.float32)
    np.minimum.at(
        row_threshold, row64[accepted], inter_max_score[gi[accepted], gj[accepted]]
    )

    # --- intra-genome paralog edges (Pangenes.java:164-176)
    intra = (
        (~inter_mask)
        & (row64 < col64)
        & (cells.score == M[row64, gi])
        & (cells.score == M[col64, gi])
        & (cells.score >= row_threshold[row64])
    )

    # Collect undirected canonical edges (vectorized).  Accepted inter
    # cells appear in both directions (symmetry, identical scores); the
    # reference adds both and dedups on write with key <= node
    # (PangeneNet.java:167-174).
    def _canon_keys(mask):
        a = np.minimum(row64[mask], col64[mask])
        b = np.maximum(row64[mask], col64[mask])
        return (a << np.int64(32)) | b

    inter_keys = np.unique(_canon_keys(accepted))
    n_inter = int(inter_keys.size)
    intra_keys = np.unique(_canon_keys(intra))
    # intra pairs are same-genome, inter pairs cross-genome: disjoint sets
    all_keys = np.concatenate([inter_keys, intra_keys])
    n_intra = int(intra_keys.size)

    order = np.argsort(all_keys, kind="stable")
    all_keys = all_keys[order]
    ea = (all_keys >> np.int64(32)).astype(np.int64)
    eb = (all_keys & np.int64(0xFFFFFFFF)).astype(np.int64)
    # look up each edge's score from M: score(a,b) == M[a, genome(b)] for
    # inter-BBH edges by construction; for intra edges score == M[a, g].
    escore = M[ea, seq_genome[eb].astype(np.int64)]
    from pandelos_tpu.io.net import EdgeList

    edges = EdgeList(ea, eb, escore.astype(np.float64))

    # Diagnostic stats in the spirit of Pangenes.java:130-143 (print-only in
    # the reference), structured here: per-genome-pair accepted-score
    # aggregates (inter_thr mean, min/max score, min/max perc).
    stats = {
        "n_cells": int(len(cells.row)),
        "n_accepted_inter_cells": int(accepted.sum()),
        "n_inter_edges": n_inter,
        "n_intra_edges": n_intra,
    }
    if n_genomes <= 128 and accepted.any():
        gp_sum = np.zeros((n_genomes, n_genomes), np.float64)
        gp_cnt = np.zeros((n_genomes, n_genomes), np.int64)
        gp_min = np.full((n_genomes, n_genomes), 1.0, np.float32)
        gp_minp = np.full((n_genomes, n_genomes), 1.0, np.float32)
        gp_maxp = np.full((n_genomes, n_genomes), 1.0, np.float32)
        ai, aj = gi[accepted], gj[accepted]
        asc = cells.score[accepted]
        ap = cells.perc[accepted]
        atp = cells.tr_perc[accepted]
        np.add.at(gp_sum, (ai, aj), asc.astype(np.float64))
        np.add.at(gp_cnt, (ai, aj), 1)
        pos = asc > 0.0
        np.minimum.at(gp_min, (ai[pos], aj[pos]), asc[pos])
        np.minimum.at(gp_minp, (ai, aj), np.minimum(ap, atp))
        np.maximum.at(gp_maxp, (ai, aj), np.maximum(ap, atp))
        with np.errstate(invalid="ignore"):
            gp_mean = np.where(gp_cnt > 0, gp_sum / np.maximum(gp_cnt, 1), 0.0)
        stats["genome_pairs"] = {
            "mean_score": gp_mean.round(6).tolist(),
            "min_score": gp_min.astype(float).tolist(),
            "max_score_lt1": inter_max_score.astype(float).tolist(),
            "min_perc": gp_minp.astype(float).tolist(),
            "max_perc": gp_maxp.astype(float).tolist(),
            "accepted_cells": gp_cnt.tolist(),
        }
    return NetworkResult(edges, n_inter, n_intra, M, inter_max_score, stats)
