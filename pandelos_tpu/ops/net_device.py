"""Full-device BBH network construction.

Phase 2 of the candidate engine: instead of shipping every valid cell to
the host (~60MB over a ~33MB/s remote-TPU tunnel), run the reference's
BBH + paralog filters (Pangenes.java:98-176) on device and ship only the
edge list (~1MB).

Float semantics: scores are computed with
:func:`pandelos_tpu.ops.exact_div.exact_div_f32` — bit-identical to the
host's IEEE f32 quotients — so the reference's float-equality comparisons
(score == per-(row, genome) maxima) behave exactly as on host.  The final
``.net`` scores are still recomputed on host from the shipped integer
(intersection, union) pairs.

Layout: rows live in width-sorted PERM order (as produced by the
candidate engine); ``inv_perm`` maps gene id -> perm position for the
counterpart-maxima lookups.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import KmerIndex
from pandelos_tpu.ops.exact_div import exact_div_f32

_ROW_CHUNK = 1024


def _chunked_genome_max(score, gsel, n_gen: int):
    """[P, K] scores + [P, K] genome ids -> [P, n_gen] per-row maxima."""
    P, K = score.shape

    def body(ci, M):
        s = jax.lax.dynamic_slice(score, (ci * _ROW_CHUNK, 0), (_ROW_CHUNK, K))
        g = jax.lax.dynamic_slice(gsel, (ci * _ROW_CHUNK, 0), (_ROW_CHUNK, K))
        onehot = (
            g[:, :, None] == jnp.arange(n_gen, dtype=jnp.int32)[None, None, :]
        )
        part = jnp.max(jnp.where(onehot, s[:, :, None], 0.0), axis=1)
        return jax.lax.dynamic_update_slice(M, part, (ci * _ROW_CHUNK, 0))

    M0 = jnp.zeros((P, n_gen), dtype=score.dtype)
    return jax.lax.fori_loop(0, P // _ROW_CHUNK, body, M0)


def _genome_segment_max(M_rows, g_rows, n_gen: int):
    """[P, n_gen] per-row maxima + [P] row genomes -> [n_gen, n_gen]."""
    P = M_rows.shape[0]

    def body(ci, acc):
        m = jax.lax.dynamic_slice(
            M_rows, (ci * _ROW_CHUNK, 0), (_ROW_CHUNK, M_rows.shape[1])
        )
        g = jax.lax.dynamic_slice(g_rows, (ci * _ROW_CHUNK,), (_ROW_CHUNK,))
        onehot = (
            g[:, None] == jnp.arange(n_gen, dtype=jnp.int32)[None, :]
        )  # [C, n_gen]
        part = jnp.max(
            jnp.where(onehot[:, :, None], m[:, None, :], 0.0), axis=0
        )  # [n_gen(src), n_gen(dst)]
        return jnp.maximum(acc, part)

    acc0 = jnp.zeros((n_gen, n_gen), dtype=M_rows.dtype)
    return jax.lax.fori_loop(0, P // _ROW_CHUNK, body, acc0)


@functools.partial(
    jax.jit, static_argnames=("n_gen", "n_true", "edge_cap")
)
def _device_bbh(
    grow,  # int32 [P] gene id per perm row (>= n_true for padding)
    cand,  # int32 [P, K] candidate gene ids
    inter,  # f32 [P, K] exact integer intersections
    valid,  # bool [P, K]
    inv_perm,  # int32 [G_pad] gene id -> perm position
    lens,  # f32 [G_pad] kseq lengths
    genome_of,  # int32 [G_pad]
    n_gen: int,
    n_true: int,
    edge_cap: int,
):
    P, K = cand.shape
    lenA = lens[jnp.minimum(grow, lens.shape[0] - 1)]  # [P]
    lenB = lens[cand]  # [P, K]
    union = lenA[:, None] + lenB - inter
    score = exact_div_f32(
        jnp.maximum(inter, 1.0).astype(jnp.int32),
        jnp.maximum(union, 1.0).astype(jnp.int32),
    )
    score = jnp.where(valid & (inter > 0), score, 0.0)

    g_i = genome_of[jnp.minimum(grow, genome_of.shape[0] - 1)]  # [P]
    g_j = genome_of[cand]  # [P, K]

    M = _chunked_genome_max(score, g_j, n_gen)  # [P, n_gen]

    jpos = inv_perm[cand]  # [P, K] perm position of each candidate
    M_at_gj = jnp.take_along_axis(M, g_j, axis=1)  # M[row, genome(j)]
    M_j_gi = M[jpos, g_i[:, None]]  # M[j, genome(i)]

    inter_genome = g_j != g_i[:, None]
    accept = (
        valid
        & (score > 0)
        & inter_genome
        & (score == M_at_gj)
        & (score == M_j_gi)
    )

    # per-genome-pair max accepted score < 1.0 (Pangenes.java:116-118)
    lt1 = accept & (score < 1.0)
    M2 = _chunked_genome_max(jnp.where(lt1, score, 0.0), g_j, n_gen)
    ims = _genome_segment_max(M2, g_i, n_gen)  # [n_gen, n_gen]

    # row threshold (Pangenes.java:146-155)
    thr_cell = ims[g_i[:, None], g_j]  # [P, K]
    row_thr = jnp.min(
        jnp.where(accept, thr_cell, jnp.inf), axis=1
    )  # [P]

    # intra: g_j == g_i, so M_at_gj is the row's intra-genome max and
    # M_j_gi the counterpart's (Pangenes.java:164-176)
    intra = (
        valid
        & (score > 0)
        & (~inter_genome)
        & (grow[:, None] < cand)
        & (score == M_at_gj)
        & (score == M_j_gi)
        & (score >= row_thr[:, None])
    )

    emask = accept | intra
    flat = emask.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=edge_cap, fill_value=-1)
    safe = jnp.maximum(idx, 0)
    e_row = grow[safe // K]
    e_col = cand.reshape(-1)[safe]
    e_inter = inter.reshape(-1)[safe]
    e_union = union.reshape(-1)[safe]
    found = idx >= 0
    n_edges = jnp.sum(emask, dtype=jnp.int32)
    return (
        jnp.where(found, e_row, -1),
        jnp.where(found, e_col, -1),
        e_inter,
        e_union,
        n_edges,
        M,
        ims,
    )


def compute_network_device(
    index: KmerIndex, config: Optional[PipelineConfig] = None
):
    """Candidate engine + on-device BBH.  Returns (edges, stats) with
    edges as canonical (a, b, f32 score host-finalized) tuples, or None
    when a candidate-cap overflow requires the host cells path."""
    from pandelos_tpu.ops.score import _round_up, _width_buckets, pad_profiles
    from pandelos_tpu.ops.candidate import _candidate_blocks, build_signatures

    config = config or PipelineConfig()
    G = index.n_sequences
    if G == 0 or index.profile_ids.size == 0:
        return [], {"n_cells": 0}

    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    padded = pad_profiles(index, row_block, col_block)
    G_pad = padded.ids.shape[0]
    K = config.candidate_cap

    sig_mass, _, _ = build_signatures(index, padded, config)
    all_ids = jnp.asarray(padded.ids)
    all_counts = jnp.asarray(padded.counts)

    lens_pad = np.zeros(G_pad, dtype=np.float32)
    lens_pad[:G] = index.kseq_lengths
    col_lens = jnp.asarray(lens_pad)
    genome_pad = np.zeros(G_pad, dtype=np.int32)
    genome_pad[:G] = index.seq_genome

    widths = np.diff(index.profile_ptr)
    width_pad = np.zeros(G_pad, dtype=np.int32)
    width_pad[:G] = widths
    prof_width = jnp.asarray(width_pad)

    grow_parts, cand_parts, inter_parts, valid_parts = [], [], [], []
    counts_parts = []
    grow_host_parts = []

    for w_row, perm_pad, starts in _width_buckets(
        widths, row_block, padded.width
    ):
        perm_ext = np.concatenate(
            [perm_pad, np.full(row_block, G, dtype=np.int32)]
        )
        n_starts = len(starts)
        n2 = 1
        while n2 < n_starts:
            n2 *= 2
        starts_ext = np.concatenate(
            [starts, np.full(n2 - n_starts, len(perm_pad), dtype=np.int32)]
        )
        grow, cand, inter, perc, tr, valid, counts = _candidate_blocks(
            all_ids,
            all_counts,
            sig_mass,
            col_lens,
            prof_width,
            jnp.asarray(perm_ext),
            jnp.asarray(starts_ext),
            row_block=row_block,
            w_row=w_row,
            cand_cap=K,
            n_true=G,
            k2=2 * index.k,
        )
        R = row_block
        grow_parts.append(grow.reshape(-1))
        cand_parts.append(cand.reshape(-1, K))
        inter_parts.append(inter.reshape(-1, K))
        valid_parts.append(valid.reshape(-1, K))
        counts_parts.append(counts.reshape(-1))
        # host mirror of the permuted row order
        host_rows = perm_ext[
            np.concatenate([np.arange(s, s + R) for s in starts_ext])
        ]
        grow_host_parts.append(host_rows)

    counts_all = np.concatenate([np.asarray(c) for c in counts_parts])
    grow_host = np.concatenate(grow_host_parts)

    grow_d = jnp.concatenate(grow_parts)
    cand_d = jnp.concatenate(cand_parts)
    inter_d = jnp.concatenate(inter_parts)
    valid_d = jnp.concatenate(valid_parts)

    over_mask = (counts_all > K) & (grow_host < G)
    if np.any(over_mask):
        # rerun the overflowing rows on device with a larger uniform cap,
        # append them, and invalidate the truncated originals
        rows = np.unique(grow_host[over_mask])
        K2 = _round_up(int(counts_all[over_mask].max()), 128)
        if K2 > 1024:
            return None  # pathological: use the host cells path
        perm2 = np.concatenate(
            [
                rows.astype(np.int32),
                np.full(
                    ((-len(rows)) % row_block) + row_block, G, dtype=np.int32
                ),
            ]
        )
        starts2 = np.arange(
            0, len(perm2) - row_block, row_block, dtype=np.int32
        )
        g2, c2, i2, _, _, v2, cnt2 = _candidate_blocks(
            all_ids,
            all_counts,
            sig_mass,
            col_lens,
            prof_width,
            jnp.asarray(perm2),
            jnp.asarray(starts2),
            row_block=row_block,
            w_row=padded.width,
            cand_cap=K2,
            n_true=G,
            k2=2 * index.k,
        )
        # widen main arrays K -> K2 with inert slots
        padk = K2 - K
        if padk:
            cand_d = jnp.pad(cand_d, ((0, 0), (0, padk)), constant_values=G)
            inter_d = jnp.pad(inter_d, ((0, 0), (0, padk)))
            valid_d = jnp.pad(valid_d, ((0, 0), (0, padk)))
        valid_d = valid_d & ~jnp.asarray(over_mask)[:, None]
        grow_d = jnp.concatenate([grow_d, g2.reshape(-1)])
        cand_d = jnp.concatenate([cand_d, c2.reshape(-1, K2)])
        inter_d = jnp.concatenate([inter_d, i2.reshape(-1, K2)])
        valid_d = jnp.concatenate([valid_d, v2.reshape(-1, K2)])
        host_rows2 = perm2[
            np.concatenate([np.arange(s, s + row_block) for s in starts2])
        ]
        grow_host = np.concatenate([grow_host, host_rows2])
        K = K2

    # pad P to a row-chunk multiple with inert rows
    P = grow_d.shape[0]
    P_pad = _round_up(max(P, _ROW_CHUNK), _ROW_CHUNK)
    if P_pad != P:
        padn = P_pad - P
        grow_d = jnp.concatenate(
            [grow_d, jnp.full((padn,), G, dtype=jnp.int32)]
        )
        cand_d = jnp.concatenate(
            [cand_d, jnp.full((padn, K), G, dtype=jnp.int32)]
        )
        inter_d = jnp.concatenate(
            [inter_d, jnp.zeros((padn, K), dtype=jnp.float32)]
        )
        valid_d = jnp.concatenate(
            [valid_d, jnp.zeros((padn, K), dtype=jnp.bool_)]
        )
        grow_host = np.concatenate([grow_host, np.full(padn, G, np.int32)])

    inv_perm = np.zeros(G_pad, dtype=np.int32)
    real = grow_host < G
    inv_perm[grow_host[real]] = np.flatnonzero(real).astype(np.int32)

    edge_cap = max(1 << 18, 8 * G)
    while True:
        e_row, e_col, e_inter, e_union, n_edges, M, ims = _device_bbh(
            grow_d,
            cand_d,
            inter_d,
            valid_d,
            jnp.asarray(inv_perm),
            col_lens,
            jnp.asarray(genome_pad),
            n_gen=index.n_genomes,
            n_true=G,
            edge_cap=edge_cap,
        )
        n_edges = int(n_edges)
        if n_edges <= edge_cap:
            break
        edge_cap = _round_up(n_edges, 1 << 16)

    e_row = np.asarray(e_row)
    keep = e_row >= 0
    e_row = e_row[keep]
    e_col = np.asarray(e_col)[keep]
    e_inter = np.asarray(e_inter)[keep].astype(np.int64)
    e_union = np.asarray(e_union)[keep].astype(np.int64)

    # host-exact f32 scores + canonical dedup (PangeneNet.java:167-174)
    scores = e_inter.astype(np.float32) / e_union.astype(np.float32)
    a = np.minimum(e_row, e_col).astype(np.int64)
    b = np.maximum(e_row, e_col).astype(np.int64)
    key = (a << np.int64(32)) | b
    _, first = np.unique(key, return_index=True)
    edges = [
        (int(a[t]), int(b[t]), float(scores[t])) for t in sorted(first)
    ]
    edges.sort()
    stats = {
        "n_edges": len(edges),
        "device_bbh": True,
    }
    return edges, stats
