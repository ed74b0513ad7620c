"""Dense TPU scoring path: blocked generalized-Jaccard over k-mer multisets.

This replaces the reference's inverted-index posting walk
(``library.cpp:409-527``) with an MXU-friendly dense formulation.  For a
row-block of R genes against a column-block of C genes, with both sides
projected onto the row-block's local vocabulary (V dense columns):

- ``perc_cnt(i,j)    = sum_v count_i(v) * [count_j(v) > 0]``  -> one matmul
  ``A_counts @ B_presence^T`` (f32, exact for integer counts < 2^24),
- ``tr_perc_cnt(i,j) = sum_v [count_i(v) > 0] * count_j(v)``  -> one matmul,
- ``intersection(i,j) = sum_v min(count_i(v), count_j(v))`` via the level
  decomposition ``min(a,b) = sum_t [a>=t][b>=t]`` -> ``level_cap`` matmuls
  of 0/1 matrices (bf16 operands, f32 accumulation, exact).

Counts above ``level_cap`` are clipped for the level matmuls; the exact
correction ``min(a,b) - level_cap`` for pairs where BOTH genes exceed the
cap on the same k-mer is applied on host (such entries are rare: long
homopolymer runs).  ``perc``/``tr_perc`` always use unclipped counts.

The reference's cache-blocking analogue is the 2048-wide column stepping at
``library.cpp:453-458``; here the block sizes are the (row_block, col_block)
tile grid.

The projection uses an inverse-vocabulary table (global dense int32 id ->
position in the row-block's local vocabulary) built by scatter once per
row-block, so column profiles are projected with pure gathers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import KmerIndex
from pandelos_tpu.oracle.cells import ScoreCells


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class PaddedProfiles:
    """Fixed-shape device-ready profile arrays."""

    ids: np.ndarray  # int32 [G_pad, W], sentinel = vocab_size
    counts: np.ndarray  # int32 [G_pad, W], 0 on padding
    n_sequences: int  # true G
    vocab_size: int
    width: int


def pad_profiles(index: KmerIndex, row_block: int, col_block: int) -> PaddedProfiles:
    G = index.n_sequences
    W = max(128, _round_up(max(1, index.max_profile_len), 128))
    G_pad = max(_round_up(max(1, G), row_block), _round_up(max(1, G), col_block))
    sentinel = index.vocab_size
    ids = np.full((G_pad, W), sentinel, dtype=np.int32)
    counts = np.zeros((G_pad, W), dtype=np.int32)
    ptr = index.profile_ptr
    for i in range(G):
        s, e = ptr[i], ptr[i + 1]
        n = int(e - s)
        if n > W:
            raise AssertionError("profile wider than padding width")
        ids[i, :n] = index.profile_ids[s:e]
        counts[i, :n] = index.profile_counts[s:e]
    return PaddedProfiles(ids, counts, G, index.vocab_size, W)


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_size",
        "col_block",
        "level_cap",
        "matmul_dtype",
    ),
)
def _score_row_block(
    row_ids,  # int32 [R, W]
    row_counts,  # int32 [R, W]
    all_ids,  # int32 [G_pad, W]
    all_counts,  # int32 [G_pad, W]
    vocab_size: int,
    col_block: int,
    level_cap: int,
    matmul_dtype: str,
):
    """Compute integer accumulators for one row-block against all columns.

    Returns (inter, perc, tr) each f32 [R, G_pad] holding exact integers.
    """
    R, W = row_ids.shape
    G_pad = all_ids.shape[0]
    V = R * W
    sentinel = vocab_size

    # --- local vocabulary of the row block (sorted, padded with sentinel)
    rv = jnp.unique(row_ids.reshape(-1), size=V, fill_value=sentinel)

    # --- inverse table: global id -> local position (or stay at slot V)
    inv = jnp.full((vocab_size + 1,), V, dtype=jnp.int32)
    # Sentinel-valued rv entries all write to inv[sentinel], which is never
    # read back meaningfully (gathers of sentinel ids are masked below).
    inv = inv.at[rv].set(jnp.arange(V, dtype=jnp.int32), mode="drop")

    def project(ids_blk, counts_blk):
        """[C, W] profiles -> dense [C, V(+1)] count matrix (f32)."""
        pos = inv[jnp.clip(ids_blk, 0, vocab_size)]
        pos = jnp.where(ids_blk == sentinel, V, pos)
        C = ids_blk.shape[0]
        dense = jnp.zeros((C, V + 1), dtype=jnp.float32)
        rows = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None], pos.shape)
        dense = dense.at[rows, pos].add(
            counts_blk.astype(jnp.float32), mode="drop"
        )
        return dense[:, :V]

    A = project(row_ids, row_counts)  # [R, V] counts (f32 exact ints)
    A_pres = (A > 0).astype(jnp.float32)

    dot_dtype = jnp.bfloat16 if matmul_dtype == "bf16" else jnp.float32

    def one_col_block(cb, carry):
        inter_acc, perc_acc, tr_acc = carry
        start = cb * col_block
        ids_blk = jax.lax.dynamic_slice(all_ids, (start, 0), (col_block, W))
        counts_blk = jax.lax.dynamic_slice(
            all_counts, (start, 0), (col_block, W)
        )
        B = project(ids_blk, counts_blk)  # [C, V]
        B_pres = (B > 0).astype(jnp.float32)

        perc = jax.lax.dot_general(
            A,
            B_pres,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tr = jax.lax.dot_general(
            A_pres,
            B,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        inter = jnp.zeros((R, col_block), dtype=jnp.float32)
        for t in range(1, level_cap + 1):
            At = (A >= t).astype(dot_dtype)
            Bt = (B >= t).astype(dot_dtype)
            inter = inter + jax.lax.dot_general(
                At,
                Bt,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        inter_acc = jax.lax.dynamic_update_slice(inter_acc, inter, (0, start))
        perc_acc = jax.lax.dynamic_update_slice(perc_acc, perc, (0, start))
        tr_acc = jax.lax.dynamic_update_slice(tr_acc, tr, (0, start))
        return inter_acc, perc_acc, tr_acc

    init = (
        jnp.zeros((R, G_pad), dtype=jnp.float32),
        jnp.zeros((R, G_pad), dtype=jnp.float32),
        jnp.zeros((R, G_pad), dtype=jnp.float32),
    )
    n_col_blocks = G_pad // col_block
    inter, perc, tr = jax.lax.fori_loop(0, n_col_blocks, one_col_block, init)
    return inter, perc, tr


@functools.partial(jax.jit, static_argnames=("cap", "n_true"))
def _extract_nonzero(inter, perc, tr, row_offset, cap: int, n_true: int):
    """Compact score>0 candidate cells (intersection > 0, excluding the
    self cell and padding) into fixed-size index lists."""
    R, G_pad = inter.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, G_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, G_pad), 1)
    global_rows = rows + row_offset
    mask = (inter > 0) & (cols != global_rows) & (cols < n_true) & (
        global_rows < n_true
    )
    count = jnp.sum(mask, dtype=jnp.int32)
    flat = mask.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    safe = jnp.maximum(idx, 0)
    r = safe // G_pad + row_offset
    c = safe % G_pad
    valid = idx >= 0
    return (
        jnp.where(valid, r, -1),
        jnp.where(valid, c, -1),
        inter.reshape(-1)[safe],
        perc.reshape(-1)[safe],
        tr.reshape(-1)[safe],
        count,
    )


def _host_level_cap_corrections(index: KmerIndex, level_cap: int):
    """Sparse exact corrections for per-(gene,kmer) counts > level_cap.

    Returns dict (i, j) -> extra intersection, for ordered pairs where both
    genes hold the same k-mer with count > level_cap.
    """
    over = np.flatnonzero(index.profile_counts > level_cap)
    if over.size == 0:
        return {}
    gene_of_entry = np.repeat(
        np.arange(index.n_sequences, dtype=np.int64),
        np.diff(index.profile_ptr),
    )
    genes = gene_of_entry[over]
    ids = index.profile_ids[over]
    counts = index.profile_counts[over].astype(np.int64)
    order = np.argsort(ids, kind="stable")
    genes, ids, counts = genes[order], ids[order], counts[order]
    corrections: dict = {}
    start = 0
    n = ids.shape[0]
    while start < n:
        end = start
        while end < n and ids[end] == ids[start]:
            end += 1
        for x in range(start, end):
            for y in range(start, end):
                if x == y:
                    continue
                key = (int(genes[x]), int(genes[y]))
                corrections[key] = corrections.get(key, 0) + int(
                    min(counts[x], counts[y]) - level_cap
                )
        start = end
    return corrections


def compute_cells_xla(
    index: KmerIndex, config: Optional[PipelineConfig] = None
) -> ScoreCells:
    """Full-dataset cell computation on the default JAX backend."""
    config = config or PipelineConfig()
    G = index.n_sequences
    if G == 0 or index.profile_ids.size == 0:
        z32 = np.zeros(0, dtype=np.int32)
        z64 = np.zeros(0, dtype=np.int64)
        return ScoreCells(z32, z32, z64, z64, z64)

    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    padded = pad_profiles(index, row_block, col_block)
    G_pad = padded.ids.shape[0]

    all_ids = jnp.asarray(padded.ids)
    all_counts = jnp.asarray(padded.counts)

    rows_out, cols_out, i_out, p_out, t_out = [], [], [], [], []
    cap = config.nnz_cap_per_row * row_block

    for start in range(0, G_pad, row_block):
        if start >= G:
            break
        row_ids = jax.lax.dynamic_slice(
            all_ids, (start, 0), (row_block, padded.width)
        )
        row_counts = jax.lax.dynamic_slice(
            all_counts, (start, 0), (row_block, padded.width)
        )
        inter, perc, tr = _score_row_block(
            row_ids,
            row_counts,
            all_ids,
            all_counts,
            vocab_size=index.vocab_size,
            col_block=col_block,
            level_cap=config.level_cap,
            matmul_dtype=config.matmul_dtype,
        )
        local_cap = cap
        while True:
            r, c, iv, pv, tv, count = _extract_nonzero(
                inter,
                perc,
                tr,
                jnp.int32(start),
                cap=local_cap,
                n_true=G,
            )
            count = int(count)
            if count <= local_cap:
                break
            local_cap = _round_up(count, row_block)
        keep = np.asarray(r) >= 0
        rows_out.append(np.asarray(r)[keep])
        cols_out.append(np.asarray(c)[keep])
        i_out.append(np.asarray(iv)[keep].astype(np.int64))
        p_out.append(np.asarray(pv)[keep].astype(np.int64))
        t_out.append(np.asarray(tv)[keep].astype(np.int64))

    row = np.concatenate(rows_out) if rows_out else np.zeros(0, np.int32)
    col = np.concatenate(cols_out) if cols_out else np.zeros(0, np.int32)
    inter = np.concatenate(i_out) if i_out else np.zeros(0, np.int64)
    perc = np.concatenate(p_out) if p_out else np.zeros(0, np.int64)
    tr = np.concatenate(t_out) if t_out else np.zeros(0, np.int64)

    corrections = _host_level_cap_corrections(index, config.level_cap)
    if corrections:
        cell_index = {(int(a), int(b)): n for n, (a, b) in enumerate(zip(row, col))}
        for (a, b), extra in corrections.items():
            n = cell_index.get((a, b))
            if n is None:
                raise AssertionError(
                    "level-cap correction for a cell that was not extracted"
                )
            inter[n] += extra

    return ScoreCells(
        row.astype(np.int32), col.astype(np.int32), inter, perc, tr
    )
