"""Dense TPU scoring path: blocked generalized-Jaccard over k-mer multisets.

This replaces the reference's inverted-index posting walk
(``library.cpp:409-527``) with an MXU-friendly dense formulation.  For a
row-block of R genes against a column-block of C genes, with both sides
projected onto the row-block's local vocabulary (V dense columns):

- ``perc_cnt(i,j)    = sum_v count_i(v) * [count_j(v) > 0]``  -> one matmul
  ``A_counts @ B_presence^T``,
- ``tr_perc_cnt(i,j) = sum_v [count_i(v) > 0] * count_j(v)``  -> one matmul,
- ``intersection(i,j) = sum_v min(count_i(v), count_j(v))`` via the level
  decomposition ``min(a,b) = sum_t [a>=t][b>=t]`` -> ``level_cap`` matmuls
  of 0/1 matrices; accumulation is always f32 (exact for integers < 2^24).

Exactness with bf16 operands: presence/level matrices are 0/1 (exact);
count matrices are clipped to ``COUNT_CLIP`` = 256 (the largest integer
bfloat16 represents exactly) and counts above the clip get exact host-side
corrections.  Counts above ``level_cap`` likewise get host corrections for
the intersection (``min(a,b) - level_cap`` when BOTH sides exceed the cap).
Such entries are rare (long homopolymer runs).

Scheduling: rows are permuted by profile width and processed in
width-bucketed row blocks, so a block of short profiles gets a
proportionally small local vocabulary V = R * W_bucket (less matmul and
projection work).  The whole pass for one bucket runs as a single
``lax.scan`` device program — remote-TPU dispatch round-trips cost ~30ms,
so per-block host loops are fatal.

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

# Largest integer bfloat16 represents exactly; counts are clipped here for
# the bf16 matmuls and corrected on host above it.
COUNT_CLIP = 256


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
    """Dense padded (ids, counts) arrays for the device engines.

    Memoized on the index: rebuilding costs seconds of host time per
    call at Mycoplasma-64 scale and every scoring pass needs the same
    arrays."""
    cache = getattr(index, "_pad_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(index, "_pad_cache", cache)
    key = ("pad", row_block, col_block)
    if key in cache:
        return cache[key]
    out = _pad_profiles_impl(index, row_block, col_block)
    cache[key] = out
    return out


def _pad_profiles_impl(
    index: KmerIndex, row_block: int, col_block: int
) -> PaddedProfiles:
    G = index.n_sequences
    W = max(128, _round_up(max(1, index.max_profile_len), 128))
    # Always strictly more padded rows than genes: padded (empty) rows are
    # used as masked targets for row-permutation padding.
    G_pad = _round_up(G + 1, max(row_block, col_block))
    sentinel = index.vocab_size
    ids = np.full((G_pad, W), sentinel, dtype=np.int32)
    counts = np.zeros((G_pad, W), dtype=np.int32)
    ptr = index.profile_ptr
    widths = np.diff(ptr)
    if G > 0 and widths.max(initial=0) > W:
        raise AssertionError("profile wider than padding width")
    if G > 0 and index.profile_ids.size:
        # boolean-mask assignment walks the destination in row-major
        # order — exactly the CSR source order — in one C pass (the
        # element-index scatter it replaces cost ~1.5s at Mycoplasma-64
        # scale, ~10x this form)
        mask = np.arange(W) < widths[:, None]
        ids[:G][mask] = index.profile_ids
        counts[:G][mask] = index.profile_counts
    return PaddedProfiles(ids, counts, G, index.vocab_size, W)


def _score_row_block_core(
    row_ids,  # int32 [R, W_row]
    row_counts,  # int32 [R, W_row]
    all_ids,  # int32 [G_pad, W]
    all_counts,  # int32 [G_pad, W]
    vocab_size: int,
    col_block: int,
    level_cap: int,
    matmul_dtype: str,
):
    """Integer accumulators for one row-block against all columns.

    Returns (inter, perc, tr) each f32 [R, G_pad] holding exact integers
    (subject to the documented COUNT_CLIP / level_cap clipping, corrected
    on host).
    """
    R, W_row = row_ids.shape
    G_pad, W = all_ids.shape
    V = R * W_row
    sentinel = vocab_size

    dot_dtype = jnp.bfloat16 if matmul_dtype == "bf16" else jnp.float32

    # --- local vocabulary of the row block (sorted, padded with sentinel)
    rv = jnp.unique(row_ids.reshape(-1), size=V, fill_value=sentinel)

    # --- inverse table: global id -> local position (or stay at slot V)
    inv = jnp.full((vocab_size + 1,), V, dtype=jnp.int32)
    inv = inv.at[rv].set(jnp.arange(V, dtype=jnp.int32), mode="drop")

    def project(ids_blk, counts_blk):
        """[C, w] profiles -> dense [C, V] count matrix (f32)."""
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
    A_pres = (A > 0).astype(dot_dtype)
    A_cnt = jnp.minimum(A, COUNT_CLIP).astype(dot_dtype)
    # level matrices of the row side are reused across every column block
    A_levels = [(A >= t).astype(dot_dtype) for t in range(1, level_cap + 1)]

    def dot_nt(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def one_col_block(cb, carry):
        inter_acc, perc_acc, tr_acc = carry
        start = cb * col_block
        ids_blk = jax.lax.dynamic_slice(all_ids, (start, 0), (col_block, W))
        counts_blk = jax.lax.dynamic_slice(
            all_counts, (start, 0), (col_block, W)
        )
        B = project(ids_blk, counts_blk)  # [C, V]
        B_pres = (B > 0).astype(dot_dtype)
        B_cnt = jnp.minimum(B, COUNT_CLIP).astype(dot_dtype)

        perc = dot_nt(A_cnt, B_pres)
        tr = dot_nt(A_pres, B_cnt)
        inter = dot_nt(A_levels[0], B_pres)
        for t in range(2, level_cap + 1):
            inter = inter + dot_nt(A_levels[t - 1], (B >= t).astype(dot_dtype))

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


@functools.partial(
    jax.jit,
    static_argnames=("vocab_size", "col_block", "level_cap", "matmul_dtype"),
)
def _score_row_block(
    row_ids,
    row_counts,
    all_ids,
    all_counts,
    vocab_size: int,
    col_block: int,
    level_cap: int,
    matmul_dtype: str,
):
    """Standalone jitted single-block scoring (entry point / mesh step)."""
    return _score_row_block_core(
        row_ids,
        row_counts,
        all_ids,
        all_counts,
        vocab_size,
        col_block,
        level_cap,
        matmul_dtype,
    )


def _extract_nonzero_core(
    inter, perc, tr, grow, row_lens, col_lens, cap: int, n_true: int, k2: int
):
    """Compact surviving cells into fixed-size index lists.

    A cell survives when intersection > 0 AND the reference's validity
    threshold holds (library.cpp:499-500): ``perc_cnt/|A| >= 1/(2k)`` OR
    ``tr_perc_cnt/|B| >= 1/(2k)``.  The threshold is applied here as the
    exact integer test ``2k * perc_cnt >= |A|``, which is equivalent to the
    reference's f32 comparison for all |A| below ~1e6 (the f32 rounding gap
    around 1/(2k) is far smaller than 1/|A|).  Self cells and padding are
    excluded (library.cpp:484-487).

    ``grow`` is the per-local-row GLOBAL gene id (rows are processed in
    width-sorted permuted order); padded slots carry an id >= n_true.
    """
    R, G_pad = inter.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, G_pad), 1)
    valid = (jnp.float32(k2) * perc >= row_lens[:, None]) | (
        jnp.float32(k2) * tr >= col_lens[None, :]
    )
    mask = (
        (inter > 0)
        & valid
        & (cols != grow[:, None])
        & (cols < n_true)
        & (grow[:, None] < n_true)
    )
    count = jnp.sum(mask, dtype=jnp.int32)
    flat = mask.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=cap, fill_value=-1)
    safe = jnp.maximum(idx, 0)
    r = grow[safe // G_pad]
    c = safe % G_pad
    valid_idx = idx >= 0
    return (
        jnp.where(valid_idx, r, -1),
        jnp.where(valid_idx, c, -1),
        inter.reshape(-1)[safe],
        perc.reshape(-1)[safe],
        tr.reshape(-1)[safe],
        count,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_size",
        "row_block",
        "w_row",
        "col_block",
        "level_cap",
        "matmul_dtype",
        "cap",
        "n_true",
        "k2",
    ),
)
def _score_all_blocks(
    all_ids,
    all_counts,
    col_lens,
    perm_pad,  # int32 [n_blocks * row_block]: width-sorted gene order
    starts,  # int32 [n_blocks]: offsets into perm_pad
    vocab_size: int,
    row_block: int,
    w_row: int,
    col_block: int,
    level_cap: int,
    matmul_dtype: str,
    cap: int,
    n_true: int,
    k2: int,
):
    """Whole scoring pass for one width bucket as one device program: a
    lax.scan over row blocks, each compacting surviving cells into a
    fixed-size slot.  One dispatch + one fetch for the entire bucket."""

    def body(_, start):
        idxs = jax.lax.dynamic_slice(perm_pad, (start,), (row_block,))
        row_ids = all_ids[idxs, :w_row]
        row_counts = all_counts[idxs, :w_row]
        inter, perc, tr = _score_row_block_core(
            row_ids,
            row_counts,
            all_ids,
            all_counts,
            vocab_size,
            col_block,
            level_cap,
            matmul_dtype,
        )
        row_lens = col_lens[jnp.minimum(idxs, col_lens.shape[0] - 1)]
        out = _extract_nonzero_core(
            inter, perc, tr, idxs, row_lens, col_lens, cap, n_true, k2
        )
        return None, out

    _, outs = jax.lax.scan(body, None, starts)
    return outs


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


def _host_count_clip_corrections(index: KmerIndex):
    """Sparse exact corrections for per-(gene,kmer) counts > COUNT_CLIP
    (bf16 matmul clipping of perc/tr counts).

    Returns dict (i, j) -> (d_perc, d_tr): for every over-clip entry
    (gene i, kmer v, count c) and every other gene j sharing v,
    perc_cnt(i, j) is short by c - COUNT_CLIP and tr_perc_cnt(j, i)
    likewise.
    """
    over = np.flatnonzero(index.profile_counts > COUNT_CLIP)
    if over.size == 0:
        return {}
    gene_of_entry = np.repeat(
        np.arange(index.n_sequences, dtype=np.int64),
        np.diff(index.profile_ptr),
    )
    # posting lists: all entries grouped by kmer id
    order = np.argsort(index.profile_ids, kind="stable")
    post_ids = index.profile_ids[order]
    post_gene = gene_of_entry[order]
    corrections: dict = {}
    for e in over:
        i = int(gene_of_entry[e])
        v = int(index.profile_ids[e])
        extra = int(index.profile_counts[e]) - COUNT_CLIP
        lo = np.searchsorted(post_ids, v, side="left")
        hi = np.searchsorted(post_ids, v, side="right")
        for j in post_gene[lo:hi]:
            j = int(j)
            if j == i:
                continue
            dp, dt = corrections.get((i, j), (0, 0))
            corrections[(i, j)] = (dp + extra, dt)
            dp, dt = corrections.get((j, i), (0, 0))
            corrections[(j, i)] = (dp, dt + extra)
    return corrections


def _host_compute_cell(index: KmerIndex, i: int, j: int):
    """Exact (intersection, perc_cnt, tr_perc_cnt) for one ordered pair."""
    si, ei = index.profile_ptr[i], index.profile_ptr[i + 1]
    sj, ej = index.profile_ptr[j], index.profile_ptr[j + 1]
    ids_i = index.profile_ids[si:ei]
    ids_j = index.profile_ids[sj:ej]
    common, ia, ja = np.intersect1d(
        ids_i, ids_j, assume_unique=True, return_indices=True
    )
    ci = index.profile_counts[si:ei][ia].astype(np.int64)
    cj = index.profile_counts[sj:ej][ja].astype(np.int64)
    return (
        int(np.minimum(ci, cj).sum()),
        int(ci.sum()),
        int(cj.sum()),
    )


def _width_buckets(widths: np.ndarray, row_block: int, w_max: int):
    """Permute genes by profile width into row blocks; group blocks by the
    per-block padded width class.  Returns list of
    (w_bucket, perm_pad, starts) with perm padding value = len(widths)."""
    G = widths.shape[0]
    perm = np.argsort(widths, kind="stable").astype(np.int32)
    n_blocks = (G + row_block - 1) // row_block
    perm_pad = np.full(n_blocks * row_block, G, dtype=np.int32)
    perm_pad[:G] = perm
    buckets: dict = {}
    for b in range(n_blocks):
        blk = perm_pad[b * row_block : (b + 1) * row_block]
        real = blk[blk < G]
        wb = int(widths[real].max()) if real.size else 1
        # quantize width classes to powers of two (bounded number of
        # compiled program variants), capped at the global padded width
        w2 = 128
        while w2 < wb:
            w2 *= 2
        wb = min(w2, _round_up(w_max, 128))
        buckets.setdefault(wb, []).append(b * row_block)
    return [
        (wb, perm_pad, np.asarray(starts, dtype=np.int32))
        for wb, starts in sorted(buckets.items())
    ]


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

    cap = config.nnz_cap_per_row * row_block

    lens_pad = np.zeros(G_pad, dtype=np.float32)
    lens_pad[:G] = index.kseq_lengths
    col_lens = jnp.asarray(lens_pad)

    widths = np.diff(index.profile_ptr)

    rows_out, cols_out, i_out, p_out, t_out = [], [], [], [], []

    def run_bucket(w_row, perm_pad, starts, local_cap):
        return _score_all_blocks(
            all_ids,
            all_counts,
            col_lens,
            jnp.asarray(perm_pad),
            jnp.asarray(starts),
            vocab_size=index.vocab_size,
            row_block=row_block,
            w_row=w_row,
            col_block=col_block,
            level_cap=config.level_cap,
            matmul_dtype=config.matmul_dtype,
            cap=local_cap,
            n_true=G,
            k2=2 * index.k,
        )

    for w_row, perm_pad, starts in _width_buckets(
        widths, row_block, padded.width
    ):
        r, c, iv, pv, tv, counts = run_bucket(w_row, perm_pad, starts, cap)
        counts = np.asarray(counts)
        r = np.asarray(r).reshape(-1)
        keep = r >= 0
        c = np.asarray(c).reshape(-1)
        iv = np.asarray(iv).reshape(-1)
        pv = np.asarray(pv).reshape(-1)
        tv = np.asarray(tv).reshape(-1)

        over = np.flatnonzero(counts > cap)
        if over.size:
            # Drop truncated blocks' cells, recompute them with larger cap.
            over_rows = set()
            for bi in over:
                s = int(starts[bi])
                over_rows.update(
                    int(x) for x in perm_pad[s : s + row_block] if x < G
                )
            drop = np.isin(r, np.fromiter(over_rows, dtype=np.int32))
            keep = keep & ~drop
            for bi in over:
                local_cap = _round_up(int(counts[bi]), row_block)
                r2, c2, iv2, pv2, tv2, _ = run_bucket(
                    w_row,
                    perm_pad,
                    np.asarray([int(starts[bi])], np.int32),
                    local_cap,
                )
                r2 = np.asarray(r2).reshape(-1)
                k2m = r2 >= 0
                rows_out.append(r2[k2m])
                cols_out.append(np.asarray(c2).reshape(-1)[k2m])
                i_out.append(np.asarray(iv2).reshape(-1)[k2m].astype(np.int64))
                p_out.append(np.asarray(pv2).reshape(-1)[k2m].astype(np.int64))
                t_out.append(np.asarray(tv2).reshape(-1)[k2m].astype(np.int64))

        rows_out.append(r[keep])
        cols_out.append(c[keep])
        i_out.append(iv[keep].astype(np.int64))
        p_out.append(pv[keep].astype(np.int64))
        t_out.append(tv[keep].astype(np.int64))

    row = np.concatenate(rows_out)
    col = np.concatenate(cols_out)
    inter = np.concatenate(i_out)
    perc = np.concatenate(p_out)
    tr = np.concatenate(t_out)

    # --- host corrections (rare entries above the clipping thresholds)
    lvl_corr = _host_level_cap_corrections(index, config.level_cap)
    cnt_corr = (
        _host_count_clip_corrections(index)
        if config.matmul_dtype == "bf16"
        else {}
    )
    if lvl_corr or cnt_corr:
        cell_index = {
            (int(a), int(b)): n for n, (a, b) in enumerate(zip(row, col))
        }
        extra_rows = []
        for key in set(lvl_corr) | set(cnt_corr):
            n = cell_index.get(key)
            if n is not None:
                if key in lvl_corr:
                    inter[n] += lvl_corr[key]
                if key in cnt_corr:
                    dp, dt = cnt_corr[key]
                    perc[n] += dp
                    tr[n] += dt
            else:
                # The cell was dropped by the on-device validity filter
                # computed on CLIPPED counters; recompute exactly — it may
                # become valid once unclipped (perc corrections only raise
                # perc).  Level-cap corrections alone can't change validity.
                if key not in cnt_corr:
                    continue
                i0, j0 = key
                ti, tp, tt = _host_compute_cell(index, i0, j0)
                a = int(index.kseq_lengths[i0])
                b = int(index.kseq_lengths[j0])
                if 2 * index.k * tp >= a or 2 * index.k * tt >= b:
                    extra_rows.append((i0, j0, ti, tp, tt))
        if extra_rows:
            er = np.asarray(extra_rows, dtype=np.int64)
            row = np.concatenate([row, er[:, 0].astype(np.int32)])
            col = np.concatenate([col, er[:, 1].astype(np.int32)])
            inter = np.concatenate([inter, er[:, 2]])
            perc = np.concatenate([perc, er[:, 3]])
            tr = np.concatenate([tr, er[:, 4]])

    return ScoreCells(
        row.astype(np.int32), col.astype(np.int32), inter, perc, tr
    )
