"""Candidate-filtered exact scoring engine — the TPU fast path.

Replaces the reference's inverted-index posting walk (library.cpp:409-527)
with a three-stage, scatter-free device pipeline (TPU XLA is catastrophic
at scatter; measured ~11s for a single 500k-element scatter on v5e):

1. **Bound stage (MXU)**: per-gene bucket-mass signatures ``S[g, b] =
   sum of counts of g's k-mers hashing to bucket b`` are built on host
   (one bincount) and rounded UP to bfloat16.  For genes i, j::

       perc_bound(i,j) = sum_b S[i,b] * [S[j,b] > 0]  >=  perc_cnt(i,j)
       tr_bound(i,j)   = sum_b [S[i,b] > 0] * S[j,b]  >=  tr_perc_cnt(i,j)

   (true shared k-mers always land in buckets the other gene occupies).
   Two [R,B]@[B,G] bf16 matmuls per row block give exact-in-f32 upper
   bounds, so thresholding with the reference's validity test
   ``2k*perc >= |A| OR 2k*tr >= |B|`` can NEVER drop a truly valid pair.

2. **Candidate extraction**: per row, positions of bound-passing columns
   via row-wise cumsum + vmapped searchsorted (no scatter, no top_k), up
   to ``candidate_cap`` per row; overflowing rows fall back to the host
   posting-walk oracle (exact, rare).

3. **Exact stage (VPU)**: for each candidate pair, the exact integer
   accumulators by direct equality-join of the two sorted id profiles:
   ``eq[w1,w2] = (ids_i[w1] == ids_j[w2])`` with min/count reductions —
   regular, gather-light (one profile row-gather per candidate),
   mask-safe.  All counters are integers held in f32 (< 2^24, exact).

No scores are computed on device: TPU f32 division is not IEEE-correctly
rounded (measured: 35% of quotients differ from the host by 1 ulp, and
x/x can be != 1.0), which would corrupt the reference's float-equality
BBH semantics (Pangenes.java:100-101).  The device ships integer cells;
the host finalizes scores bit-exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import KmerIndex
from pandelos_tpu.oracle.cells import ScoreCells
from pandelos_tpu.ops.score import _round_up, pad_profiles

def _bf16_round_up(x: np.ndarray) -> np.ndarray:
    """Round positive float32 values UP to the nearest bfloat16 value
    (keeps upper-bound semantics).  Returned as float32 holding exact
    bf16 values."""
    x32 = np.ascontiguousarray(x, dtype=np.float32)
    bits = x32.view(np.uint32)
    # truncate to bf16 (round toward zero), bump one bf16-ulp when the
    # truncation lost bits
    trunc = bits & np.uint32(0xFFFF0000)
    lost = (bits & np.uint32(0x0000FFFF)) != 0
    bumped = trunc + np.where(lost, np.uint32(0x00010000), np.uint32(0))
    return bumped.view(np.float32).copy()


def build_signatures(
    index: KmerIndex,
    padded,
    config: Optional[PipelineConfig] = None,
    force_host: bool = False,
    ids_d=None,
    counts_d=None,
):
    """Range-bucket mass signatures [G_pad, B] as f32 holding exact bf16
    round-up values (upper-bound safe for the bound matmuls).

    Built on device by the Pallas histogram kernel when running on TPU
    (scatter-free; host build + upload would cost ~20s/GB over the remote
    tunnel), by NumPy bincount otherwise.  Pass ``ids_d``/``counts_d``
    (the runner's device-resident padded profiles) to skip re-uploading
    the ~244MB unpacked arrays the histogram would otherwise ship.
    """
    from pandelos_tpu.ops.pallas_hist import (
        device_histogram,
        host_histogram,
        pick_buckets,
    )

    cache = getattr(index, "_pad_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(index, "_pad_cache", cache)
    ckey = ("sig", padded.ids.shape, bool(force_host))
    if ckey in cache:
        return cache[ckey]

    n_buckets, shift = pick_buckets(
        index.vocab_size,
        max(1, index.max_profile_len),
        index.k,
        n_genes=padded.ids.shape[0],
    )
    use_device = (not force_host) and jax.default_backend() not in ("cpu",)
    if use_device:
        mass = device_histogram(
            jnp.asarray(padded.ids) if ids_d is None else ids_d,
            jnp.asarray(padded.counts) if counts_d is None else counts_d,
            n_buckets=n_buckets, shift=shift, round_up_bf16=True,
        )
        out = (mass, n_buckets, shift)
    else:
        mass = host_histogram(padded.ids, padded.counts, n_buckets, shift)
        out = (
            jnp.asarray(_bf16_round_up(mass)).astype(jnp.bfloat16),
            n_buckets,
            shift,
        )
    cache[ckey] = out
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "row_block", "w_row", "cand_cap", "n_true", "k2", "do_join",
        "upper_only", "from_T",
    ),
)
def _candidate_blocks(
    all_ids,  # int32 [G_pad, W]
    all_counts,  # int32 [G_pad, W]
    sig_mass,  # f32 (bf16 values) [G_pad, B]; with from_T: T int8 [GP, GP]
    col_lens,  # f32 [G_pad]
    prof_width,  # int32 [G_pad] true profile widths (0 for padding rows)
    perm_pad,  # int32 [>= n_blocks * row_block] width-sorted gene order
    starts,  # int32 [n_blocks]
    row_block: int,
    w_row: int,
    cand_cap: int,
    n_true: int,
    k2: int,
    do_join: bool = True,
    upper_only: bool = False,
    from_T: bool = False,
):
    """One width bucket's scoring pass: lax.scan over row blocks.

    With ``upper_only`` the candidate mask keeps only columns j > row:
    the bound/validity are direction-symmetric, so each unordered pair
    appears exactly once (in its lower-id row's list) and the caller
    mirrors results — half the extraction and join work, no dedup.

    Returns per block: grow [R] (global row gene ids), cand [R, K]
    (candidate col ids), inter/perc/tr [R, K] (exact integer counters in
    f32), valid [R, K] bool, and per-row candidate counts [R] (rows with
    count > K are handled by the host fallback)."""
    G_pad, W = all_ids.shape
    R = row_block
    K = cand_cap
    if from_T:
        # column space = perm POSITIONS (no per-block gene reorder: the
        # [R, G_pad] int8 column gather costs more than the matmuls it
        # replaces).  Candidate lists come out perm-ordered instead of
        # gene-ordered — same SET per row; every consumer is
        # order-agnostic (flatten/join/maxima/emission; the host
        # canonicalizes edges).
        GP = sig_mass.shape[0]
        cols_gene = jax.lax.slice(perm_pad, (0,), (GP,))  # [GP]
        lens_gp = col_lens[jnp.minimum(cols_gene, G_pad - 1)]  # [GP]
    else:
        sig_bf = sig_mass.astype(jnp.bfloat16)
        sig_pres = (sig_bf != 0).astype(jnp.bfloat16)

    def body(_, start):
        idxs = jax.lax.dynamic_slice(perm_pad, (start,), (R,))  # [R]
        grow = idxs
        row_lens = col_lens[idxs]  # [R]

        if from_T:
            # --- stage 1': read the precomputed symmetric bound bits
            bound = (
                jax.lax.dynamic_slice(sig_mass, (start, 0), (R, GP)) > 0
            )  # [R, GP] perm columns
            col_ids = cols_gene[None, :]  # gene id per perm column
            col_ls = lens_gp[None, :]
            CW = GP
        else:
            # --- stage 1: signature bound matmuls (MXU)
            mass_a = sig_bf[idxs]  # [R, B]
            pres_a = sig_pres[idxs]
            perc_bnd = jax.lax.dot_general(
                mass_a, sig_pres, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [R, G_pad]
            tr_bnd = jax.lax.dot_general(
                pres_a, sig_bf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bound = (
                jnp.float32(k2) * perc_bnd >= row_lens[:, None]
            ) | (jnp.float32(k2) * tr_bnd >= col_lens[None, :])
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, G_pad), 1)
            col_ls = col_lens[None, :]
            CW = G_pad

        cand_mask = (
            bound
            & (
                (col_ids > grow[:, None])
                if upper_only
                else (col_ids != grow[:, None])
            )
            & (col_ids < n_true)
            & (grow[:, None] < n_true)
            & (row_lens[:, None] > 0)
            & (col_ls > 0)
        )
        counts = jnp.sum(cand_mask, axis=1, dtype=jnp.int32)  # [R]

        # --- stage 2: rank-select the first K set columns per row.
        # Two-level tile select instead of a vmapped searchsorted over
        # the [R, CW] cumsum: the bisection's 16 rounds of row gathers
        # measured 0.84s/pass on v5e (scripts/stage2_probe.py); this
        # form is compare/sum vectorized except one CHUNKED tile gather
        # ([R, K, 128] rows of 128 contiguous bools).  Positions are
        # identical to searchsorted's (first index with cumsum >= rank).
        NT = -(-CW // 128)
        m3 = cand_mask
        if NT * 128 != CW:
            m3 = jnp.pad(cand_mask, ((0, 0), (0, NT * 128 - CW)))
        m3 = m3.reshape(R, NT, 128)
        tcnt = jnp.sum(m3, axis=-1, dtype=jnp.int32)  # [R, NT]
        tcs = jnp.cumsum(tcnt, axis=-1)  # [R, NT]
        q = jnp.arange(1, K + 1, dtype=jnp.int32)  # ranks
        t = jnp.sum(
            tcs[:, :, None] < q[None, None, :], axis=1, dtype=jnp.int32
        )  # [R, K] tile holding the q-th set bit (NT when q > counts)
        t_safe = jnp.minimum(t, NT - 1)
        base = jnp.where(
            t_safe > 0,
            jnp.take_along_axis(tcs, jnp.maximum(t_safe - 1, 0), axis=1),
            0,
        )  # set bits before the tile
        bits = jnp.take_along_axis(m3, t_safe[:, :, None], axis=1)
        wcs = jnp.cumsum(bits.astype(jnp.int32), axis=-1)  # [R, K, 128]
        rk = q[None, :] - base  # 1-based rank within the tile
        pos_in = jnp.sum(
            wcs < rk[:, :, None], axis=-1, dtype=jnp.int32
        )
        cand = t_safe * 128 + pos_in  # [R, K]
        have = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
        if from_T:
            # perm positions -> gene ids (tiny [R, K] gather)
            cand = cols_gene[jnp.minimum(cand, CW - 1)]
            cand = jnp.where(have, jnp.minimum(cand, G_pad - 1), n_true)
        else:
            # absent slots -> gene n_true (an empty padded profile row)
            cand = jnp.where(have, jnp.minimum(cand, G_pad - 1), n_true)

        # --- stage 3: exact equality-join over sorted profiles (VPU)
        a_ids = all_ids[idxs, :w_row]  # [R, w_row]
        a_cnt = all_counts[idxs, :w_row].astype(jnp.float32)

        a_chunk = min(128, w_row)
        # NOTE: both loop bounds must stay STATIC.  Measured on v5e:
        # chunking the b-axis to 128 regressed ~2x (the [R, ac]
        # sublane->lane splat of a_i is amortized over the full-W lane
        # axis; narrow b-chunks re-pay it per chunk), and making this
        # bound dynamic (true block max width) regressed ~1.7x — XLA
        # stops unrolling the chunk loop.  The width bucketing already
        # keeps w_row close to the true widths.
        na = w_row // a_chunk

        def k_step(kk, carry):
            inter_o, perc_o, tr_o = carry
            j = jax.lax.dynamic_slice(cand, (0, kk), (R, 1))[:, 0]  # [R]
            b_ids = all_ids[j]  # [R, W]
            b_cnt = all_counts[j].astype(jnp.float32)

            # chunk the row-profile axis to bound the [R, chunk, W]
            # equality temporary
            def chunk_step(ci, acc):
                inter_k, perc_k, match_b = acc
                a_i = jax.lax.dynamic_slice(
                    a_ids, (0, ci * a_chunk), (R, a_chunk)
                )
                a_c = jax.lax.dynamic_slice(
                    a_cnt, (0, ci * a_chunk), (R, a_chunk)
                )
                eq = a_i[:, :, None] == b_ids[:, None, :]  # [R, ac, W]
                minab = jnp.minimum(a_c[:, :, None], b_cnt[:, None, :])
                inter_k = inter_k + jnp.sum(
                    jnp.where(eq, minab, 0.0), axis=(1, 2)
                )
                perc_k = perc_k + jnp.sum(
                    a_c * jnp.any(eq, axis=2), axis=1
                )
                match_b = match_b | jnp.any(eq, axis=1)
                return inter_k, perc_k, match_b

            inter_k, perc_k, match_b = jax.lax.fori_loop(
                0,
                na,
                chunk_step,
                (
                    jnp.zeros((R,), jnp.float32),
                    jnp.zeros((R,), jnp.float32),
                    jnp.zeros((R, W), jnp.bool_),
                ),
            )
            tr_k = jnp.sum(b_cnt * match_b, axis=1)
            ins = lambda buf, v: jax.lax.dynamic_update_slice(
                buf, v[:, None], (0, kk)
            )
            return ins(inter_o, inter_k), ins(perc_o, perc_k), ins(tr_o, tr_k)

        if not do_join:
            # extraction-only mode: the exact join runs elsewhere (the
            # Pallas compare-and-rotate kernel, ops/pallas_join.py).
            # Emit ONLY (grow, cand, counts): the zero counter arrays
            # would otherwise cost ~250MB of fetch per full pass over
            # the remote-TPU tunnel.
            return None, (grow, cand, counts)
        zeros = jnp.zeros((R, K), dtype=jnp.float32)
        # only walk candidate slots that exist somewhere in this block
        k_used = jnp.minimum(jnp.max(counts), K)
        inter, perc, tr = jax.lax.fori_loop(
            0, k_used, k_step, (zeros, zeros, zeros)
        )

        # --- validity (exact integer form of the 1/(2k) threshold)
        cand_lens = col_lens[jnp.minimum(cand, G_pad - 1)]
        valid = (
            (inter > 0)
            & have
            & (
                (jnp.float32(k2) * perc >= row_lens[:, None])
                | (jnp.float32(k2) * tr >= cand_lens)
            )
        )
        return None, (grow, cand, inter, perc, tr, valid, counts)

    _, outs = jax.lax.scan(body, None, starts)
    return outs


def _host_fallback_rows(index: KmerIndex, rows) -> ScoreCells:
    """Exact posting-walk for a small set of rows (candidate-cap
    overflow); mirrors the oracle's per-row accumulation."""
    from pandelos_tpu.oracle.cells import _posting_csr

    post_ptr, post_gene, post_count = _posting_csr(index)
    G = index.n_sequences
    r_out, c_out, i_out, p_out, t_out = [], [], [], [], []
    for i in rows:
        s, e = index.profile_ptr[i], index.profile_ptr[i + 1]
        if e == s:
            continue
        ids = index.profile_ids[s:e]
        my_counts = index.profile_counts[s:e].astype(np.int64)
        lens = post_ptr[ids + 1] - post_ptr[ids]
        other_gene = np.concatenate(
            [post_gene[post_ptr[v] : post_ptr[v + 1]] for v in ids]
        )
        other_count = np.concatenate(
            [post_count[post_ptr[v] : post_ptr[v + 1]] for v in ids]
        )
        mine = np.repeat(my_counts, lens)
        keep = other_gene != i
        other_gene, other_count, mine = (
            other_gene[keep],
            other_count[keep],
            mine[keep],
        )
        inter = np.zeros(G, dtype=np.int64)
        perc = np.zeros(G, dtype=np.int64)
        tr = np.zeros(G, dtype=np.int64)
        np.add.at(inter, other_gene, np.minimum(other_count, mine))
        np.add.at(perc, other_gene, mine)
        np.add.at(tr, other_gene, other_count)
        touched = np.flatnonzero(inter)
        r_out.append(np.full(touched.shape, i, dtype=np.int32))
        c_out.append(touched.astype(np.int32))
        i_out.append(inter[touched])
        p_out.append(perc[touched])
        t_out.append(tr[touched])
    if not r_out:
        z32 = np.zeros(0, np.int32)
        z64 = np.zeros(0, np.int64)
        return ScoreCells(z32, z32, z64, z64, z64)
    return ScoreCells(
        np.concatenate(r_out),
        np.concatenate(c_out),
        np.concatenate(i_out),
        np.concatenate(p_out),
        np.concatenate(t_out),
    )


def _resolve_n_devices(config) -> int:
    """``config.n_devices`` or the default: every global device under a
    multi-process (jax.distributed) runtime, one device otherwise."""
    if config.n_devices is not None:
        return config.n_devices
    if jax.process_count() > 1:
        return len(jax.devices())
    return 1


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


# int8 bound-bit matrix byte cap; past this, extraction falls back to the
# two-matmul bound pass (memory_model documents the consequence)
_T_BYTES_CAP = int(4e9)


def t_mode_enabled(n_dev: int, n_proc: int, n_pos: int) -> bool:
    """Single shared bound-bits (T-mode) predicate for use_bound_bits,
    work_model and memory_model: single device, single process, and the
    symmetric int8 T matrix fits the byte cap."""
    return n_dev == 1 and n_proc == 1 and n_pos * n_pos <= _T_BYTES_CAP


# Module-level program cache: the jitted shard_map programs are shared by
# every MeshRunner with an equal mesh + statics (per-instance closures
# would defeat jax's jit cache and re-pay each compile per dataset).
_PROGRAM_CACHE: dict = {}


@functools.partial(
    jax.jit, static_argnames=("row_block", "k2", "n_pos")
)
def _bound_bits_blocks(
    sig_mass, col_lens, perm_pos, starts, row_block: int, k2: int,
    n_pos: int,
):
    """One-sided bound bits T[p, q] = test1(perm[p], perm[q]) as int8
    over perm POSITIONS, one matmul per row block.

    The candidate mask is symmetric: with perc_bnd(i, j) = sum_b
    mass_i[b] * pres_j[b] (an upper bound on the exact perc counter,
    library.cpp:475-477) and test1(i, j) = k2 * perc_bnd(i, j) >=
    len_i, the legacy two-matmul mask equals test1(i, j) OR
    test1(j, i) — the second matmul (tr side) recomputes the SAME
    global bilinear form transposed.  Materializing test1 once as a
    [n_pos, n_pos] int8 matrix halves the extraction FLOPs (the bound
    matmuls sit at the bf16 MXU roofline); the extraction then reads
    rows of T | T^T.  Every summand is an integer (bf16 round-up of an
    integer is an integer) and every partial sum < 2^24, so the f32
    accumulations are order-independent and the mask is bit-identical
    to the two-matmul path (differentially tested).

    Single-device formulation; multi-device runners keep the
    two-matmul path (T's columns would need an all-to-all)."""
    sig_bf = sig_mass.astype(jnp.bfloat16)
    sig_perm = sig_bf[perm_pos]  # [n_pos, B] rows AND cols in perm order
    pres_perm = (sig_perm != 0).astype(jnp.bfloat16)
    lens_perm = col_lens[perm_pos]
    R = row_block
    B = sig_perm.shape[1]

    def body(T, start):
        mass_a = jax.lax.dynamic_slice(sig_perm, (start, 0), (R, B))
        lens_a = jax.lax.dynamic_slice(lens_perm, (start,), (R,))
        bnd = jax.lax.dot_general(
            mass_a, pres_perm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, n_pos]
        bits = (jnp.float32(k2) * bnd >= lens_a[:, None]).astype(jnp.int8)
        return jax.lax.dynamic_update_slice(T, bits, (start, 0)), None

    T0 = jnp.zeros((n_pos, n_pos), jnp.int8)
    T, _ = jax.lax.scan(body, T0, starts)
    # symmetrize ONCE (one whole-array transpose): the extraction then
    # reads only contiguous row slices — a per-block int8 column slice +
    # transpose measured ~1s/pass on v5e (scripts/stage2_probe.py)
    return T | T.T


def _extract_program(mesh, axis: str, row_block: int, w_row: int,
                     cand_cap: int, n_true: int, k2: int,
                     do_join: bool, upper_only: bool,
                     from_T: bool = False):
    import functools as _ft

    from jax.sharding import PartitionSpec as P

    key = ("ex", mesh, axis, row_block, w_row, cand_cap, n_true, k2,
           do_join, upper_only, from_T)
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        return fn
    local = _ft.partial(
        _candidate_blocks,
        row_block=row_block,
        w_row=w_row,
        cand_cap=cand_cap,
        n_true=n_true,
        k2=k2,
        do_join=do_join,
        upper_only=upper_only,
        from_T=from_T,
    )
    if from_T:
        assert mesh.size == 1, "bound-bits extraction is single-device"
    if mesh.size == 1:
        # Single-device: the same local function, plain-jitted (it already
        # carries @jax.jit with static argnames).  The shard_map wrapper is
        # semantically identity here but routes through SPMD partitioning
        # the experimental remote-TPU backend does not reliably execute
        # (observed hangs), and costs compile time for nothing.
        _PROGRAM_CACHE[key] = local
        return local
    if do_join:
        out_specs = (
            P(axis, None),          # grow
            P(axis, None, None),    # cand
            P(axis, None, None),    # inter
            P(axis, None, None),    # perc
            P(axis, None, None),    # tr
            P(axis, None, None),    # valid
            P(axis, None),          # counts
        )
    else:
        out_specs = (
            P(axis, None),
            P(axis, None, None),
            P(axis, None),
        )
    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None),  # all_ids
                P(None, None),  # all_counts
                P(None, None),  # signatures
                P(None),        # col_lens
                P(None),        # profile widths
                P(None),        # perm
                P(axis),        # starts (sharded)
            ),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    _PROGRAM_CACHE[key] = fn
    return fn


def _flatten_join_program(mesh, axis: str, pair_cap: int, chunk: int,
                          w_pad: int, interpret: bool,
                          kernel: str = "roll", lane_D: int = 0,
                          ring: bool = False):
    from jax.sharding import PartitionSpec as P

    from pandelos_tpu.ops.lane_join import lane2_join_core, lane_join_core
    from pandelos_tpu.ops.pallas_join import join_pairs_core

    key = ("fj", mesh, axis, pair_cap, chunk, w_pad, interpret,
           kernel, lane_D, ring)
    fn = _PROGRAM_CACHE.get(key)
    if fn is not None:
        return fn

    def local(grow_l, cand_l, counts_l, all_pair, dg, col_lens, pad_gene,
              k2f):
        K = cand_l.shape[-1]
        gf = grow_l.reshape(-1)
        cf = cand_l.reshape(-1, K)
        nf = counts_l.reshape(-1)
        nf = jnp.where(nf > K, 0, nf)  # overflow rows: host rerun
        cs = jnp.cumsum(nf)
        total = cs[-1]
        p = jnp.arange(pair_cap, dtype=jnp.int32)
        # row of pair slot p: boundary scatter + running max — equivalent
        # to searchsorted(cs, p, side="right") for p < total (each nf>0
        # row i scatters its index at its exclusive base cs[i]-nf[i];
        # bases are distinct; the cummax fills the row's slot range),
        # without the bisection's serial gather rounds
        b = cs - nf
        row_ids = jnp.arange(gf.shape[0], dtype=jnp.int32)
        marks = jnp.zeros((pair_cap,), jnp.int32).at[
            jnp.where(nf > 0, b, pair_cap)
        ].max(row_ids, mode="drop")
        # cummax, NOT associative_scan(maximum): identical output and
        # runtime, but the generic scan's slice/concat recursion costs
        # ~230s of XLA compile at pair_cap=2M vs ~25s for the native
        # cumulative op (scripts/flatten_compile_probe.py, v5e)
        r = jax.lax.cummax(marks)
        r_safe = jnp.minimum(r, gf.shape[0] - 1)
        base = jnp.where(r_safe > 0, cs[jnp.maximum(r_safe - 1, 0)], 0)
        s = jnp.clip(p - base, 0, K - 1)
        ok = p < total
        pi = jnp.where(ok, gf[r_safe], pad_gene).astype(jnp.int32)
        pj = jnp.where(ok, cf[r_safe, s], pad_gene).astype(jnp.int32)
        if kernel == "lane2":
            # NO depth sort: the flat order is already depth-coherent —
            # rows are processed in profile-width order (the global perm)
            # and each row's candidates come out in ascending perm
            # position, so da ascends across the list and db ascends
            # within each row's run.  Measured on the m64 pair list
            # (v5e): 14.0M octet-steps flat vs 11.8M fully sorted
            # (+19% kernel ~ +5ms) against ~90ms for the two argsorts
            # plus five [pair_cap] permutation gathers the sort needed.
            # Padding pairs have dg == 0 and cost zero loop iterations.
            da = dg[pi]
            db = dg[pj]
            da_oct = jnp.max(da.reshape(-1, 8), axis=1)
            db_oct = jnp.max(db.reshape(-1, 8), axis=1)
            inter, perc, tr = lane2_join_core(
                all_pair, pi, pj, da_oct, db_oct,
                D=lane_D, chunk=chunk, interpret=interpret,
            )
        elif kernel == "lane":
            inter, perc, tr = lane_join_core(
                all_pair, pi, pj, D=lane_D, chunk=chunk,
                interpret=interpret,
            )
        else:
            inter, perc, tr = join_pairs_core(
                all_pair, pi, pj, w_pad=w_pad, chunk=chunk,
                interpret=interpret,
            )
        valid = (inter > 0) & (
            (k2f * perc >= col_lens[pi]) | (k2f * tr >= col_lens[pj])
        )
        return pi, pj, inter, perc, tr, valid

    if mesh.size == 1:
        fn = jax.jit(local)  # see _extract_program: no shard_map on 1 device
    else:
        if ring:
            # ring layout: extraction outputs carry a leading ring-step
            # axis; rows are sharded on the second axis
            row_specs = (
                P(None, axis, None),        # grow [steps, S*n, R]
                P(None, axis, None, None),  # cand
                P(None, axis, None),        # counts
            )
        else:
            row_specs = (
                P(axis, None),
                P(axis, None, None),
                P(axis, None),
            )
        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=row_specs + (
                    P(None, None),  # profile table
                    P(None),        # dg (per-gene lane depths)
                    P(None),        # col_lens
                    P(),
                    P(),
                ),
                out_specs=(P(axis),) * 6,
                check_vma=False,
            )
        )
    _PROGRAM_CACHE[key] = fn
    return fn


class MeshRunner:
    """One ``shard_map`` formulation of the candidate engine serving a
    single chip, N local chips, and N hosts (``jax.distributed``) — the
    TPU analogue of the reference's one-thread-per-genome pool
    (``Pangenes.java:54-64``).

    Row-block starts are sharded over the mesh's ``rows`` axis
    (round-robin over the width-sorted block list for load balance);
    profiles and signatures are replicated.  The flatten+join program
    turns each shard's (cand, counts) extraction output into a compact
    on-device pair list (cumsum + searchsorted — no host ``np.nonzero``,
    no [rows, K] fetch) and feeds it straight into the Pallas
    compare-and-rotate kernel, fusing the validity threshold into the
    output.  Only the final per-pair records cross the host link.
    """

    def __init__(self, index: KmerIndex, padded, sig_mass, config):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        G_pad = padded.ids.shape[0]
        self.index = index
        self.G = index.n_sequences
        self.k2 = 2 * index.k
        self.w_pad = padded.width
        self.G_pad = G_pad
        n_dev = max(1, _resolve_n_devices(config))
        if n_dev > len(jax.devices()):
            # jax.devices()[:n] silently truncates: the mesh would be
            # smaller than every S/shard computation assumes, producing
            # shape errors deep inside the programs
            raise ValueError(
                f"config requests n_devices={n_dev} but only "
                f"{len(jax.devices())} JAX device(s) exist "
                f"({jax.default_backend()}); on CPU set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N"
            )
        self.n_dev = n_dev
        self.axis = config.mesh_axis
        self.mesh = Mesh(np.asarray(jax.devices()[:n_dev]), (self.axis,))
        self._P = P
        self._NS = NamedSharding

        lens_pad = np.zeros(G_pad, dtype=np.float32)
        lens_pad[: self.G] = index.kseq_lengths
        width_pad = np.zeros(G_pad, dtype=np.int32)
        width_pad[: self.G] = np.diff(index.profile_ptr)

        # Profile upload: ids and counts ship as ONE packed int32 array
        # (id << 8 | count) when they fit — the remote-TPU uplink runs at
        # ~95MB/s, so halving the ~245MB for Mycoplasma-scale profiles
        # saves over a second of every cold start; unpacking is one
        # trivial on-device jit.  (The padding sentinel id == vocab_size
        # packs exactly like any other id.)
        packable = (
            index.vocab_size < (1 << 23)
            and padded.counts.size > 0
            and int(padded.counts.max(initial=0)) < 256
        )
        if packable:
            # pure int32 shift: ids < 2^23 so ids << 8 cannot overflow
            # (an int64 intermediate costs ~1.5s of extra host time at
            # Mycoplasma scale)
            packed = (padded.ids << np.int32(8)) | padded.counts.astype(
                np.int32
            )
            packed_d = self._replicate(packed)
            unpack = lambda p: (
                jax.lax.shift_right_logical(p, 8), p & 0xFF
            )
            if n_dev == 1:
                self.all_ids, self.all_counts = jax.jit(unpack)(packed_d)
            else:
                spec = NamedSharding(self.mesh, P(None, None))
                self.all_ids, self.all_counts = jax.jit(
                    unpack, out_shardings=(spec, spec)
                )(packed_d)
        else:
            self.all_ids = self._replicate(padded.ids)
            self.all_counts = self._replicate(padded.counts)
        # sig_mass may be None: the production paths build the runner
        # first so the device histogram can reuse all_ids/all_counts
        # (saves the ~244MB unpacked re-upload), then call set_sig().
        self.sig = None if sig_mass is None else self._replicate(sig_mass)
        self.col_lens = self._replicate(lens_pad)
        self.width = self._replicate(width_pad)
        self._all_pair = None
        self.packable = bool(packable)
        self.join_kernel = getattr(config, "join_kernel", "lane2")
        if self.join_kernel == "lane2" and not packable:
            # lane2 packs id << 8 | count into one int32 — needs
            # count < 256 and id < 2^23; otherwise the banded lane
            # kernel (separate id/count halves) is the exact fallback
            self.join_kernel = "lane"
        self._all_lane = None
        self._all_lane2 = None
        self._dg = None
        self.lane_D = 0

    # --- placement helpers ---------------------------------------------
    # Single-device: plain placement, no NamedSharding.  The remote-TPU
    # backend executes plain-jit programs fine but stalls on
    # mesh-sharding-committed executions (see _extract_program).
    def _replicate(self, arr):
        if self.n_dev == 1:
            return jax.device_put(arr, self.mesh.devices.flat[0])
        spec = self._P(*([None] * arr.ndim))
        return jax.device_put(arr, self._NS(self.mesh, spec))

    def _shard0(self, arr):
        if self.n_dev == 1:
            return jax.device_put(arr, self.mesh.devices.flat[0])
        spec = self._P(self.axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, self._NS(self.mesh, spec))

    def set_sig(self, sig_mass):
        """Attach the signature matrix after construction (see __init__:
        the histogram is built from this runner's own device profiles)."""
        if self.sig is None:
            self.sig = self._replicate(sig_mass)
        return self.sig

    def fetch(self, arr) -> np.ndarray:
        """Global sharded array -> host numpy (multi-process safe)."""
        if jax.process_count() == 1:
            return np.asarray(arr)
        spec = self._P(*([None] * arr.ndim))
        rep = jax.jit(
            lambda x: x, out_shardings=self._NS(self.mesh, spec)
        )(arr)
        return np.asarray(rep.addressable_data(0))

    def fetch_many(self, *arrs) -> list:
        """Batched fetch: start every device->host copy before blocking
        on any.  The remote-TPU tunnel costs ~25ms latency per
        synchronous transfer — N sequential fetches stack N latencies,
        an async batch pays one."""
        if jax.process_count() > 1:
            return [self.fetch(a) for a in arrs]
        for a in arrs:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        return [np.asarray(a) for a in arrs]

    @property
    def all_pair(self):
        """Replicated packed [G_pad, 2W] (ids || counts) for the join —
        concatenated ON device (never re-crosses the host link)."""
        if self._all_pair is None:
            cat = lambda a, b: jnp.concatenate([a, b], axis=1)
            if self.n_dev == 1:
                self._all_pair = jax.jit(cat)(self.all_ids, self.all_counts)
            else:
                spec = self._P(None, None)
                self._all_pair = jax.jit(
                    cat, out_shardings=self._NS(self.mesh, spec)
                )(self.all_ids, self.all_counts)
        return self._all_pair

    @property
    def all_lane(self):
        """Replicated lane-bucketed [G_pad, 2*D*128] profiles for the
        lane join kernel — built ON DEVICE from the already-resident
        padded profiles (the host pack + its 695MB upload cost ~19s of
        every fresh-index run at Mycoplasma-64 scale; only the scalar
        depth D crosses from host).  Memoized per runner."""
        if self._all_lane is None:
            from pandelos_tpu.ops.lane_join import (
                lane_depth,
                pack_lane_device,
                pack_lane_device_core,
            )

            D = lane_depth(self.index)
            self.lane_D = D
            if self.n_dev == 1:
                self._all_lane = pack_lane_device(
                    self.all_ids, self.all_counts, D
                )
            else:
                key = ("lanepack", self.mesh, D)
                fn = _PROGRAM_CACHE.get(key)
                if fn is None:
                    spec = self._NS(self.mesh, self._P(None, None))
                    fn = jax.jit(
                        lambda a, b, D=D: pack_lane_device_core(a, b, D),
                        out_shardings=spec,
                    )
                    _PROGRAM_CACHE[key] = fn
                self._all_lane = fn(self.all_ids, self.all_counts)
        return self._all_lane

    @property
    def all_lane2(self):
        """Replicated PACKED lane table [G_pad, D*128] (id << 8 | count,
        empty -256) for the lane2 kernel — device-built like all_lane."""
        if self._all_lane2 is None:
            from pandelos_tpu.ops.lane_join import (
                lane_depth,
                pack_lane_device,
                pack_lane_device_core,
            )

            D = lane_depth(self.index)
            self.lane_D = D
            if self.n_dev == 1:
                self._all_lane2 = pack_lane_device(
                    self.all_ids, self.all_counts, D, packed=True
                )
            else:
                key = ("lanepack2", self.mesh, D)
                fn = _PROGRAM_CACHE.get(key)
                if fn is None:
                    spec = self._NS(self.mesh, self._P(None, None))
                    fn = jax.jit(
                        lambda a, b, D=D: pack_lane_device_core(
                            a, b, D, packed=True
                        ),
                        out_shardings=spec,
                    )
                    _PROGRAM_CACHE[key] = fn
                self._all_lane2 = fn(self.all_ids, self.all_counts)
        return self._all_lane2

    @property
    def dg(self):
        """Replicated per-gene lane depths [G_pad] int32 (lane2 kernel
        loop bounds; padding genes 0 — zero loop iterations)."""
        if self._dg is None:
            from pandelos_tpu.ops.lane_join import lane_depths

            dg_pad = np.zeros(self.G_pad, np.int32)
            dg_pad[: self.G] = lane_depths(self.index)
            self._dg = self._replicate(dg_pad)
        return self._dg

    # --- extraction ------------------------------------------------------
    def _pad_starts(self, starts: np.ndarray, inert: int):
        """Round-robin global starts layout: original block t goes to
        position (t % n_dev) * S + (t // n_dev), so every shard gets an
        even mix of the width spectrum; padding is the inert start
        (an all-padding block that emits zero candidates).

        Single device needs no balance padding: the exact block list runs
        as-is (pow2 rounding would add up to ~2x inert full-cost blocks;
        program variants stay bounded because the block count is fixed
        per dataset)."""
        n = len(starts)
        if self.n_dev == 1:
            return np.asarray(starts, np.int32)
        S = _next_pow2(max(1, -(-n // self.n_dev)))
        sg = np.full(S * self.n_dev, inert, dtype=np.int32)
        t = np.arange(n)
        sg[(t % self.n_dev) * S + t // self.n_dev] = starts
        return sg

    def bound_bits(self, perm_ext, starts, row_block: int):
        """Memoized one-sided bound-bit matrix T (see
        _bound_bits_blocks) for this (perm, starts, row_block) layout —
        reused across candidate-cap retries and by both the cells and
        device-BBH paths."""
        n_pos_key = len(starts) * row_block
        key = (
            "T", row_block, len(starts),
            # perm fingerprint: the runner is per-index and its perm is
            # deterministic, but a caller passing a different permutation
            # of the same shape must not reuse a stale T
            hash(np.asarray(perm_ext[:n_pos_key], np.int32).tobytes()),
        )
        cache = getattr(self, "_T_cache", None)
        if cache is None:
            cache = {}
            self._T_cache = cache
        T = cache.get(key)
        if T is None:
            n_pos = len(starts) * row_block
            T = _bound_bits_blocks(
                self.sig,
                self.col_lens,
                self._replicate(np.asarray(perm_ext[:n_pos], np.int32)),
                self._replicate(np.asarray(starts, np.int32)),
                row_block=row_block,
                k2=self.k2,
                n_pos=n_pos,
            )
            cache[key] = T
        return T

    def use_bound_bits(self, starts_len: int, row_block: int) -> bool:
        """T-mode gate: single device, T fits the HBM model's slack.

        DELIBERATELY single-device (the multi-device mesh keeps the
        two-matmul bound pass, and the ring mode computes its bounds
        in-program per column shard): T's halving trick reads the
        SYMMETRIC closure ``T | T^T``, so a row-sharded T would need
        every shard to read its COLUMN slab of every other shard's rows
        — an [rows/n, rows] all-to-all per pass whose ICI bytes exceed
        the matmul FLOPs saved, and the int8 T itself grows as rows^2
        (the 4GB cap is already reached at ~3x Mycoplasma scale where
        multi-device matters).  The asymmetry is accounted in
        work_model (t_mode=False -> 2x bound_matmul_flops) and tested
        by the multi-device paths in tests/test_net_device.py and
        tests/test_multidevice_cells.py, which all run two-matmul."""
        return t_mode_enabled(
            self.n_dev, jax.process_count(), starts_len * row_block
        )

    def extract(
        self, perm_ext, starts, row_block, w_row, cand_cap,
        do_join=True, upper_only=False, from_T=False,
    ):
        """Run one extraction pass with starts sharded over the mesh.
        Returns the shard_map outputs as GLOBAL (device-resident) arrays
        with leading block axis [S * n_dev]; inert padded blocks emit
        rows with grow == G (filtered by every consumer).

        ``from_T`` (single-device): bounds come from the memoized
        bound-bit matrix instead of per-block matmuls — half the MXU
        work, and candidate-cap retries skip the matmuls entirely."""
        sg = self._pad_starts(np.asarray(starts, np.int32),
                              len(perm_ext) - row_block)
        fn = _extract_program(
            self.mesh, self.axis, row_block, w_row, cand_cap,
            self.G, self.k2, do_join, upper_only, from_T,
        )
        if from_T:
            T = self.bound_bits(perm_ext, starts, row_block)
            return fn(
                self.all_ids,
                self.all_counts,
                T,
                self.col_lens,
                self.width,
                self._replicate(np.asarray(perm_ext, np.int32)),
                self._shard0(sg),
            )
        return fn(
            self.all_ids,
            self.all_counts,
            self.sig,
            self.col_lens,
            self.width,
            self._replicate(np.asarray(perm_ext, np.int32)),
            self._shard0(sg),
        )

    def extract_fetched(self, *args, **kwargs):
        """extract() + fetch every output to host numpy."""
        return self.fetch_many(*self.extract(*args, **kwargs))

    def grow_layout(self, perm_ext, starts, row_block: int) -> np.ndarray:
        """Host-computed twin of extract()'s ``grow`` output: grow is a
        pure dynamic_slice of the (host-known) permutation at the
        (host-known) padded starts, so fetching it from the device costs
        a tunnel round trip for data the host already has."""
        sg = self._pad_starts(
            np.asarray(starts, np.int32), len(perm_ext) - row_block
        )
        pe = np.asarray(perm_ext)
        return np.stack([pe[s : s + row_block] for s in sg])

    # --- fused flatten + Pallas join + validity ---------------------------
    def flatten_join(
        self, grow, cand, counts, cand_cap: int, pair_cap: int, chunk: int,
        ring: bool = False,
    ):
        """Per shard: compact the (cand, counts) extraction output into a
        flat pair list (slot p -> row r by searchsorted over the cumsum of
        per-row candidate counts), join every pair with the Pallas kernel,
        and fuse the reference's validity threshold (library.cpp:499-500,
        exact integer form).  Overflowing rows (counts > cand_cap) emit
        nothing here — the host reruns them at a larger cap.

        Returns global [n_dev * pair_cap] arrays
        (pi, pj, inter, perc, tr, valid); padding slots carry pi == G.
        """
        interpret = jax.default_backend() == "cpu"
        if self.join_kernel == "lane2":
            profiles = self.all_lane2  # also sets lane_D
            fn = _flatten_join_program(
                self.mesh, self.axis, pair_cap, chunk, self.w_pad,
                interpret, kernel="lane2", lane_D=self.lane_D, ring=ring,
            )
        elif self.join_kernel == "lane":
            profiles = self.all_lane  # also sets lane_D
            fn = _flatten_join_program(
                self.mesh, self.axis, pair_cap, chunk, self.w_pad,
                interpret, kernel="lane", lane_D=self.lane_D, ring=ring,
            )
        else:
            profiles = self.all_pair
            fn = _flatten_join_program(
                self.mesh, self.axis, pair_cap, chunk, self.w_pad,
                interpret, ring=ring,
            )
        return fn(
            grow, cand, counts, profiles, self.dg, self.col_lens,
            jnp.int32(self.G), jnp.float32(self.k2),
        )

    def pair_capacity_from_worst(self, worst: int):
        """(pair_cap, chunk) from the max per-shard pair total — the
        single shared sizing rule (int32 guard, PT_JOIN_CHUNK override
        validation, interpret-mode chunk) for the replicated, ring and
        ring+BBH paths."""
        import os

        from pandelos_tpu.ops import lane_join, pallas_join

        _PAIR_BLOCK = pallas_join._PAIR_BLOCK
        full_chunk = (
            lane_join._CHUNK if self.join_kernel in ("lane", "lane2")
            else pallas_join._CHUNK
        )
        env_chunk = os.environ.get("PT_JOIN_CHUNK")
        if env_chunk:  # bench sweep override
            full_chunk = int(env_chunk)
            # zero/negative, non-power-of-two or non-multiple-of-block
            # chunks would make the join's n_chunks floor-divide
            # pair_cap, silently leaving trailing pairs un-joined
            if (
                full_chunk <= 0
                or full_chunk & (full_chunk - 1)
                or full_chunk % _PAIR_BLOCK
            ):
                raise ValueError(
                    f"PT_JOIN_CHUNK={full_chunk} must be a positive power "
                    f"of two and a multiple of {_PAIR_BLOCK}"
                )
        if worst >= 2**31:
            raise ValueError("pair list exceeds int32 indexing")
        interpret = jax.default_backend() == "cpu"
        full = full_chunk if not interpret else 256
        pair_cap = _next_pow2(max(worst, _PAIR_BLOCK))
        chunk = min(full, pair_cap)
        return pair_cap, chunk

    def pair_capacity(self, counts_h: np.ndarray, cand_cap: int):
        """(pair_cap, chunk) for flatten_join from the fetched per-row
        candidate counts [S * n_dev * R]: the max per-shard total, rounded
        to a power of two (bounded program variants), with the join chunk
        capped at the Pallas expansion budget."""
        nf = np.where(counts_h > cand_cap, 0, counts_h)
        per_shard = nf.reshape(self.n_dev, -1).sum(axis=1, dtype=np.int64)
        return self.pair_capacity_from_worst(int(per_shard.max(initial=0)))


def get_runner(index: KmerIndex, padded, sig_mass, config,
               tag: str = "") -> MeshRunner:
    """Cached MeshRunner for (padded shapes, device count).  ``tag``
    separates runners whose signature payload differs (the ring path
    passes a stub — its signatures live sharded inside the program)."""
    rkey = ("runner", padded.ids.shape, _resolve_n_devices(config), tag)
    cache = index._pad_cache  # populated by pad_profiles
    runner = cache.get(rkey)
    if runner is None:
        runner = MeshRunner(index, padded, sig_mass, config)
        cache[rkey] = runner
    return runner


def work_model(
    index: KmerIndex, config: Optional[PipelineConfig] = None
) -> dict:
    """Analytic device-work model for one full pallas-path scoring pass
    (VERDICT r2 next #8: 'is it actually fast for a TPU' needs a FLOP
    number, not lookups/s alone).

    - ``bound_matmul_flops``: the signature-bound matmuls, [R, B] x
      [B, G_pad] bf16 -> f32 on the MXU.  In bound-bits (T) mode —
      single device, T fits — the mask's symmetry means ONE matmul per
      row block (see _bound_bits_blocks); the legacy path pays two.
    - ``join_ops_per_pair``: VPU compare-and-accumulate lanes per candidate
      pair in the compare-and-rotate join — W^2 id compares plus the min /
      two masked adds per element (~4 vector ops each).  Multiply by the
      runtime pair count for the total.  (LEGACY field: kept only for
      cross-round trend comparability with the retired rotate kernel.)
    - ``join_lane2_ops_per_pair``: the production lane2 kernel's cost
      model — ~mean_depth^2 octet steps per pair, each one [8, 128]
      compare + min + 3 masked adds (~10 VPU lane-ops of 128 lanes per
      step, amortized over the octet's 8 pairs).
    """
    from pandelos_tpu.ops.lane_join import lane_depths
    from pandelos_tpu.ops.pallas_hist import pick_buckets

    config = config or PipelineConfig()
    G = index.n_sequences
    if G == 0:
        return {"bound_matmul_flops": 0, "join_ops_per_pair": 0}
    mean_depth = float(lane_depths(index).mean())
    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    W = max(128, _round_up(max(1, index.max_profile_len), 128))
    G_pad = _round_up(G + 1, max(row_block, col_block))
    B, _ = pick_buckets(
        index.vocab_size, max(1, index.max_profile_len), index.k,
        n_genes=G_pad,
    )
    n_blocks = -(-G // row_block)
    rows = n_blocks * row_block
    n_dev = max(1, _resolve_n_devices(config))
    t_mode = t_mode_enabled(n_dev, jax.process_count(), rows)
    return {
        # T-mode: ONE [R, B] x [B, rows] matmul per block; legacy: two
        # [R, B] x [B, G_pad]
        "bound_matmul_flops": float(
            2.0 * rows * B * rows if t_mode else 4.0 * rows * B * G_pad
        ),
        "bound_bits_mode": bool(t_mode),
        "join_ops_per_pair": float(4.0 * W * W),
        "join_lane2_ops_per_pair": 10.0 * 128.0 * mean_depth * mean_depth,
        "signature_buckets": int(B),
        "padded_width": int(W),
        "padded_genes": int(G_pad),
    }


def memory_model(
    index: KmerIndex, config: Optional[PipelineConfig] = None,
    hbm_budget_bytes: float = 14e9,
) -> dict:
    """Per-device HBM accounting for the replicated engine vs the ring
    mode (VERDICT r3 next #4): which arrays replicate, where the wall
    is, and whether the dataset fits.

    Replicated engine (ops/candidate.py): signatures [G_pad, B] bf16
    dominate; profiles (packed int32 upload + unpacked ids/counts) and
    the lane-join table follow.  Ring mode (ops/ring.py) shards the
    signatures (own-rows slice + one rotating column shard), leaving
    profile replication as the next, much higher wall.
    """
    from pandelos_tpu.ops.pallas_hist import pick_buckets

    config = config or PipelineConfig()
    G = index.n_sequences
    wm = work_model(index, config)
    if G == 0:
        return {"fits_replicated": True, "fits_ring": True, **wm}
    n_dev = max(1, _resolve_n_devices(config))
    G_pad = wm["padded_genes"]
    W = wm["padded_width"]
    B = wm["signature_buckets"]
    D_est = W // 128 + 10  # lane depth: W/128 mean + Poisson tail
    sig = 2 * G_pad * B          # bf16 mass (presence fused in-program)
    profiles = 3 * 4 * G_pad * W  # packed upload + unpacked ids/counts
    lane = 2 * 4 * G_pad * D_est * 128
    R = min(config.row_block, _round_up(G, 8))
    rows = -(-G // R) * R
    # symmetric bound-bit matrix (single-device T mode; capped by
    # use_bound_bits at 4GB — past that the extraction falls back to
    # the two-matmul pass and T costs nothing)
    t_bytes = (
        rows * rows
        if t_mode_enabled(n_dev, jax.process_count(), rows) else 0
    )
    workspace = 4 * 4 * R * G_pad + 6 * 4 * (1 << 21)  # masks + flat pairs
    # T is capped (4GB) and the sig cap is 6GB, so sig+T+rest <= 12GB by
    # construction — T never drives the engine out of budget, it just
    # reports; past its cap the extraction falls back, it can't OOM.
    replicated_total = sig + profiles + lane + workspace + t_bytes
    # ring mode: per-device candidate accumulator carries a step axis —
    # [n_dev, S, R, K] per shard = all global rows once (the device-BBH
    # composition consumes it directly, ops/net_device.py ring path)
    ring_cand = 4 * rows * config.candidate_cap
    ring_total = 2 * sig // n_dev + profiles + lane + workspace + ring_cand
    return {
        **wm,
        "n_devices": n_dev,
        "hbm_budget_bytes": hbm_budget_bytes,
        "sig_bytes": int(sig),
        "profile_bytes": int(profiles),
        "lane_table_bytes": int(lane),
        "bound_bits_bytes": int(t_bytes),
        "workspace_bytes": int(workspace),
        "ring_candidate_bytes": int(ring_cand),
        "replicated_bytes_per_device": int(replicated_total),
        "ring_bytes_per_device": int(ring_total),
        "fits_replicated": replicated_total <= hbm_budget_bytes,
        "fits_ring": ring_total <= hbm_budget_bytes,
    }


def check_hbm_fit(index: KmerIndex, config, ring=None) -> None:
    """Fail fast with an actionable message when the engine's per-device
    footprint exceeds the HBM model, instead of letting the backend OOM
    mid-run.  ``ring`` says which engine the CALLER will actually run
    (None: derive the device-BBH path's gate — ring_extract on a
    multi-device pallas mesh).  ``PANDELOS_IGNORE_HBM_MODEL=1``
    overrides (the model is analytic, not measured)."""
    import os

    if os.environ.get("PANDELOS_IGNORE_HBM_MODEL") == "1":
        return
    if jax.default_backend() == "cpu":
        return  # host RAM, not HBM
    mm = memory_model(index, config)
    ring_engaged = (
        ring
        if ring is not None
        else (
            getattr(config, "ring_extract", False)
            and mm["n_devices"] > 1
            and getattr(config, "backend", None) == "pallas"
        )
    )
    if ring_engaged:
        # the signature wall shards + rotates: judge against ring_bytes
        if mm["fits_ring"]:
            return
    elif mm["fits_replicated"]:
        return
    if ring_engaged:
        total = mm["ring_bytes_per_device"]
        mode = "ring engine"
        hint = (
            "the replicated engine would fit "
            f"(~{mm['replicated_bytes_per_device']/1e9:.1f}GB) — drop "
            "config.ring_extract"
            if mm["fits_replicated"]
            else "shard the input by genome subsets (cli reinput) or "
            "add devices"
        )
    else:
        total = mm["replicated_bytes_per_device"]
        mode = "replicated engine"
        hint = (
            "set config.ring_extract=True on a multi-device pallas mesh "
            "(signatures shard + rotate; composes with device_bbh; see "
            "ops/ring.py)"
            if mm["fits_ring"] and mm["n_devices"] > 1
            else "this dataset exceeds even the ring mode's per-device "
            "footprint (profiles replicate); shard the input by genome "
            "subsets (cli reinput) or add devices"
        )
    raise MemoryError(
        f"{mode} needs ~{total/1e9:.1f}GB"
        f"/device (budget {mm['hbm_budget_bytes']/1e9:.1f}GB): "
        f"sig {mm['sig_bytes']/1e9:.1f}GB + profiles "
        f"{mm['profile_bytes']/1e9:.1f}GB + lane "
        f"{mm['lane_table_bytes']/1e9:.1f}GB; {hint}; "
        f"PANDELOS_IGNORE_HBM_MODEL=1 overrides"
    )


def compute_cells_candidate(
    index: KmerIndex, config: Optional[PipelineConfig] = None
) -> ScoreCells:
    """Full-dataset VALID cells via the candidate engine.

    The exact stage runs either as the in-scan XLA equality join or,
    with ``config.backend == "pallas"``, as the compare-and-rotate
    Pallas kernel (ops/pallas_join.py) over all extracted candidates —
    fully on device (extraction, pair flattening, join and validity are
    one mesh program pair; only per-pair records cross the host link).

    Note: unlike the oracle, only cells passing the validity threshold
    are returned (plus any cell the bound could not exclude) — invalid
    cells never influence the network (finalize_scores drops them)."""
    from pandelos_tpu.ops.score import _width_buckets

    config = config or PipelineConfig()
    G = index.n_sequences
    if G == 0 or index.profile_ids.size == 0:
        z32 = np.zeros(0, dtype=np.int32)
        z64 = np.zeros(0, dtype=np.int64)
        return ScoreCells(z32, z32, z64, z64, z64)

    use_pallas = config.backend == "pallas"
    check_hbm_fit(index, config)
    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    padded = pad_profiles(index, row_block, col_block)
    G_pad = padded.ids.shape[0]
    K = config.candidate_cap

    # runner first: the signature histogram reuses its device profiles
    # (see compute_network_device)
    runner = get_runner(index, padded, None, config)
    sig_mass, _, _ = build_signatures(
        index, padded, config,
        ids_d=runner.all_ids, counts_d=runner.all_counts,
    )
    runner.set_sig(sig_mass)

    widths = np.diff(index.profile_ptr)

    r_out, c_out, i_out, p_out, t_out = [], [], [], [], []
    overflow_rows = []

    import os
    import time

    _trace = os.environ.get("PT_TIMING") == "1"
    _t0 = time.monotonic()

    if use_pallas:
        # One extraction program for the whole dataset: the Pallas join
        # derives its per-pair loop bounds from the data, so width
        # bucketing buys nothing here and would only multiply compiled
        # program variants (r1 cold start was ~109s of compiles).  The
        # width-sorted permutation is kept for gather locality.
        perm = np.argsort(widths, kind="stable").astype(np.int32)
        n_blocks = -(-G // row_block)
        perm_pad = np.full(n_blocks * row_block, G, dtype=np.int32)
        perm_pad[:G] = perm
        perm_ext = np.concatenate(
            [perm_pad, np.full(row_block, G, dtype=np.int32)]
        )
        starts = np.arange(0, n_blocks * row_block, row_block, np.int32)
        grow_d, cand_d, counts_d = runner.extract(
            perm_ext, starts, row_block, padded.width, K,
            do_join=False, upper_only=True,
            from_T=runner.use_bound_bits(len(starts), row_block),
        )
        counts_h = runner.fetch(counts_d).reshape(-1)
        grow_h = runner.grow_layout(perm_ext, starts, row_block).reshape(-1)
        over = (counts_h > K) & (grow_h < G)
        overflow_rows.extend(
            zip(grow_h[over].tolist(), counts_h[over].tolist())
        )
        pair_cap, chunk = runner.pair_capacity(counts_h, K)
        if _trace:
            print(
                f"[pt] extract: {time.monotonic()-_t0:.2f}s "
                f"pairs<={pair_cap}x{runner.n_dev}", flush=True,
            )
            _t0 = time.monotonic()
        pi_d, pj_d, inter_d, perc_d, tr_d, valid_d = runner.flatten_join(
            grow_d, cand_d, counts_d, K, pair_cap, chunk
        )
        pi, pj, vmask, inter, perc, tr = runner.fetch_many(
            pi_d, pj_d, valid_d, inter_d, perc_d, tr_d
        )
        keep = pi < G
        pi = pi[keep]
        pj = pj[keep]
        vmask = vmask[keep]
        inter = inter[keep]
        perc = perc[keep]
        tr = tr[keep]
        if _trace:
            print(
                f"[pt] flatten+join+fetch: {time.monotonic()-_t0:.2f}s "
                f"pairs={len(pi)}", flush=True,
            )
            _t0 = time.monotonic()

        # mirror the upper-triangle cells (perc/tr exchange: the validity
        # threshold is direction-symmetric, library.cpp:499-500)
        vi = pi[vmask].astype(np.int32)
        vj = pj[vmask].astype(np.int32)
        vinter = inter[vmask].astype(np.int64)
        vperc = perc[vmask].astype(np.int64)
        vtr = tr[vmask].astype(np.int64)
        r_out.append(np.concatenate([vi, vj]))
        c_out.append(np.concatenate([vj, vi]))
        i_out.append(np.concatenate([vinter, vinter]))
        p_out.append(np.concatenate([vperc, vtr]))
        t_out.append(np.concatenate([vtr, vperc]))
    else:
        for w_row, perm_pad, starts in _width_buckets(
            widths, row_block, padded.width
        ):
            perm_ext = np.concatenate(
                [perm_pad, np.full(row_block, G, dtype=np.int32)]
            )
            grow, cand, inter, perc, tr, valid, counts = (
                runner.extract_fetched(
                    perm_ext, starts, row_block, w_row, K,
                    do_join=True, upper_only=False,
                )
            )
            grow = grow.reshape(-1)  # [n_blocks * R]
            counts = counts.reshape(-1)
            cand = cand.reshape(-1, K)

            over = (counts > K) & (grow < G)
            overflow_rows.extend(
                zip(grow[over].tolist(), counts[over].tolist())
            )
            ok = ~over

            valid = valid.reshape(-1, K)
            inter = inter.reshape(-1, K)
            perc = perc.reshape(-1, K)
            tr = tr.reshape(-1, K)

            vmask = valid & ok[:, None]
            rr = np.broadcast_to(grow[:, None], cand.shape)[vmask]
            r_out.append(rr.astype(np.int32))
            c_out.append(cand[vmask].astype(np.int32))
            i_out.append(inter[vmask].astype(np.int64))
            p_out.append(perc[vmask].astype(np.int64))
            t_out.append(tr[vmask].astype(np.int64))

    if overflow_rows:
        by_row = {}
        for r, c in overflow_rows:
            by_row[int(r)] = max(by_row.get(int(r), 0), int(c))
        rows = sorted(by_row)
        K2 = _round_up(max(by_row.values()), 128)
        if K2 <= 4096:
            # device retry: rerun just the overflowing rows with a larger
            # candidate cap (their exact candidate counts are known)
            perm2 = np.asarray(rows, dtype=np.int32)
            pad = (-len(perm2)) % row_block
            perm2 = np.concatenate(
                [perm2, np.full(pad + row_block, G, dtype=np.int32)]
            )
            starts2 = np.arange(
                0, len(perm2) - row_block, row_block, dtype=np.int32
            )
            grow, cand, inter, perc, tr, valid, counts = (
                runner.extract_fetched(
                    perm2, starts2, row_block, padded.width, K2,
                    do_join=True, upper_only=use_pallas,
                )
            )
            grow = grow.reshape(-1)
            valid = valid.reshape(-1, K2)
            cand = cand.reshape(-1, K2)
            inter = inter.reshape(-1, K2)
            perc = perc.reshape(-1, K2)
            tr = tr.reshape(-1, K2)
            rr = np.broadcast_to(grow[:, None], cand.shape)[valid]
            vi = rr.astype(np.int32)
            vj = cand[valid].astype(np.int32)
            vinter = inter[valid].astype(np.int64)
            vperc = perc[valid].astype(np.int64)
            vtr = tr[valid].astype(np.int64)
            if use_pallas:  # mirror the upper-only cells
                r_out.append(np.concatenate([vi, vj]))
                c_out.append(np.concatenate([vj, vi]))
                i_out.append(np.concatenate([vinter, vinter]))
                p_out.append(np.concatenate([vperc, vtr]))
                t_out.append(np.concatenate([vtr, vperc]))
            else:
                r_out.append(vi)
                c_out.append(vj)
                i_out.append(vinter)
                p_out.append(vperc)
                t_out.append(vtr)
        else:
            # pathological rows: exact host posting walk (returns ALL
            # cells incl. invalid; finalize drops invalid identically)
            fb = _host_fallback_rows(index, rows)
            if use_pallas:
                # upper-triangle discipline: keep col > row and mirror,
                # so partner rows' mirrored cells are not duplicated
                keep = fb.col > fb.row
                r_out.append(np.concatenate([fb.row[keep], fb.col[keep]]))
                c_out.append(np.concatenate([fb.col[keep], fb.row[keep]]))
                i_out.append(
                    np.concatenate(
                        [fb.intersection[keep], fb.intersection[keep]]
                    )
                )
                p_out.append(
                    np.concatenate([fb.perc_cnt[keep], fb.tr_perc_cnt[keep]])
                )
                t_out.append(
                    np.concatenate([fb.tr_perc_cnt[keep], fb.perc_cnt[keep]])
                )
            else:
                r_out.append(fb.row)
                c_out.append(fb.col)
                i_out.append(fb.intersection)
                p_out.append(fb.perc_cnt)
                t_out.append(fb.tr_perc_cnt)

    return ScoreCells(
        np.concatenate(r_out),
        np.concatenate(c_out),
        np.concatenate(i_out),
        np.concatenate(p_out),
        np.concatenate(t_out),
    )

