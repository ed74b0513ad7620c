"""Pallas TPU kernel: exact per-pair profile join (compare-and-rotate).

The candidate engine's exact stage computes, for each (row gene A,
candidate gene B) pair, the integer counters of the reference's scoring
kernel (``library.cpp:475-477``)::

    inter = sum over shared k-mers of min(cA, cB)
    perc  = sum over shared k-mers of cA
    tr    = sum over shared k-mers of cB

by joining the two sorted (id, count) profiles.  The XLA formulation
(broadcast equality ``a[:, :, None] == b[:, None, :]``) reaches only a
few percent of VPU peak: every a-id must be splatted across the lane
axis (a sublane->lane broadcast) before it can be compared.  This kernel
batches 8 pairs in sublanes and ROTATES the b-tile across lanes: 128
rotation steps of clean [8, 128] vector ops (roll / compare / min /
select-accumulate) cover every lane alignment with no splats.

Design (v2 — after a manual-DMA gather design fought Mosaic's tiling
rules at every step):

- the candidate structure is symmetric (the signature bound, the self
  mask and the validity test are all direction-symmetric), so each
  unordered pair is computed ONCE in canonical (lo, hi) orientation and
  mirrored on host (``perc(i,j) == tr(j,i)``) — half the join work;
- pair profiles are EXPANDED on device with XLA row-gathers (fast on
  TPU) in chunks, so the kernel reads perfectly aligned, automatically
  pipelined (PAIR_BLOCK, 2W) VMEM blocks — no manual DMA, no scalar
  prefetch;
- join loop bounds are derived from the data inside the kernel (lane
  position of the last nonzero count per octet), so padded tiles are
  skipped without any width side-tables;
- per-octet totals are lane-reduced via a tile transpose and placed at
  static lane offsets (partial-lane dynamic stores do not lower).

Counters are exact: counts are integers < 2^24 accumulated in f32.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_OCT = 8
_PAIR_BLOCK = 128  # pairs per grid step
_CHUNK = 1 << 16  # pairs per gather chunk (2 x ~512MB expanded at W=1024)


def _make_kernel(w_pad: int, interpret: bool = False, banded=None):
    """``interpret`` swaps the 128-step statically-unrolled roll loop
    (needed for Mosaic latency on real TPU — see the module docstring)
    for a ``fori_loop`` with a dynamic ``jnp.roll``: the same exact
    integer accumulation (all values < 2^24 in f32, so the changed add
    order is value-identical), but a ~100x smaller graph — interpret-mode
    XLA-CPU compiles in seconds instead of ~50s per shape variant.

    ``banded`` selects the sorted-band tile windowing (default: on for
    real TPU, off in interpret mode); tests force ``banded=True`` with
    ``interpret=True`` to exercise the windowing logic on CPU with the
    cheap dynamic-roll inner loop."""
    W = w_pad
    n_oct = _PAIR_BLOCK // _OCT
    if banded is None:
        banded = not interpret

    MAXT = W // _LANE
    BIG = 0x7FFFFFFF  # plain int: a jnp scalar here would be a captured
    # constant, which pallas_call rejects

    def kernel(a_blk, b_blk, inter_ref, perc_ref, tr_ref):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_OCT, W), 1)

        # transpose [8, 128] -> [128, 8]; reduce positions (now sublanes)
        # to a [1, 8] lane vector; place at the octet's static lane offset
        def _place(acc, row_acc, o):
            sums = jnp.sum(
                jnp.swapaxes(acc, 0, 1), axis=0, keepdims=True
            )  # [1, 8]
            wide = jnp.concatenate(
                [
                    sums,
                    jnp.zeros((1, _PAIR_BLOCK - _OCT), jnp.float32),
                ],
                axis=1,
            )
            return row_acc + pltpu.roll(wide, o * _OCT, 1)

        inter_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        perc_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        tr_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)

        for o in range(n_oct):
            sl = slice(o * _OCT, (o + 1) * _OCT)

            acc0 = jnp.zeros((_OCT, _LANE), jnp.float32)

            if not banded:
                a_cnt_full = a_blk[sl, W:].astype(jnp.float32)  # [8, W]
                b_cnt_full = b_blk[sl, W:].astype(jnp.float32)

                # join bounds from the data: last nonzero-count position
                wa = jnp.max(jnp.where(a_cnt_full > 0, lane_iota, -1)) + 1
                wb = jnp.max(jnp.where(b_cnt_full > 0, lane_iota, -1)) + 1
                na = pl.cdiv(wa, _LANE)
                nb = pl.cdiv(wb, _LANE)

                def b_tile_body(bi, accs, sl=sl):
                    b_ids = b_blk[sl, pl.ds(bi * _LANE, _LANE)]
                    b_cnt = b_blk[sl, pl.ds(W + bi * _LANE, _LANE)].astype(
                        jnp.float32
                    )

                    def a_tile_body(ai, accs):
                        inter_a, perc_a, tr_a = accs
                        a_ids = a_blk[sl, pl.ds(ai * _LANE, _LANE)]
                        a_cnt = a_blk[
                            sl, pl.ds(W + ai * _LANE, _LANE)
                        ].astype(jnp.float32)

                        def roll_step(s, acc):
                            i_a, p_a, t_a = acc
                            rb_ids = jnp.roll(b_ids, s, axis=1)
                            rb_cnt = jnp.roll(b_cnt, s, axis=1)
                            eq = a_ids == rb_ids
                            return (
                                i_a + jnp.where(
                                    eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                                ),
                                p_a + jnp.where(eq, a_cnt, 0.0),
                                t_a + jnp.where(eq, rb_cnt, 0.0),
                            )

                        return jax.lax.fori_loop(
                            0, _LANE, roll_step, (inter_a, perc_a, tr_a)
                        )

                    return jax.lax.fori_loop(
                        0, na, a_tile_body, accs, unroll=False
                    )

                inter_acc, perc_acc, tr_acc = jax.lax.fori_loop(
                    0, nb, b_tile_body, (acc0, acc0, acc0), unroll=False
                )
                inter_row = _place(inter_acc, inter_row, o)
                perc_row = _place(perc_acc, perc_row, o)
                tr_row = _place(tr_acc, tr_row, o)
                continue

            # --- banded sorted join (TPU path).  Profiles are sorted by
            # id and left-packed, so tile id-ranges ascend along the
            # width axis; for each a-tile only the CONTIGUOUS window of
            # b-tiles whose id range overlaps it can produce equalities.
            # The all-pairs na x nb tile loop becomes ~max(na, nb) tile
            # visits — the asymptotic gap between an all-pairs join and a
            # merge of two sorted lists, recovered at tile granularity.
            #
            # Range tables per octet (static MAXT unroll): invalid
            # (all-padding) tiles get [BIG, BIG), which (a) never count
            # as "entirely below" an a-range for the window start and
            # (b) never extend the window end — trailing padded tiles
            # fall out of every window, replacing the old wa/wb bounds.
            bmin_t = []
            bmax_t = []
            for t in range(MAXT):
                ids_t = b_blk[sl, t * _LANE : (t + 1) * _LANE]
                cnt_t = b_blk[sl, W + t * _LANE : W + (t + 1) * _LANE]
                v = cnt_t > 0
                anyv = jnp.any(v)
                bmin_t.append(
                    jnp.where(anyv, jnp.min(jnp.where(v, ids_t, BIG)), BIG)
                )
                bmax_t.append(
                    jnp.where(anyv, jnp.max(jnp.where(v, ids_t, -1)), BIG)
                )

            accs = (acc0, acc0, acc0)
            for ai in range(MAXT):
                a_ids = a_blk[sl, ai * _LANE : (ai + 1) * _LANE]
                a_cnt_i = a_blk[sl, W + ai * _LANE : W + (ai + 1) * _LANE]
                va = a_cnt_i > 0
                anya = jnp.any(va)
                amin = jnp.where(
                    anya, jnp.min(jnp.where(va, a_ids, BIG)), BIG
                )
                amax = jnp.where(
                    anya, jnp.max(jnp.where(va, a_ids, -1)), jnp.int32(-1)
                )
                # window = [first overlapping tile, last overlapping + 1].
                # Per-ROW tile ranges ascend, but the octet's 8 rows mix,
                # so the octet-level ranges need not be monotonic —
                # min/max over explicit overlap tests is robust (the
                # window may include non-overlapping middles: wasted
                # work, never wrong answers).
                bstart = jnp.int32(MAXT)
                bend = jnp.int32(0)
                for t in range(MAXT):
                    ov = (bmax_t[t] >= amin) & (bmin_t[t] <= amax)
                    bstart = jnp.minimum(
                        bstart, jnp.where(ov, t, MAXT)
                    )
                    bend = jnp.maximum(bend, jnp.where(ov, t + 1, 0))
                a_cnt = a_cnt_i.astype(jnp.float32)

                def b_body(bi, accs, sl=sl, a_ids=a_ids, a_cnt=a_cnt):
                    inter_a, perc_a, tr_a = accs
                    b_ids = b_blk[sl, pl.ds(bi * _LANE, _LANE)]
                    b_cnt = b_blk[sl, pl.ds(W + bi * _LANE, _LANE)].astype(
                        jnp.float32
                    )
                    if interpret:  # banded test mode: cheap dynamic rolls
                        def roll_step(s, acc):
                            i_a, p_a, t_a = acc
                            rb_ids = jnp.roll(b_ids, s, axis=1)
                            rb_cnt = jnp.roll(b_cnt, s, axis=1)
                            eq = a_ids == rb_ids
                            return (
                                i_a + jnp.where(
                                    eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                                ),
                                p_a + jnp.where(eq, a_cnt, 0.0),
                                t_a + jnp.where(eq, rb_cnt, 0.0),
                            )

                        return jax.lax.fori_loop(
                            0, _LANE, roll_step, (inter_a, perc_a, tr_a)
                        )
                    # static independent rolls from the base tile with a
                    # 4-way interleaved accumulator per counter.  An
                    # incremental roll-by-1 chain (roll(prev, 1)) is
                    # latency-bound: 128 serial cross-lane ops measured
                    # 7.4x slower than this form.
                    n_acc = 4
                    i_acc = [inter_a] + [
                        jnp.zeros_like(inter_a) for _ in range(n_acc - 1)
                    ]
                    p_acc = [perc_a] + [
                        jnp.zeros_like(perc_a) for _ in range(n_acc - 1)
                    ]
                    t_acc = [tr_a] + [
                        jnp.zeros_like(tr_a) for _ in range(n_acc - 1)
                    ]
                    for s in range(_LANE):
                        rb_ids = pltpu.roll(b_ids, s, 1)
                        rb_cnt = pltpu.roll(b_cnt, s, 1)
                        eq = a_ids == rb_ids
                        w = s % n_acc
                        i_acc[w] = i_acc[w] + jnp.where(
                            eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                        )
                        p_acc[w] = p_acc[w] + jnp.where(eq, a_cnt, 0.0)
                        t_acc[w] = t_acc[w] + jnp.where(eq, rb_cnt, 0.0)
                    return (
                        sum(i_acc[1:], i_acc[0]),
                        sum(p_acc[1:], p_acc[0]),
                        sum(t_acc[1:], t_acc[0]),
                    )

                accs = jax.lax.fori_loop(
                    bstart, bend, b_body, accs, unroll=False
                )
            inter_acc, perc_acc, tr_acc = accs

            inter_row = _place(inter_acc, inter_row, o)
            perc_row = _place(perc_acc, perc_row, o)
            tr_row = _place(tr_acc, tr_row, o)

        inter_ref[...] = inter_row
        perc_ref[...] = perc_row
        tr_ref[...] = tr_row

    return kernel


def join_pairs_core(
    all_pair,  # int32 [G_pad, 2W] packed profiles (ids || counts)
    a_idx,  # int32 [P] (P a multiple of `chunk`)
    b_idx,  # int32 [P]
    w_pad: int,
    chunk: int,
    interpret: bool = False,
    banded=None,
):
    """Exact counters per pair: (inter, perc, tr) f32 [P] with perc
    relative to the a-side.  Expands profile rows chunk-by-chunk with
    XLA gathers and runs the Pallas join on each chunk.

    Unjitted traceable core — callable from inside ``shard_map`` (the
    mesh engine's fused flatten+join program) as well as via the jitted
    :func:`_join_pairs_device` wrapper."""
    P = a_idx.shape[0]
    n_chunks = P // chunk
    kernel = _make_kernel(w_pad, interpret, banded)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(chunk // _PAIR_BLOCK,),
        in_specs=[
            pl.BlockSpec((_PAIR_BLOCK, 2 * w_pad), lambda p: (p, 0)),
            pl.BlockSpec((_PAIR_BLOCK, 2 * w_pad), lambda p: (p, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p: (0, p)),
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p: (0, p)),
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p: (0, p)),
        ],
    )

    def run_chunk(a_exp, b_exp):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, chunk), jnp.float32)
                for _ in range(3)
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(a_exp, b_exp)

    def body(ci, outs):
        ai = jax.lax.dynamic_slice(a_idx, (ci * chunk,), (chunk,))
        bi = jax.lax.dynamic_slice(b_idx, (ci * chunk,), (chunk,))
        a_exp = jnp.take(all_pair, ai, axis=0)
        b_exp = jnp.take(all_pair, bi, axis=0)
        inter_c, perc_c, tr_c = run_chunk(a_exp, b_exp)
        return tuple(
            jax.lax.dynamic_update_slice(o, v.reshape(-1), (ci * chunk,))
            for o, v in zip(outs, (inter_c, perc_c, tr_c))
        )

    z = jnp.zeros((P,), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, (z, z, z))


@functools.partial(
    jax.jit, static_argnames=("w_pad", "chunk", "interpret")
)
def _join_pairs_device(all_pair, a_idx, b_idx, w_pad, chunk, interpret=False):
    return join_pairs_core(
        all_pair, a_idx, b_idx, w_pad=w_pad, chunk=chunk, interpret=interpret
    )


def join_pairs(
    all_pair,  # device int32 [G_pad, 2W] (or list of per-device replicas)
    i,  # numpy int [P_in] a-side gene per pair
    j,  # numpy int [P_in] b-side gene per pair
    widths,  # numpy int [>= n_true] true profile width per gene
    w_pad: int,
    pad_gene: int,
    interpret: bool = False,
    assume_unique: bool = False,
):
    """Exact counters (inter, perc, tr) f32 numpy [P_in], perc w.r.t. i.

    With ``assume_unique`` (upper-triangle extraction: every pair occurs
    once, already canonically oriented) the dedup/mirror machinery is
    skipped entirely — the caller mirrors results itself.

    Each unordered pair is joined once (canonical lo<hi orientation) on
    device and mirrored to all duplicate/reversed occurrences on host
    (``perc(i,j) == tr(j,i)``).  Unique pairs are grouped for octet
    packing without breaking gather locality.

    When ``all_pair`` is a list of per-device replicas, the unique-pair
    list is split into contiguous shards joined concurrently — the same
    embarrassingly-parallel axis as the reference's genome thread pool
    (Pangenes.java:54-64) and BlockRunner's extraction sharding."""
    import os
    import time

    _trace = os.environ.get("PT_TIMING") == "1"
    _t0 = time.monotonic()

    reps = all_pair if isinstance(all_pair, (list, tuple)) else [all_pair]
    all_pair = reps[0]

    P_in = len(i)
    if P_in == 0:
        z = np.zeros(0, np.float32)
        return z, z, z
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)

    if assume_unique:
        rep_lo = np.ascontiguousarray(i, dtype=np.int32)
        rep_hi = np.ascontiguousarray(j, dtype=np.int32)
        order = None
    else:
        lo = np.minimum(i, j)
        hi = np.maximum(i, j)
        g1 = np.int64(all_pair.shape[0] + 1)
        canon = lo * g1 + hi
        uniq, inv = np.unique(canon, return_inverse=True)
        rep_lo = (uniq // g1).astype(np.int32)
        rep_hi = (uniq % g1).astype(np.int32)

        # octet packing vs gather locality: canonical (lo-major) order
        # keeps long runs of the same a-row (fast gathers — a full width
        # sort measured ~1.5x SLOWER end-to-end from random-row gathers
        # alone); sorting by the b-side TILE class only within each
        # lo-run equalizes the octet's dominant cost without breaking
        # a-row locality.
        wpad_tbl = np.zeros(int(all_pair.shape[0]) + 1, np.int64)
        wpad_tbl[: len(widths)] = widths
        nb_class = (wpad_tbl[rep_hi] + _LANE - 1) // _LANE
        order = np.lexsort((nb_class, rep_lo)).astype(np.int64)
        rep_lo = rep_lo[order]
        rep_hi = rep_hi[order]

    P = len(rep_lo)
    # chunk sized to the workload: small datasets should not pay the
    # full 64k-pair expansion buffers
    full = _CHUNK if not interpret else 256
    chunk = min(full, max(_PAIR_BLOCK, -(-P // _PAIR_BLOCK) * _PAIR_BLOCK))
    P_pad = max(chunk, -(-P // chunk) * chunk)
    if P_pad != P:
        fill = np.full(P_pad - P, pad_gene, dtype=np.int32)
        rep_lo = np.concatenate([rep_lo, fill])
        rep_hi = np.concatenate([rep_hi, fill])

    if _trace:
        print(f"[pt]   dedup+sort: {time.monotonic()-_t0:.2f}s "
              f"uniq={P}", flush=True)
        _t0 = time.monotonic()

    import jax as _jax

    if len(reps) <= 1:
        u_inter, u_perc, u_tr = _join_pairs_device(
            all_pair,
            jnp.asarray(rep_lo),
            jnp.asarray(rep_hi),
            w_pad=w_pad,
            chunk=chunk,
            interpret=interpret,
        )
        u_inter = np.asarray(u_inter)
        u_perc = np.asarray(u_perc)
        u_tr = np.asarray(u_tr)
    else:
        # contiguous shards per device, dispatched asynchronously
        n_dev = len(reps)
        devs = _jax.devices()[:n_dev]
        per = -(-len(rep_lo) // (n_dev * chunk)) * chunk
        pending = []
        for d in range(n_dev):
            s, e = d * per, min(len(rep_lo), (d + 1) * per)
            if e <= s:
                break
            sl = rep_lo[s:e]
            sh = rep_hi[s:e]
            if len(sl) % chunk:
                fillp = chunk - (len(sl) % chunk)
                sl = np.concatenate(
                    [sl, np.full(fillp, pad_gene, np.int32)]
                )
                sh = np.concatenate(
                    [sh, np.full(fillp, pad_gene, np.int32)]
                )
            pending.append(
                (
                    e - s,
                    _join_pairs_device(
                        reps[d],
                        _jax.device_put(sl, devs[d]),
                        _jax.device_put(sh, devs[d]),
                        w_pad=w_pad,
                        chunk=chunk,
                        interpret=interpret,
                    ),
                )
            )
        parts = [
            tuple(np.asarray(o)[:nreal] for o in outs)
            for nreal, outs in pending
        ]
        u_inter = np.concatenate([p[0] for p in parts])
        u_perc = np.concatenate([p[1] for p in parts])
        u_tr = np.concatenate([p[2] for p in parts])

    if _trace:
        print(f"[pt]   device join: {time.monotonic()-_t0:.2f}s",
              flush=True)
        _t0 = time.monotonic()
    if order is None:  # assume_unique: results already in input order
        p_inter = np.asarray(u_inter)[:P]
        p_perc = np.asarray(u_perc)[:P]
        p_tr = np.asarray(u_tr)[:P]
    else:
        # un-sort back to uniq order
        unsort = np.empty(P, np.int64)
        unsort[order] = np.arange(P, dtype=np.int64)
        u_inter = np.asarray(u_inter)[:P][unsort]
        u_perc = np.asarray(u_perc)[:P][unsort]
        u_tr = np.asarray(u_tr)[:P][unsort]

        swap = i > j  # pair was stored (hi, lo): perc/tr exchange
        p_inter = u_inter[inv]
        p_perc = np.where(swap, u_tr[inv], u_perc[inv])
        p_tr = np.where(swap, u_perc[inv], u_tr[inv])
    if _trace:
        print(f"[pt]   fetch+mirror: {time.monotonic()-_t0:.2f}s",
              flush=True)
    return (
        p_inter.astype(np.float32),
        p_perc.astype(np.float32),
        p_tr.astype(np.float32),
    )


def pack_profiles(padded_ids, padded_counts):
    """[G_pad, W] ids + counts -> [G_pad, 2W] packed int32 (ids||counts)."""
    return np.concatenate(
        [padded_ids, padded_counts], axis=1
    ).astype(np.int32)
