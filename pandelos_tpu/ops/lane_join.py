"""Pallas TPU kernel: lane-bucketed exact profile join.

Second-generation exact join for the candidate engine (the first is the
compare-and-rotate kernel, ops/pallas_join.py).  Both compute, for each
(gene A, gene B) candidate pair, the integer counters of the reference's
scoring kernel (``library.cpp:475-477``)::

    inter = sum over shared k-mers of min(cA, cB)
    perc  = sum over shared k-mers of cA
    tr    = sum over shared k-mers of cB

The rotate kernel must try all 128 lane alignments per tile pair because
a shared k-mer id can sit in any lane of either profile.  This kernel
removes the alignment search entirely: profiles are re-packed on host so
that k-mer id ``v`` ALWAYS lives in lane ``v & 127`` (ids are dense ranks
of the occurring k-mers, so the low bits are uniform).  Equal ids are
then lane-aligned by construction and one ``[8, 128]`` vector compare
replaces 128 rotation steps.

Layout: per gene, a [D, 128] grid — lane = id & 127, depth = number of
earlier profile entries in the same lane (ids ascend within a lane
because profiles are id-sorted).  D is the max lane depth over all genes
(~W/128 plus Poisson slack).  Ids and counts concatenate to one
[G_pad, 2*D*128] int32 row per gene; padding slots carry id -1 and
count 0 (-1 matches only padding; count 0 contributes nothing — the
same neutral-element argument as the rotate kernel's sentinel).

The depth x depth slot loop is banded exactly like the rotate kernel's
tile loop: within a lane ids ascend with depth, so slot-row id ranges
ascend and only a contiguous window of B-slots can overlap a given
A-slot.  Net effect: ~max(Da, Db) slot visits of ONE compare each,
versus the rotate kernel's ~max(na, nb) tile visits of 128 rolls each —
a ~100x cut in inner-loop vector ops at equal candidate count.

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
# pairs per gather chunk.  Small chunks pipeline the XLA row-gather with
# the kernel's block stream far better than big ones: the m64 sweep
# (scripts/lane2_micro.py, v5e) measured 507ms at 32768, 405ms at 8192,
# 357ms at 4096 and flat below that, for identical results.
_CHUNK = 1 << 12


def pack_lane_profiles(index, G_pad: int):
    """[G_pad, 2*D*128] int32 lane-bucketed profiles (ids || counts).

    Returns (packed, D).  Memoized on the index (one radix argsort over
    all profile entries; ~0.5s at Mycoplasma-64 scale)."""
    cache = getattr(index, "_pad_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(index, "_pad_cache", cache)
    ckey = ("lane", G_pad)
    if ckey in cache:
        return cache[ckey]

    ids = np.asarray(index.profile_ids, dtype=np.int64)
    counts = np.asarray(index.profile_counts)
    widths = np.diff(index.profile_ptr)
    G = index.n_sequences
    if ids.size == 0:
        out = (np.full((G_pad, 2 * _LANE), -1, np.int32), 1)
        out[0][:, _LANE:] = 0
        cache[ckey] = out
        return out

    g_of = np.repeat(np.arange(G, dtype=np.int64), widths)
    lanes = (ids & (_LANE - 1)).astype(np.int32)
    # depth = occurrence rank of (gene, lane); profiles are id-sorted so
    # a stable sort of the int keys (radix for int32) keeps ids ascending
    # within each (gene, lane) group -> depth ascends with id.
    assert G * _LANE < 2**31
    keys = (g_of * _LANE).astype(np.int32) + lanes
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    new_grp = np.empty(sk.shape, dtype=bool)
    new_grp[0] = True
    np.not_equal(sk[1:], sk[:-1], out=new_grp[1:])
    starts = np.flatnonzero(new_grp)
    grp_len = np.diff(np.append(starts, sk.size))
    depth_sorted = np.arange(sk.size, dtype=np.int64) - np.repeat(
        starts, grp_len
    )
    depth = np.empty_like(depth_sorted)
    depth[order] = depth_sorted

    D = int(depth.max()) + 1
    lane_ids = np.full((G_pad, D * _LANE), -1, dtype=np.int32)
    lane_cnt = np.zeros((G_pad, D * _LANE), dtype=np.int32)
    col = depth * _LANE + lanes
    lane_ids[g_of, col] = ids.astype(np.int32)
    lane_cnt[g_of, col] = counts.astype(np.int32)
    out = (np.concatenate([lane_ids, lane_cnt], axis=1), D)
    cache[ckey] = out
    return out


def lane_depths(index) -> np.ndarray:
    """Per-gene max lane depth [G] int32 (0 for empty profiles) — the
    per-gene slot-loop bounds of the lane2 kernel."""
    cache = getattr(index, "_pad_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(index, "_pad_cache", cache)
    if "laneDg" in cache:
        return cache["laneDg"]
    G = index.n_sequences
    ids = np.asarray(index.profile_ids)
    if ids.size == 0:
        dg = np.zeros(G, np.int32)
    else:
        widths = np.diff(index.profile_ptr)
        g_of = np.repeat(np.arange(G, dtype=np.int64), widths)
        keys = g_of * _LANE + (ids.astype(np.int64) & (_LANE - 1))
        per_lane = np.bincount(keys, minlength=G * _LANE)
        dg = per_lane.reshape(G, _LANE).max(axis=1).astype(np.int32)
    cache["laneDg"] = dg
    return dg


def lane_depth(index) -> int:
    """The ``D`` of :func:`pack_lane_profiles` (max (gene, lane)
    multiplicity), computed with one host bincount.  The full host pack
    costs ~11s of NumPy at Mycoplasma-64 scale and its 695MB table
    another ~7s over the remote tunnel; the production path therefore
    computes only this scalar on host and builds the table on device
    (:func:`pack_lane_device_core`) from the already-resident padded
    profiles."""
    dg = lane_depths(index)
    return max(1, int(dg.max(initial=0)))


def pack_lane_device_core(
    ids, counts, D: int, row_chunk: int = 128, packed: bool = False
):
    """Traceable on-device twin of :func:`pack_lane_profiles`.

    ``ids``/``counts`` are the [G_pad, W] padded profile arrays
    (``pad_profiles`` layout: id-sorted, left-packed, count == 0 marks
    padding).  Returns the [G_pad, 2*D*128] lane table, bit-equal to the
    host pack (``tests/test_lane_join.py``) — or, with ``packed``, the
    lane2 kernel's single [G_pad, D*128] table with entries
    ``id << 8 | count`` (count < 256, id < 2^23) and empty slots
    ``-256``: half the join's gather traffic, and id equality is one
    ``(a ^ b) >> 8 == 0`` test.

    Per row chunk: lane = id & 127; depth = rank of the slot within its
    (row, lane) group via a cumsum over the 128-wide lane one-hot
    (profile order is id order, so depth ascends with id exactly like
    the host's stable sort); each valid slot scatters to
    ``depth*128 + lane``.  Scatter indices are unique by construction —
    padding slots go to a per-slot dump column past the table."""
    G_pad, W = ids.shape
    rc = row_chunk
    while G_pad % rc:
        rc //= 2
    WL = D * _LANE
    stride = WL + W  # dump block: one column per profile slot

    def chunk(ci, out):
        i0 = ci * rc
        idc = jax.lax.dynamic_slice(ids, (i0, 0), (rc, W))
        cnc = jax.lax.dynamic_slice(counts, (i0, 0), (rc, W))
        valid = cnc > 0
        lane = idc & (_LANE - 1)
        onehot = (
            lane[:, :, None] == jnp.arange(_LANE, dtype=jnp.int32)
        ) & valid[:, :, None]
        cum = jnp.cumsum(onehot.astype(jnp.int32), axis=1)
        depth = jnp.take_along_axis(cum, lane[..., None], axis=2)[..., 0] - 1
        slot = jnp.arange(W, dtype=jnp.int32)[None, :]
        pos = jnp.where(valid, depth * _LANE + lane, WL + slot)
        flat_pos = (
            jnp.arange(rc, dtype=jnp.int32)[:, None] * stride + pos
        ).reshape(-1)
        if packed:
            vals = jnp.where(valid, (idc << 8) | cnc, -256)
            blk = (
                jnp.full((rc * stride,), -256, jnp.int32)
                .at[flat_pos]
                .set(vals.reshape(-1), unique_indices=True)
                .reshape(rc, stride)[:, :WL]
            )
        else:
            lid = (
                jnp.full((rc * stride,), -1, jnp.int32)
                .at[flat_pos]
                .set(
                    jnp.where(valid, idc, -1).reshape(-1),
                    unique_indices=True,
                )
            )
            lcn = (
                jnp.zeros((rc * stride,), jnp.int32)
                .at[flat_pos]
                .set(
                    jnp.where(valid, cnc, 0).reshape(-1),
                    unique_indices=True,
                )
            )
            blk = jnp.concatenate(
                [
                    lid.reshape(rc, stride)[:, :WL],
                    lcn.reshape(rc, stride)[:, :WL],
                ],
                axis=1,
            )
        return jax.lax.dynamic_update_slice(out, blk, (i0, 0))

    width = WL if packed else 2 * WL
    out0 = jnp.full((G_pad, width), -256 if packed else -1, jnp.int32)
    return jax.lax.fori_loop(0, G_pad // rc, chunk, out0)


@functools.partial(jax.jit, static_argnames=("D", "packed"))
def pack_lane_device(ids, counts, D, packed=False):
    return pack_lane_device_core(ids, counts, D, packed=packed)


def _make_lane_kernel(D: int):
    """Kernel over one [PAIR_BLOCK, 2*D*128] block pair."""
    W = D * _LANE
    n_oct = _PAIR_BLOCK // _OCT
    BIG = 0x7FFFFFFF

    def kernel(a_blk, b_blk, inter_ref, perc_ref, tr_ref):
        # transpose-reduce an [8, 128] accumulator to the octet's static
        # lane offset of the [1, PAIR_BLOCK] output row
        def _place(acc, row_acc, o):
            sums = jnp.sum(
                jnp.swapaxes(acc, 0, 1), axis=0, keepdims=True
            )  # [1, 8]
            wide = jnp.concatenate(
                [sums, jnp.zeros((1, _PAIR_BLOCK - _OCT), jnp.float32)],
                axis=1,
            )
            return row_acc + pltpu.roll(wide, o * _OCT, 1)

        inter_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        perc_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        tr_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)

        for o in range(n_oct):
            sl = slice(o * _OCT, (o + 1) * _OCT)

            # per-slot id ranges for the banded window (invalid slots ->
            # [BIG, BIG): never start a window, never extend one)
            bmin_t, bmax_t = [], []
            for t in range(D):
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

            acc0 = jnp.zeros((_OCT, _LANE), jnp.float32)
            accs = (acc0, acc0, acc0)
            for da in range(D):
                a_ids = a_blk[sl, da * _LANE : (da + 1) * _LANE]
                a_cnt_i = a_blk[sl, W + da * _LANE : W + (da + 1) * _LANE]
                va = a_cnt_i > 0
                anya = jnp.any(va)
                amin = jnp.where(
                    anya, jnp.min(jnp.where(va, a_ids, BIG)), BIG
                )
                amax = jnp.where(
                    anya, jnp.max(jnp.where(va, a_ids, -1)), jnp.int32(-1)
                )
                # contiguous overlap window over b slots (octet rows mix,
                # so ranges need not be monotonic; explicit overlap tests
                # may include wasted middles, never wrong answers)
                bstart = jnp.int32(D)
                bend = jnp.int32(0)
                for t in range(D):
                    ov = (bmax_t[t] >= amin) & (bmin_t[t] <= amax)
                    bstart = jnp.minimum(bstart, jnp.where(ov, t, D))
                    bend = jnp.maximum(bend, jnp.where(ov, t + 1, 0))
                a_cnt = a_cnt_i.astype(jnp.float32)

                def b_body(db, accs, sl=sl, a_ids=a_ids, a_cnt=a_cnt):
                    inter_a, perc_a, tr_a = accs
                    b_ids = b_blk[sl, pl.ds(db * _LANE, _LANE)]
                    b_cnt = b_blk[sl, pl.ds(W + db * _LANE, _LANE)].astype(
                        jnp.float32
                    )
                    eq = a_ids == b_ids  # lane-aligned: ONE compare
                    return (
                        inter_a
                        + jnp.where(eq, jnp.minimum(a_cnt, b_cnt), 0.0),
                        perc_a + jnp.where(eq, a_cnt, 0.0),
                        tr_a + jnp.where(eq, b_cnt, 0.0),
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


def lane_join_core(
    all_lane,  # int32 [G_pad, 2*D*128] lane-packed profiles
    a_idx,  # int32 [P] (P a multiple of `chunk`)
    b_idx,  # int32 [P]
    D: int,
    chunk: int,
    interpret: bool = False,
):
    """Exact counters per pair: (inter, perc, tr) f32 [P], perc relative
    to the a-side.  Expands profile rows chunk-by-chunk with XLA gathers
    and runs the lane kernel on each chunk.  Unjitted traceable core —
    callable from inside ``shard_map``."""
    P = a_idx.shape[0]
    n_chunks = P // chunk
    kernel = _make_lane_kernel(D)
    W2 = all_lane.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(chunk // _PAIR_BLOCK,),
        in_specs=[
            pl.BlockSpec((_PAIR_BLOCK, W2), lambda p: (p, 0)),
            pl.BlockSpec((_PAIR_BLOCK, W2), lambda p: (p, 0)),
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
        a_exp = jnp.take(all_lane, ai, axis=0)
        b_exp = jnp.take(all_lane, bi, axis=0)
        inter_c, perc_c, tr_c = run_chunk(a_exp, b_exp)
        return tuple(
            jax.lax.dynamic_update_slice(o, v.reshape(-1), (ci * chunk,))
            for o, v in zip(outs, (inter_c, perc_c, tr_c))
        )

    z = jnp.zeros((P,), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, (z, z, z))


@functools.partial(jax.jit, static_argnames=("D", "chunk", "interpret"))
def join_pairs_lane_device(all_lane, a_idx, b_idx, D, chunk, interpret=False):
    return lane_join_core(
        all_lane, a_idx, b_idx, D=D, chunk=chunk, interpret=interpret
    )


# --- lane2: per-octet depth bounds, packed entries, no window logic ------
#
# Round-4 measurement (scripts/lane_join_micro.py on v5e): the banded lane
# kernel runs at ~0.9M pairs/s — the SAME as the rotate kernel it was
# meant to beat, because its per-(octet, slot) min/max id-range reductions
# are cross-lane ops (~33 cycles each) and its window tests are scalar
# chains; the one-compare join itself is a rounding error next to them.
# lane2 deletes all of it:
#
# - loop bounds come from PER-GENE lane depths (host bincount, prefetched
#   per octet as scalars) instead of per-pair id-range windows — zero
#   in-kernel reductions.  The flat pair order is already depth-coherent
#   (rows run in profile-width order, candidates ascend within a row —
#   round 5 dropped the explicit (Da, Db) device sort: +19% octet-steps
#   against ~90ms of argsorts and permutation gathers), so the max-of-8
#   bound stays tight; most octets run ~Da*Db ~ 10-45 single-compare
#   steps.
# - table entries pack to id << 8 | count (empty -256): half the gather
#   bytes, equality is one xor+shift, counts one mask.

def _make_lane2_kernel(D: int):
    W = D * _LANE
    n_oct = _PAIR_BLOCK // _OCT

    def kernel(da_ref, db_ref, a_blk, b_blk, inter_ref, perc_ref, tr_ref):
        p = pl.program_id(0)

        def _place(acc, row_acc, o):
            sums = jnp.sum(
                jnp.swapaxes(acc, 0, 1), axis=0, keepdims=True
            )  # [1, 8]
            wide = jnp.concatenate(
                [sums, jnp.zeros((1, _PAIR_BLOCK - _OCT), jnp.float32)],
                axis=1,
            )
            return row_acc + pltpu.roll(wide, o * _OCT, 1)

        inter_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        perc_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)
        tr_row = jnp.zeros((1, _PAIR_BLOCK), jnp.float32)

        for o in range(n_oct):
            sl = slice(o * _OCT, (o + 1) * _OCT)
            Da = da_ref[p * n_oct + o]
            Db = db_ref[p * n_oct + o]
            acc0 = jnp.zeros((_OCT, _LANE), jnp.float32)

            def a_body(da, accs, sl=sl, Db=Db):
                a_pk = a_blk[sl, pl.ds(da * _LANE, _LANE)]
                a_cnt = (a_pk & 255).astype(jnp.float32)

                def b_body(db, accs, sl=sl, a_pk=a_pk, a_cnt=a_cnt):
                    inter_a, perc_a, tr_a = accs
                    b_pk = b_blk[sl, pl.ds(db * _LANE, _LANE)]
                    eq = ((a_pk ^ b_pk) >> 8) == 0
                    b_cnt = (b_pk & 255).astype(jnp.float32)
                    return (
                        inter_a
                        + jnp.where(eq, jnp.minimum(a_cnt, b_cnt), 0.0),
                        perc_a + jnp.where(eq, a_cnt, 0.0),
                        tr_a + jnp.where(eq, b_cnt, 0.0),
                    )

                return jax.lax.fori_loop(0, Db, b_body, accs, unroll=False)

            accs = jax.lax.fori_loop(
                0, Da, a_body, (acc0, acc0, acc0), unroll=False
            )
            inter_row = _place(accs[0], inter_row, o)
            perc_row = _place(accs[1], perc_row, o)
            tr_row = _place(accs[2], tr_row, o)

        inter_ref[...] = inter_row
        perc_ref[...] = perc_row
        tr_ref[...] = tr_row

    return kernel


def lane2_join_core(
    all_packed,  # int32 [G_pad, D*128] packed lane table (id<<8|cnt)
    a_idx,  # int32 [P]
    b_idx,  # int32 [P]
    da_oct,  # int32 [P // 8] per-octet a-depth bounds
    db_oct,  # int32 [P // 8] per-octet b-depth bounds
    D: int,
    chunk: int,
    interpret: bool = False,
):
    """Exact counters per pair, lane2 kernel.  Callers sort the pair
    list by (depth_a, depth_b) for homogeneous octets; this core only
    needs the bounds to be VALID (>= the octet's true depths)."""
    P = a_idx.shape[0]
    n_chunks = P // chunk
    kernel = _make_lane2_kernel(D)
    W = all_packed.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(chunk // _PAIR_BLOCK,),
        in_specs=[
            pl.BlockSpec((_PAIR_BLOCK, W), lambda p, s0, s1: (p, 0)),
            pl.BlockSpec((_PAIR_BLOCK, W), lambda p, s0, s1: (p, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p, s0, s1: (0, p)),
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p, s0, s1: (0, p)),
            pl.BlockSpec((1, _PAIR_BLOCK), lambda p, s0, s1: (0, p)),
        ],
    )

    def run_chunk(da_c, db_c, a_exp, b_exp):
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
        )(da_c, db_c, a_exp, b_exp)

    def body(ci, outs):
        ai = jax.lax.dynamic_slice(a_idx, (ci * chunk,), (chunk,))
        bi = jax.lax.dynamic_slice(b_idx, (ci * chunk,), (chunk,))
        da_c = jax.lax.dynamic_slice(
            da_oct, (ci * (chunk // _OCT),), (chunk // _OCT,)
        )
        db_c = jax.lax.dynamic_slice(
            db_oct, (ci * (chunk // _OCT),), (chunk // _OCT,)
        )
        a_exp = jnp.take(all_packed, ai, axis=0)
        b_exp = jnp.take(all_packed, bi, axis=0)
        inter_c, perc_c, tr_c = run_chunk(da_c, db_c, a_exp, b_exp)
        return tuple(
            jax.lax.dynamic_update_slice(o, v.reshape(-1), (ci * chunk,))
            for o, v in zip(outs, (inter_c, perc_c, tr_c))
        )

    z = jnp.zeros((P,), jnp.float32)
    return jax.lax.fori_loop(0, n_chunks, body, (z, z, z))


@functools.partial(jax.jit, static_argnames=("D", "chunk", "interpret"))
def join_pairs_lane2_device(
    all_packed, a_idx, b_idx, da_oct, db_oct, D, chunk, interpret=False
):
    return lane2_join_core(
        all_packed, a_idx, b_idx, da_oct, db_oct,
        D=D, chunk=chunk, interpret=interpret,
    )
