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
instead batches 8 same-row candidates in sublanes and ROTATES the
candidate tile across lanes: 128 rotation steps of clean [8, 128] vector
ops (roll / compare / min / select-accumulate) cover every lane
alignment with no splats.

Structure per grid step (= one row, width-sorted perm order):

- the row's packed (ids || counts) profile arrives via an automatically
  pipelined BlockSpec whose index map reads the row's gene id from a
  scalar-prefetch array (the paged-attention pattern),
- the row's candidate-gene-id vector is DMA'd HBM->SMEM two steps ahead
  (3-slot ring), candidate profiles are DMA'd HBM->VMEM one step ahead
  (double buffer, one DMA per candidate),
- compute: for each octet of 8 candidate slots x each (a-tile, b-tile)
  128-lane chunk pair, 128 compare-rotate steps accumulate the three
  counters.  Padding rows/slots carry zero counts and contribute
  nothing; loop bounds come from true profile widths so padded tiles
  are skipped.

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


def _join_kernel(
    # scalar prefetch
    perm_ref,  # SMEM [R_tot] gene id per row
    cnt_ref,  # SMEM [R_tot] candidate count per row
    width_ref,  # SMEM [G_pad] true profile width per gene
    # inputs
    a_ref,  # VMEM (1, 2W) pipelined row profile (ids || counts)
    pair_hbm,  # ANY  [G_pad, 2W] packed profiles (manual DMA source)
    cand_hbm,  # ANY  [R_tot, K] candidate gene ids (manual DMA source)
    # outputs (transposed: lane dim = rows, sublane dim = slots)
    inter_ref,  # VMEM (K, 1)
    perc_ref,  # VMEM (K, 1)
    tr_ref,  # VMEM (K, 1)
    # scratch
    candvec,  # SMEM (3, K)
    b_buf,  # VMEM (2 * K, 2W)
    cand_sem,  # DMA sems (3,)
    b_sem,  # DMA sems (2, K)
    *,
    k_cap: int,
    w_pad: int,
    n_rows: int,
):
    r = pl.program_id(0)
    W = w_pad
    K = k_cap

    def start_candvec(row, slot):
        pltpu.make_async_copy(
            cand_hbm.at[pl.ds(row, 1), :],
            candvec.at[pl.ds(slot, 1), :],
            cand_sem.at[slot],
        ).start()

    def start_b_rows(row, buf):
        # candidate vector for `row` must have landed in candvec[row % 3]
        cslot = jax.lax.rem(row, 3)
        n = cnt_ref[row]

        def issue(s, _):
            gene = candvec[cslot, s]
            pltpu.make_async_copy(
                pair_hbm.at[pl.ds(gene, 1), :],
                b_buf.at[pl.ds(buf * K + s, 1), :],
                b_sem.at[buf, s],
            ).start()
            return 0

        jax.lax.fori_loop(0, n, issue, 0, unroll=False)

    # --- pipeline warm-up (first step only)
    @pl.when(r == 0)
    def _():
        start_candvec(0, 0)
        pltpu.make_async_copy(
            cand_hbm.at[pl.ds(0, 1), :], candvec.at[pl.ds(0, 1), :],
            cand_sem.at[0],
        ).wait()
        start_b_rows(0, 0)
        if n_rows > 1:
            start_candvec(1, 1)

    # --- steady state: fetch row r+1's candidate profiles, row r+2's
    # candidate vector
    @pl.when(r + 1 < n_rows)
    def _():
        nxt = r + 1
        pltpu.make_async_copy(
            cand_hbm.at[pl.ds(nxt, 1), :],
            candvec.at[pl.ds(jax.lax.rem(nxt, 3), 1), :],
            cand_sem.at[jax.lax.rem(nxt, 3)],
        ).wait()
        start_b_rows(nxt, jax.lax.rem(nxt, 2))

        @pl.when(r + 2 < n_rows)
        def _():
            start_candvec(r + 2, jax.lax.rem(r + 2, 3))

    # --- compute row r from b_buf[r % 2]
    buf = jax.lax.rem(r, 2)
    cslot = jax.lax.rem(r, 3)
    n = cnt_ref[r]
    wa = width_ref[perm_ref[r]]
    na = pl.cdiv(wa, _LANE)

    inter_ref[...] = jnp.zeros_like(inter_ref)
    perc_ref[...] = jnp.zeros_like(perc_ref)
    tr_ref[...] = jnp.zeros_like(tr_ref)

    n_oct = pl.cdiv(n, _OCT)

    def octet_body(o, _):
        # wait for this octet's profile DMAs (no-ops once landed)
        def wait_one(s, _):
            pltpu.make_async_copy(
                pair_hbm.at[pl.ds(0, 1), :],
                b_buf.at[pl.ds(0, 1), :],
                b_sem.at[buf, o * _OCT + s],
            ).wait()
            return 0

        jax.lax.fori_loop(
            0, jnp.minimum(n - o * _OCT, _OCT), wait_one, 0, unroll=False
        )

        # widest candidate in the octet bounds the b-tile loop
        def wmax(s, m):
            s_abs = o * _OCT + s
            gene = candvec[cslot, s_abs]
            valid = s_abs < n
            return jnp.maximum(m, jnp.where(valid, width_ref[gene], 0))

        wb = jax.lax.fori_loop(0, _OCT, wmax, jnp.int32(0), unroll=True)
        nb = pl.cdiv(wb, _LANE)

        base = buf * K + o * _OCT

        inter_acc0 = jnp.zeros((_OCT, _LANE), jnp.float32)

        def b_tile_body(bi, accs):
            b_ids = b_buf[pl.ds(base, _OCT), pl.ds(bi * _LANE, _LANE)]
            b_cnt = b_buf[
                pl.ds(base, _OCT), pl.ds(W + bi * _LANE, _LANE)
            ].astype(jnp.float32)

            def a_tile_body(ai, accs):
                inter_a, perc_a, tr_a = accs
                a_ids = jnp.broadcast_to(
                    a_ref[pl.ds(0, 1), pl.ds(ai * _LANE, _LANE)],
                    (_OCT, _LANE),
                )
                a_cnt = jnp.broadcast_to(
                    a_ref[pl.ds(0, 1), pl.ds(W + ai * _LANE, _LANE)],
                    (_OCT, _LANE),
                ).astype(jnp.float32)

                def rot_body(s, st):
                    inter_a, perc_a, tr_a, rb_ids, rb_cnt = st
                    eq = a_ids == rb_ids
                    inter_a = inter_a + jnp.where(
                        eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                    )
                    perc_a = perc_a + jnp.where(eq, a_cnt, 0.0)
                    tr_a = tr_a + jnp.where(eq, rb_cnt, 0.0)
                    rb_ids = pltpu.roll(rb_ids, 1, 1)
                    rb_cnt = pltpu.roll(rb_cnt, 1, 1)
                    return inter_a, perc_a, tr_a, rb_ids, rb_cnt

                inter_a, perc_a, tr_a, _, _ = jax.lax.fori_loop(
                    0,
                    _LANE,
                    rot_body,
                    (inter_a, perc_a, tr_a, b_ids, b_cnt),
                    unroll=False,
                )
                return inter_a, perc_a, tr_a

            return jax.lax.fori_loop(
                0, na, a_tile_body, accs, unroll=False
            )

        inter_acc, perc_acc, tr_acc = jax.lax.fori_loop(
            0,
            nb,
            b_tile_body,
            (inter_acc0, inter_acc0, inter_acc0),
            unroll=False,
        )

        # per-slot totals: lane-reduce [8, 128] -> [8, 1], store to the
        # transposed outputs' sublane range for this octet.  Slots past
        # the row's candidate count hold stale b_buf data — mask them.
        slot_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (_OCT, 1), 0) + o * _OCT
            < n
        )
        inter_ref[pl.ds(o * _OCT, _OCT), :] = jnp.where(
            slot_ok, jnp.sum(inter_acc, axis=1, keepdims=True), 0.0
        )
        perc_ref[pl.ds(o * _OCT, _OCT), :] = jnp.where(
            slot_ok, jnp.sum(perc_acc, axis=1, keepdims=True), 0.0
        )
        tr_ref[pl.ds(o * _OCT, _OCT), :] = jnp.where(
            slot_ok, jnp.sum(tr_acc, axis=1, keepdims=True), 0.0
        )
        return 0

    jax.lax.fori_loop(0, n_oct, octet_body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("k_cap", "w_pad", "interpret")
)
def pair_join_counters(
    all_pair,  # int32 [G_pad, 2W] (ids || counts), sorted ids, 0-count pad
    perm_rows,  # int32 [R_tot] gene id per row (>= n_true for pad rows)
    cand,  # int32 [R_tot, K] candidate gene ids (empty slots -> pad gene)
    cnt,  # int32 [R_tot] candidate count per row (0 for pad rows)
    prof_width,  # int32 [G_pad] true profile widths (0 for pad genes)
    k_cap: int,
    w_pad: int,
    interpret: bool = False,
):
    """Returns (inter, perc, tr) f32 [R_tot, K] exact integer counters."""
    R_tot, K = cand.shape
    assert K == k_cap and all_pair.shape[1] == 2 * w_pad
    assert K % _OCT == 0 and w_pad % _LANE == 0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(R_tot,),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * w_pad),
                lambda r, perm, cnt_, wid: (perm[r], 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((K, 1), lambda r, *_: (0, r)),
            pl.BlockSpec((K, 1), lambda r, *_: (0, r)),
            pl.BlockSpec((K, 1), lambda r, *_: (0, r)),
        ],
        scratch_shapes=[
            pltpu.SMEM((3, K), jnp.int32),
            pltpu.VMEM((2 * K, 2 * w_pad), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2, K)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((K, R_tot), jnp.float32) for _ in range(3)
    ]
    kernel = functools.partial(
        _join_kernel, k_cap=k_cap, w_pad=w_pad, n_rows=R_tot
    )
    inter_t, perc_t, tr_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(perm_rows, cnt, prof_width, all_pair, all_pair, cand)
    return inter_t.T, perc_t.T, tr_t.T


def pack_profiles(padded_ids, padded_counts):
    """[G_pad, W] ids + counts -> [G_pad, 2W] packed int32 (ids||counts)."""
    return np.concatenate(
        [padded_ids, padded_counts], axis=1
    ).astype(np.int32)
