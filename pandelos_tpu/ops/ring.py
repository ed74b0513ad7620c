"""Ring-sharded candidate extraction: signatures never replicated.

The default mesh engine (ops/candidate.py) replicates the [G_pad, B]
bf16 signature matrix on every device — the dominant HBM consumer at
scale (SURVEY §5 / VERDICT r3 missing #3: past ~10x Mycoplasma the
replicated signatures alone exceed a v5e's HBM).  This module is the
SURVEY §5 "ring-style rotation of column shards" — the TPU analogue of
the reference's 2048-wide column blocking (``library.cpp:453-458``)
scaled across devices:

- each device builds the signature block of ITS OWN contiguous gene
  range (``histogram_core`` over a shard-local slice of the replicated
  profiles — the global [G_pad, B] array is never materialized), plus
  the signature rows of its own row blocks,
- at ring step ``s`` device ``d`` holds column shard ``(d + s) % n``:
  it bounds its row blocks against that shard ([R, B] x [B, Gc] MXU
  matmuls) and extracts that shard's candidates,
- the shard then rotates to the neighbour with ``jax.lax.ppermute``
  (ICI neighbour exchange, overlappable with the next step's compute).

After ``n`` steps every (row, column) pair has been bounded exactly
once.  Per-device signature memory drops from ``G_pad * B`` to
``2 * G_pad * B / n`` (own rows + the rotating column shard), i.e. the
signature wall scales out linearly with devices.  Profiles remain
replicated (packed int32, ~4 * G * W bytes — the next, much higher
wall; see docs/DESIGN.md "Memory model").

Exactness: the bound only GATES candidate pairs — every truly valid
pair passes it in any formulation (bf16 round-up upper bounds), and the
exact join + validity test downstream are unchanged — so ring-extracted
cells are identical to the replicated engine's (pinned by
tests/test_ring.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import KmerIndex
from pandelos_tpu.oracle.cells import ScoreCells

_PROGRAMS: dict = {}


def _ring_extract_program(
    mesh, axis: str, R: int, S: int, K: int, n_true: int, k2: int,
    n_buckets: int, shift: int, Gc: int, W: int, n_dev: int,
    upper_only: bool,
):
    from jax.sharding import PartitionSpec as P

    from pandelos_tpu.ops.pallas_hist import histogram_core

    key = ("ring", mesh, axis, R, S, K, n_true, k2, n_buckets, shift,
           Gc, W, n_dev, upper_only)
    fn = _PROGRAMS.get(key)
    if fn is not None:
        return fn

    B = n_buckets

    def local(all_ids, all_counts, col_lens, perm, starts):
        d = jax.lax.axis_index(axis)

        # column-shard signature from the shard's own gene range
        ids_c = jax.lax.dynamic_slice(all_ids, (d * Gc, 0), (Gc, W))
        cnt_c = jax.lax.dynamic_slice(all_counts, (d * Gc, 0), (Gc, W))
        sig_c = histogram_core(
            ids_c, cnt_c, B, shift, round_up_bf16=True
        )  # [Gc, B] bf16

        # row-block signatures (this shard's rows only)
        row_idx = jax.vmap(
            lambda s: jax.lax.dynamic_slice(perm, (s,), (R,))
        )(starts).reshape(-1)  # [S*R]
        sig_r = histogram_core(
            all_ids[row_idx], all_counts[row_idx], B, shift,
            round_up_bf16=True,
        )  # [S*R, B] bf16
        pres_r = (sig_r != 0).astype(jnp.bfloat16)
        row_lens = col_lens[row_idx]  # [S*R]
        grow = row_idx.reshape(S, R)

        queries = jnp.arange(1, K + 1, dtype=jnp.int32)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (R, Gc), 1)
        have_iota = jnp.arange(K, dtype=jnp.int32)[None, :]

        def ring_step(s, carry):
            sig_cur, cand_acc, cnt_acc = carry
            shard = jax.lax.rem(d + s, n_dev)
            c0 = shard * Gc
            pres_cur = (sig_cur != 0).astype(jnp.bfloat16)
            lens_c = jax.lax.dynamic_slice(col_lens, (c0,), (Gc,))

            def blk(b, accs):
                cand_a, cnt_a = accs
                mass_a = jax.lax.dynamic_slice(sig_r, (b * R, 0), (R, B))
                pres_a = jax.lax.dynamic_slice(pres_r, (b * R, 0), (R, B))
                growb = jax.lax.dynamic_slice(row_idx, (b * R,), (R,))
                rl = jax.lax.dynamic_slice(row_lens, (b * R,), (R,))
                perc_bnd = jax.lax.dot_general(
                    mass_a, pres_cur, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [R, Gc]
                tr_bnd = jax.lax.dot_general(
                    pres_a, sig_cur, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cols_g = c0 + col_iota  # [R, Gc] global column ids
                mask = (
                    (
                        (jnp.float32(k2) * perc_bnd >= rl[:, None])
                        | (jnp.float32(k2) * tr_bnd >= lens_c[None, :])
                    )
                    & (
                        (cols_g > growb[:, None])
                        if upper_only
                        else (cols_g != growb[:, None])
                    )
                    & (cols_g < n_true)
                    & (growb[:, None] < n_true)
                    & (rl[:, None] > 0)
                    & (lens_c[None, :] > 0)
                )
                counts = jnp.sum(mask, axis=1, dtype=jnp.int32)  # [R]
                cs = jnp.cumsum(mask.astype(jnp.int32), axis=1)
                cand_l = jax.vmap(
                    lambda row: jnp.searchsorted(row, queries)
                )(cs).astype(jnp.int32)  # [R, K] local col idx
                have = have_iota < counts[:, None]
                cand = jnp.where(
                    have, c0 + jnp.minimum(cand_l, Gc - 1), n_true
                )
                cand_a = jax.lax.dynamic_update_slice(
                    cand_a, cand[None, None], (s, b, 0, 0)
                )
                cnt_a = jax.lax.dynamic_update_slice(
                    cnt_a, counts[None, None], (s, b, 0)
                )
                return cand_a, cnt_a

            cand_acc, cnt_acc = jax.lax.fori_loop(
                0, S, blk, (cand_acc, cnt_acc)
            )
            sig_next = jax.lax.ppermute(
                sig_cur, axis,
                [(i, (i - 1) % n_dev) for i in range(n_dev)],
            )
            return sig_next, cand_acc, cnt_acc

        cand0 = jnp.full((n_dev, S, R, K), n_true, dtype=jnp.int32)
        cnt0 = jnp.zeros((n_dev, S, R), dtype=jnp.int32)
        _, cand_out, cnt_out = jax.lax.fori_loop(
            0, n_dev, ring_step, (sig_c, cand0, cnt0)
        )
        return grow, cand_out, cnt_out

    fn = jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None),  # all_ids
                P(None, None),  # all_counts
                P(None),        # col_lens
                P(None),        # perm
                P(axis),        # starts
            ),
            out_specs=(
                P(axis, None),              # grow [S*n, R]
                P(None, axis, None, None),  # cand [n, S*n, R, K]
                P(None, axis, None),        # counts [n, S*n, R]
            ),
            check_vma=False,
        )
    )
    _PROGRAMS[key] = fn
    return fn


def compute_cells_ring(
    index: KmerIndex, config: PipelineConfig
) -> ScoreCells:
    """Full-dataset valid cells with ring-sharded signatures.  Requires
    a multi-device mesh (n_devices >= 2); cells are bit-identical to
    :func:`pandelos_tpu.ops.candidate.compute_cells_candidate`."""
    from pandelos_tpu.ops.candidate import (
        _host_fallback_rows,
        _resolve_n_devices,
        build_signatures,
        get_runner,
    )
    from pandelos_tpu.ops.pallas_hist import pick_buckets
    from pandelos_tpu.ops.score import _round_up, pad_profiles

    G = index.n_sequences
    if G == 0 or index.profile_ids.size == 0:
        z32 = np.zeros(0, dtype=np.int32)
        z64 = np.zeros(0, dtype=np.int64)
        return ScoreCells(z32, z32, z64, z64, z64)

    n_dev = _resolve_n_devices(config)
    if n_dev < 2:
        raise ValueError(
            "ring extraction needs a multi-device mesh (n_devices >= 2)"
        )
    from pandelos_tpu.ops.candidate import check_hbm_fit

    check_hbm_fit(index, config, ring=True)

    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    padded = pad_profiles(index, row_block, col_block)
    G_pad = padded.ids.shape[0]
    if G_pad % n_dev:
        raise ValueError(
            f"G_pad={G_pad} not divisible by n_devices={n_dev}; "
            f"choose a col_block divisible by the device count"
        )
    Gc = G_pad // n_dev
    K = config.candidate_cap

    # runner for mesh/placement/flatten (its replicated signature upload
    # is bypassed: build_signatures host path is only used to key the
    # bucket geometry; pass a zero-row stub to avoid the big transfer)
    n_buckets, shift = pick_buckets(
        index.vocab_size, max(1, index.max_profile_len), index.k,
        n_genes=G_pad,
    )
    sig_stub = np.zeros((1, 1), dtype=np.float32)
    runner = get_runner(index, padded, sig_stub, config, tag="ring")

    widths = np.diff(index.profile_ptr)
    perm = np.argsort(widths, kind="stable").astype(np.int32)
    n_blocks = -(-G // row_block)
    perm_pad = np.full(n_blocks * row_block, G, dtype=np.int32)
    perm_pad[:G] = perm
    perm_ext = np.concatenate(
        [perm_pad, np.full(row_block, G, dtype=np.int32)]
    )
    starts = np.arange(0, n_blocks * row_block, row_block, np.int32)
    sg = runner._pad_starts(starts, len(perm_ext) - row_block)
    S = len(sg) // n_dev

    fn = _ring_extract_program(
        runner.mesh, runner.axis, row_block, S, K, G, 2 * index.k,
        n_buckets, shift, Gc, padded.width, n_dev, upper_only=True,
    )
    grow_d, cand_d, counts_d = fn(
        runner.all_ids, runner.all_counts, runner.col_lens,
        runner._replicate(np.asarray(perm_ext, np.int32)),
        runner._shard0(sg),
    )

    counts_h = runner.fetch(counts_d)  # [n_dev, S*n_dev, R]
    grow_h = np.stack([perm_ext[s : s + row_block] for s in sg])  # [S*n, R]
    grow_steps = np.broadcast_to(
        grow_h[None], (n_dev,) + grow_h.shape
    )  # [n_steps, S*n, R]

    over = (counts_h > K) & (grow_steps < G)
    overflow_rows = sorted(set(grow_steps[over].astype(int).tolist()))

    # pair capacity over VIRTUAL rows (step-major layout); rows are
    # sharded on the middle axis, which splits as [n_dev shards, S]
    nf = np.where(counts_h > K, 0, counts_h)
    per_shard = (
        nf.reshape(n_dev, n_dev, S, row_block)
        .sum(axis=(0, 2, 3))
        .astype(np.int64)
    )
    from pandelos_tpu.ops import lane_join, pallas_join
    from pandelos_tpu.ops.candidate import _next_pow2

    worst = int(per_shard.max(initial=0))
    interpret = jax.default_backend() == "cpu"
    full = (
        (lane_join._CHUNK if runner.join_kernel == "lane"
         else pallas_join._CHUNK)
        if not interpret else 256
    )
    pair_cap = _next_pow2(max(worst, pallas_join._PAIR_BLOCK))
    chunk = min(full, pair_cap)

    from jax.sharding import NamedSharding, PartitionSpec as P

    grow_v = jax.device_put(
        np.ascontiguousarray(grow_steps.astype(np.int32)),
        NamedSharding(runner.mesh, P(None, runner.axis, None)),
    )
    pi_d, pj_d, inter_d, perc_d, tr_d, valid_d = runner.flatten_join(
        grow_v, cand_d, counts_d, K, pair_cap, chunk, ring=True
    )
    pi, pj, vmask, inter, perc, tr = runner.fetch_many(
        pi_d, pj_d, valid_d, inter_d, perc_d, tr_d
    )
    keep = pi < G
    pi, pj = pi[keep], pj[keep]
    vmask = vmask[keep]
    inter, perc, tr = inter[keep], perc[keep], tr[keep]

    r_out, c_out, i_out, p_out, t_out = [], [], [], [], []
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

    if overflow_rows:
        fb = _host_fallback_rows(index, overflow_rows)
        keep = fb.col > fb.row
        r_out.append(np.concatenate([fb.row[keep], fb.col[keep]]))
        c_out.append(np.concatenate([fb.col[keep], fb.row[keep]]))
        i_out.append(
            np.concatenate([fb.intersection[keep], fb.intersection[keep]])
        )
        p_out.append(
            np.concatenate([fb.perc_cnt[keep], fb.tr_perc_cnt[keep]])
        )
        t_out.append(
            np.concatenate([fb.tr_perc_cnt[keep], fb.perc_cnt[keep]])
        )

    return ScoreCells(
        np.concatenate(r_out),
        np.concatenate(c_out),
        np.concatenate(i_out),
        np.concatenate(p_out),
        np.concatenate(t_out),
    )
