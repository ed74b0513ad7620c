"""Full-device BBH network construction over the scoring mesh.

Phase 2 of the candidate engine: instead of shipping every valid cell to
the host (~20-60MB over a ~33MB/s remote-TPU tunnel), run the reference's
BBH + paralog filters (Pangenes.java:98-176) on device and ship only the
accepted cells (~1-5MB).

Runs on the same ``MeshRunner``/``shard_map`` formulation as the cells
path, so one code path serves 1 chip, N chips, and N hosts:

- each shard computes its local rows' per-(row, genome) score maxima,
- the maxima every BBH test needs for BOTH endpoints are merged with an
  ``all_gather`` over the mesh axis — the reference's cross-thread
  ``col_max_scores`` merge (library.cpp:515) as an ICI collective,
- the per-genome-pair ``inter_max_score`` matrix reduces with ``pmax``.

Float semantics: scores are compared on device with
:func:`pandelos_tpu.ops.exact_div.exact_div_f32` — bit-identical to the
host's IEEE f32 quotients — so the reference's float-equality comparisons
(score == per-(row, genome) maxima) behave exactly as on host.  The final
``.net`` scores are still computed on host from the shipped integer
accumulators (bit-exact); the genome-pair min/max statistics aggregate on
device (exact_div perc/tr quotients, so they equal the host divisions
bit-for-bit), with only mean/count left to a host bincount (float64).

Layout: rows live in width-sorted, shard-interleaved PERM order (as
produced by the mesh extraction); ``inv_perm`` maps gene id -> global
row position for the counterpart-maxima lookups, consistent with the
``all_gather(tiled=True)`` row order.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import KmerIndex
from pandelos_tpu.ops.exact_div import exact_div_f32

# module-level program cache (see ops/candidate.py: per-instance closures
# would defeat jax's jit cache)
_PROGRAMS: dict = {}


def _no_stats() -> bool:
    """PANDELOS_NO_PAIR_STATS=1 disables the per-genome-pair min/max
    stats aggregation (print-only diagnostics in the reference,
    Pangenes.java:130-143) — a perf lever for production runs that only
    need the network; edges are unaffected."""
    import os

    return os.environ.get("PANDELOS_NO_PAIR_STATS") == "1"


def _row_chunk(P: int) -> int:
    rc = min(1024, P)
    while P % rc:
        rc //= 2
    return rc


def _chunked_genome_multi(vals_ops, gsel, n_gen: int, rc: int):
    """Fused per-row genome reductions: [(values [P, K], op), ...] ->
    tuple of [P, n_gen], ONE pass sharing the [rc, K, n_gen] one-hot
    (op: "max" with neutral 0, "min" with neutral +inf)."""
    P, K = vals_ops[0][0].shape
    specs = [
        (
            v,
            jnp.max if op == "max" else jnp.min,
            jnp.float32(0.0) if op == "max" else jnp.float32(jnp.inf),
        )
        for v, op in vals_ops
    ]

    def body(ci, Ms):
        g = jax.lax.dynamic_slice(gsel, (ci * rc, 0), (rc, K))
        onehot = (
            g[:, :, None] == jnp.arange(n_gen, dtype=jnp.int32)[None, None, :]
        )
        out = []
        for (v, red, neutral), M in zip(specs, Ms):
            s = jax.lax.dynamic_slice(v, (ci * rc, 0), (rc, K))
            part = red(jnp.where(onehot, s[:, :, None], neutral), axis=1)
            out.append(
                jax.lax.dynamic_update_slice(M, part, (ci * rc, 0))
            )
        return tuple(out)

    M0 = tuple(
        jnp.full((P, n_gen), neutral, dtype=v.dtype)
        for v, _, neutral in specs
    )
    return jax.lax.fori_loop(0, P // rc, body, M0)


def _chunked_genome_max(score, gsel, n_gen: int, rc: int):
    """[P, K] scores + [P, K] genome ids -> [P, n_gen] per-row maxima."""
    return _chunked_genome_multi([(score, "max")], gsel, n_gen, rc)[0]


def _genome_segment_multi(rows_ops, g_rows, n_gen: int, rc: int):
    """Fused [P, n_gen] -> [n_gen, n_gen] segment reductions keyed by
    the row genome, sharing the one-hot."""
    P = rows_ops[0][0].shape[0]
    specs = [
        (
            m,
            jnp.max if op == "max" else jnp.min,
            jnp.maximum if op == "max" else jnp.minimum,
            jnp.float32(0.0) if op == "max" else jnp.float32(jnp.inf),
        )
        for m, op in rows_ops
    ]

    def body(ci, accs):
        g = jax.lax.dynamic_slice(g_rows, (ci * rc,), (rc,))
        onehot = (
            g[:, None] == jnp.arange(n_gen, dtype=jnp.int32)[None, :]
        )  # [C, n_gen]
        out = []
        for (m_all, red, comb, neutral), acc in zip(specs, accs):
            m = jax.lax.dynamic_slice(
                m_all, (ci * rc, 0), (rc, m_all.shape[1])
            )
            part = red(
                jnp.where(onehot[:, :, None], m[:, None, :], neutral),
                axis=0,
            )  # [n_gen(src), n_gen(dst)]
            out.append(comb(acc, part))
        return tuple(out)

    acc0 = tuple(
        jnp.full((n_gen, n_gen), neutral, dtype=m.dtype)
        for m, _, _, neutral in specs
    )
    return jax.lax.fori_loop(0, P // rc, body, acc0)


def _genome_segment_max(M_rows, g_rows, n_gen: int, rc: int):
    """[P, n_gen] per-row maxima + [P] row genomes -> [n_gen, n_gen]."""
    return _genome_segment_multi([(M_rows, "max")], g_rows, n_gen, rc)[0]


def _ims_and_aggregates(
    lt1_score, acc_cell, score, ap, atp, g_i, g_j, n_gen: int, rc: int,
    with_stats: bool,
):
    """inter_max_score + (optionally) the per-genome-pair stats
    aggregates over CANONICAL accepted cells, in ONE fused two-stage
    chunked reduction (the separate host ufunc passes measured ~0.7s at
    Mycoplasma scale; the separate device passes rebuilt the one-hot
    four times).  Stats matrices are in the canonical (genome of
    smaller id, genome of larger id) orientation; empty entries carry
    the stage neutrals (+inf / +inf / 0) — the host mirrors (m op m.T)
    and applies the reference's 1.0 inits."""
    if not with_stats:
        M2 = _chunked_genome_max(lt1_score, g_j, n_gen, rc)
        ims = _genome_segment_max(M2, g_i, n_gen, rc)
        z = jnp.zeros((n_gen, n_gen), jnp.float32)
        return ims, z, z, z
    inf = jnp.float32(jnp.inf)
    min_in = jnp.where(acc_cell, score, inf)
    minp_in = jnp.where(acc_cell, jnp.minimum(ap, atp), inf)
    maxp_in = jnp.where(acc_cell, jnp.maximum(ap, atp), 0.0)
    r = _chunked_genome_multi(
        [
            (lt1_score, "max"),
            (min_in, "min"),
            (minp_in, "min"),
            (maxp_in, "max"),
        ],
        g_j, n_gen, rc,
    )
    ims, gmin_s, gmin_p, gmax_p = _genome_segment_multi(
        [(r[0], "max"), (r[1], "min"), (r[2], "min"), (r[3], "max")],
        g_i, n_gen, rc,
    )
    return ims, gmin_s, gmin_p, gmax_p


def _bbh_local(
    grow_f,  # int32 [P] gene id per local row (>= n_true for padding)
    cand_f,  # int32 [P, K] candidate gene ids
    inter_rk,  # f32 [P, K] exact integer intersections
    perc_rk,  # f32 [P, K] exact integer perc counts (row side)
    tr_rk,  # f32 [P, K] exact integer tr counts (col side)
    valid_rk,  # bool [P, K]
    inv_perm,  # int32 [G_pad] gene id -> GLOBAL row position
    lens,  # f32 [G_pad] kseq lengths
    genome_of,  # int32 [G_pad]
    axis: str,
    n_gen: int,
    edge_cap: int,
):
    """Per-shard BBH with the cross-shard maxima collectives."""
    P, K = cand_f.shape
    rc = _row_chunk(P)
    lenA = lens[jnp.minimum(grow_f, lens.shape[0] - 1)]  # [P]
    lenB = lens[cand_f]  # [P, K]
    union = lenA[:, None] + lenB - inter_rk
    score = exact_div_f32(
        jnp.maximum(inter_rk, 1.0).astype(jnp.int32),
        jnp.maximum(union, 1.0).astype(jnp.int32),
    )
    score = jnp.where(valid_rk & (inter_rk > 0), score, 0.0)

    g_i = genome_of[jnp.minimum(grow_f, genome_of.shape[0] - 1)]  # [P]
    g_j = genome_of[cand_f]  # [P, K]

    M_local = _chunked_genome_max(score, g_j, n_gen, rc)  # [P, n_gen]
    # THE collective: every shard needs every row's maxima for the BBH
    # both-endpoint test (the reference's col_max_scores merge,
    # library.cpp:515; cross-thread merge Pangenes.java:103-104).
    # axis=None: single-device plain-jit mode, the gather is identity.
    if axis is None:
        M = M_local  # [P_total == P, n_gen]
    else:
        M = jax.lax.all_gather(M_local, axis, tiled=True)  # [P_total, n_gen]

    jpos = inv_perm[cand_f]  # [P, K] global row position of candidate
    M_at_gj = jnp.take_along_axis(M_local, g_j, axis=1)  # M[row, gen(j)]
    M_j_gi = M[jpos, g_i[:, None]]  # M[j, genome(i)]

    inter_genome = g_j != g_i[:, None]
    accept = (
        valid_rk
        & (score > 0)
        & inter_genome
        & (score == M_at_gj)
        & (score == M_j_gi)
    )

    # per-genome-pair max accepted score < 1.0 (Pangenes.java:116-118)
    # fused with the stats aggregates, merged across shards with
    # pmax/pmin.  Past 128 genomes only the edge-critical ims matrix is
    # aggregated — the O(n_gen^2) min/max stats matrices are print-only
    # diagnostics in the reference (Pangenes.java:130-143) and their
    # one-hot cost grows quadratically; the host path degrades at the
    # same bound (net.py) and compute_network_device omits
    # stats["genome_pairs"] then (tested: test_net_device.py
    # ::test_many_genomes_no_pair_stats).
    lt1v = jnp.where(accept & (score < 1.0), score, 0.0)
    acc_cell = accept & (cand_f > grow_f[:, None])
    with_stats = n_gen <= 128 and not _no_stats()
    if with_stats:
        ap = jnp.where(
            perc_rk > 0,
            exact_div_f32(
                jnp.maximum(perc_rk, 1.0).astype(jnp.int32),
                jnp.maximum(lenA[:, None], 1.0).astype(jnp.int32),
            ),
            0.0,
        )
        atp = jnp.where(
            tr_rk > 0,
            exact_div_f32(
                jnp.maximum(tr_rk, 1.0).astype(jnp.int32),
                jnp.maximum(lenB, 1.0).astype(jnp.int32),
            ),
            0.0,
        )
    else:
        ap = atp = score
    ims, gmin_s, gmin_p, gmax_p = _ims_and_aggregates(
        lt1v, acc_cell, score, ap, atp, g_i, g_j, n_gen, rc, with_stats
    )
    if axis is not None:
        ims = jax.lax.pmax(ims, axis)
        gmin_s = jax.lax.pmin(gmin_s, axis)
        gmin_p = jax.lax.pmin(gmin_p, axis)
        gmax_p = jax.lax.pmax(gmax_p, axis)

    # row threshold (Pangenes.java:146-155) — rows are shard-local
    thr_cell = ims[g_i[:, None], g_j]  # [P, K]
    row_thr = jnp.min(jnp.where(accept, thr_cell, jnp.inf), axis=1)  # [P]

    # intra: g_j == g_i, so M_at_gj is the row's intra-genome max and
    # M_j_gi the counterpart's (Pangenes.java:164-176)
    intra = (
        valid_rk
        & (score > 0)
        & (~inter_genome)
        & (grow_f[:, None] < cand_f)
        & (score == M_at_gj)
        & (score == M_j_gi)
        & (score >= row_thr[:, None])
    )

    # Emit each unordered cell ONCE (canonical col > row): accept and
    # intra are direction-symmetric (score, the two maxima tests and the
    # validity are all symmetric in (i, j)), so the mirrored emission the
    # host used to dedup away is pure fetch cost.  The host mirrors the
    # shipped cells for the genome-pair statistics.
    emask = (accept | intra) & (cand_f > grow_f[:, None])
    flat = emask.reshape(-1)
    (idx,) = jnp.nonzero(flat, size=edge_cap, fill_value=-1)
    safe = jnp.maximum(idx, 0)
    found = idx >= 0
    e_row = jnp.where(found, grow_f[safe // K], -1)
    e_col = cand_f.reshape(-1)[safe]
    e_inter = inter_rk.reshape(-1)[safe]
    # union/perc/tr are NOT shipped: the host derives union exactly from
    # the integer kseq lengths, and the perc/tr statistics aggregate on
    # device below
    e_acc = accept.reshape(-1)[safe] & found
    n_edges = jnp.sum(emask, dtype=jnp.int32)[None]
    n_valid = jnp.sum(score > 0, dtype=jnp.int32)[None]
    n_inter = jnp.sum(acc_cell, dtype=jnp.int32)[None]
    n_intra = jnp.sum(intra, dtype=jnp.int32)[None]
    return (
        e_row, e_col, e_inter, e_acc,
        n_edges, n_valid, n_inter, n_intra,
        ims, gmin_s, gmin_p, gmax_p,
    )


def _bbh_flat_local(
    grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
    inv_perm, lens, genome_of, axis, n_gen: int, edge_cap: int,
    steps: int = 1,
):
    """Flat-pair BBH: exact scores are computed ONCE per flatten_join
    pair (exact_div over [pair_cap], not per [rows, K] slot — the limb
    arithmetic is the expensive op), re-expanded to the [rows, K] maxima
    structure by a single gather; the emitted cells' integer counters
    are fetched from the flat arrays at their flat positions, so
    perc/tr/inter are never re-expanded at all.

    ``steps > 1`` is the RING composition (VERDICT r4 next #4): the
    extraction outputs carry a leading ring-step axis — each real row
    appears once per step, holding the candidates of that step's column
    shard.  Rows stay shard-local across steps, so the only additional
    structure is a max-merge of the per-(step, row) maxima over the
    step axis before the cross-shard ``all_gather``, and the same
    step-merge for the per-row threshold.  Every other computation
    treats (step, row) as an ordinary virtual row."""
    K = cand_l.shape[-1]
    gf = grow_l.reshape(-1)
    cf = cand_l.reshape(-1, K)
    nf = counts_l.reshape(-1)
    nf = jnp.where(nf > K, 0, nf)
    cs = jnp.cumsum(nf)
    base = cs - nf  # exclusive cumsum: same layout flatten_join used
    P = gf.shape[0]  # virtual rows (= steps * real rows)
    SR = P // steps  # real rows on this shard
    rc = _row_chunk(P)

    lenA = lens[jnp.minimum(pi, lens.shape[0] - 1)]
    lenB = lens[jnp.minimum(pj, lens.shape[0] - 1)]
    union = lenA + lenB - fi
    score_f = exact_div_f32(
        jnp.maximum(fi, 1.0).astype(jnp.int32),
        jnp.maximum(union, 1.0).astype(jnp.int32),
    )
    # score > 0 encodes exactly "validity-passing cell with shared
    # k-mers" (library.cpp:499-512) — the only predicate BBH needs
    score_f = jnp.where(fv & (fi > 0), score_f, 0.0)

    sidx = jnp.arange(K, dtype=jnp.int32)[None, :]
    slot_ok = sidx < nf[:, None]
    idx = jnp.minimum(base[:, None] + sidx, score_f.shape[0] - 1)
    score = jnp.where(slot_ok, score_f[idx], 0.0)  # [P, K]

    g_i = genome_of[jnp.minimum(gf, genome_of.shape[0] - 1)]
    g_j = genome_of[cf]
    M_virt = _chunked_genome_max(score, g_j, n_gen, rc)  # [P, n_gen]
    if steps == 1:
        M_row = M_virt
    else:
        # a real row's maxima span ALL ring steps (column shards)
        M_row = jnp.max(M_virt.reshape(steps, SR, n_gen), axis=0)
    if axis is None:
        M = M_row
    else:
        M = jax.lax.all_gather(M_row, axis, tiled=True)
    if steps == 1:
        M_grid = M_row
    else:
        M_grid = jnp.broadcast_to(
            M_row[None], (steps, SR, n_gen)
        ).reshape(P, n_gen)
    jpos = inv_perm[cf]
    M_at_gj = jnp.take_along_axis(M_grid, g_j, axis=1)
    M_j_gi = M[jpos, g_i[:, None]]
    inter_genome = g_j != g_i[:, None]
    accept = (
        (score > 0) & inter_genome & (score == M_at_gj) & (score == M_j_gi)
    )
    lt1v = jnp.where(accept & (score < 1.0), score, 0.0)
    acc_cell = accept & (cf > gf[:, None])
    # same >128-genome stats degradation as _bbh_local (see the comment
    # there); edges are unaffected
    with_stats = n_gen <= 128 and not _no_stats()
    if with_stats:
        # perc/tr fractions as EXACT IEEE quotients (host parity)
        apf = jnp.where(
            fp > 0,
            exact_div_f32(
                jnp.maximum(fp, 1.0).astype(jnp.int32),
                jnp.maximum(lenA, 1.0).astype(jnp.int32),
            ),
            0.0,
        )
        atpf = jnp.where(
            ft > 0,
            exact_div_f32(
                jnp.maximum(ft, 1.0).astype(jnp.int32),
                jnp.maximum(lenB, 1.0).astype(jnp.int32),
            ),
            0.0,
        )
        ap = jnp.where(slot_ok, apf[idx], 0.0)
        atp = jnp.where(slot_ok, atpf[idx], 0.0)
    else:
        ap = atp = score
    ims, gmin_s, gmin_p, gmax_p = _ims_and_aggregates(
        lt1v, acc_cell, score, ap, atp, g_i, g_j, n_gen, rc, with_stats
    )
    if axis is not None:
        ims = jax.lax.pmax(ims, axis)
        gmin_s = jax.lax.pmin(gmin_s, axis)
        gmin_p = jax.lax.pmin(gmin_p, axis)
        gmax_p = jax.lax.pmax(gmax_p, axis)
    thr_cell = ims[g_i[:, None], g_j]
    row_thr = jnp.min(jnp.where(accept, thr_cell, jnp.inf), axis=1)
    if steps > 1:
        # the threshold min spans the row's accepted cells in EVERY
        # ring step; merge over the step axis and broadcast back
        row_thr = jnp.broadcast_to(
            jnp.min(row_thr.reshape(steps, SR), axis=0)[None],
            (steps, SR),
        ).reshape(P)
    intra = (
        (score > 0)
        & (~inter_genome)
        & (gf[:, None] < cf)
        & (score == M_at_gj)
        & (score == M_j_gi)
        & (score >= row_thr[:, None])
    )
    # canonical emission (intra already is; accept is symmetric)
    emask = (accept | intra) & (cf > gf[:, None])
    flat = emask.reshape(-1)
    (eidx,) = jnp.nonzero(flat, size=edge_cap, fill_value=-1)
    safe = jnp.maximum(eidx, 0)
    found = eidx >= 0
    e_row = jnp.where(found, gf[safe // K], -1)
    e_col = cf.reshape(-1)[safe]
    fpos = jnp.minimum(
        base[safe // K] + (safe % K), score_f.shape[0] - 1
    )
    e_inter = fi[fpos]
    e_acc = accept.reshape(-1)[safe] & found
    n_edges = jnp.sum(emask, dtype=jnp.int32)[None]
    n_valid = jnp.sum(score_f > 0, dtype=jnp.int32)[None]
    # canonical counts (each canonical cell lives in exactly one shard:
    # its lower-id row's candidate list, on the shard owning that row)
    n_inter = jnp.sum(acc_cell, dtype=jnp.int32)[None]
    n_intra = jnp.sum(intra, dtype=jnp.int32)[None]
    return (
        e_row, e_col, e_inter, e_acc,
        n_edges, n_valid, n_inter, n_intra,
        ims, gmin_s, gmin_p, gmax_p,
    )


def _bbh_program(mesh, axis: str, n_gen: int, edge_cap: int, flat: bool,
                 ring_steps: int = 1):
    """shard_map BBH program.  ``flat`` consumes the flatten_join pair
    lists + counters directly (the pallas backend; see _bbh_flat_local);
    otherwise the [blocks, R, K] in-scan join outputs are used directly
    (the xla backend).  ``ring_steps > 1`` consumes ring-extraction
    outputs (leading step axis, rows sharded on the second axis)."""
    from jax.sharding import PartitionSpec as P

    # _no_stats() is traced into the program (with_stats), so it must
    # key the cache too — an env flip mid-process must not reuse a
    # program traced with the other stats mode
    key = ("bbh", mesh, axis, n_gen, edge_cap, flat, ring_steps,
           _no_stats())
    fn = _PROGRAMS.get(key)
    if fn is not None:
        return fn

    if mesh.size == 1:
        axis = None  # identity collectives in _bbh_local

    if flat:
        def local(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
                  inv_perm, lens, genome_of):
            return _bbh_flat_local(
                grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
                inv_perm, lens, genome_of, axis, n_gen, edge_cap,
                steps=ring_steps,
            )

    else:
        def local(grow_l, cand_l, inter_l, perc_l, tr_l, valid_l,
                  inv_perm, lens, genome_of):
            K = cand_l.shape[-1]
            return _bbh_local(
                grow_l.reshape(-1),
                cand_l.reshape(-1, K),
                inter_l.reshape(-1, K),
                perc_l.reshape(-1, K),
                tr_l.reshape(-1, K),
                valid_l.reshape(-1, K),
                inv_perm, lens, genome_of, axis, n_gen, edge_cap,
            )

    if mesh.size == 1:
        # Single-device: plain jit with identity collectives (axis=None
        # inside _bbh_local) — see ops/candidate.py _extract_program.
        fn = jax.jit(local)
    else:
        rep3 = (P(None), P(None), P(None))
        if flat and ring_steps > 1:
            in_specs = (
                P(None, axis, None),        # grow [steps, S*n, R]
                P(None, axis, None, None),  # cand
                P(None, axis, None),        # counts
                # pi, pj, inter, perc, tr, valid (flat pair arrays)
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            ) + rep3
        elif flat:
            in_specs = (
                P(axis, None),        # grow
                P(axis, None, None),  # cand
                P(axis, None),        # counts
                # pi, pj, inter, perc, tr, valid (flat pair arrays)
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            ) + rep3
        else:
            in_specs = (
                P(axis, None),
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None, None),
                P(axis, None, None),
            ) + rep3
        out_specs = (
            (P(axis),) * 4          # e_row, e_col, e_inter, e_acc
            + (P(axis),) * 4        # n_edges, n_valid, n_inter, n_intra
            # ims + 3 stats aggregates: pmin/pmax-merged, device-invariant
            + (P(None, None),) * 4
        )
        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )
    _PROGRAMS[key] = fn
    return fn


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def compute_network_device(
    index: KmerIndex, config: Optional[PipelineConfig] = None
):
    """Candidate engine + on-device BBH over the mesh.  Returns
    (edges, stats) with edges as canonical (a, b, host-exact f32 score)
    tuples, or None when a pathological candidate overflow requires the
    host cells path.

    Extraction runs with ``upper_only=False`` (each cell on both its
    rows) so the per-row maxima are complete without any scatter; on
    candidate-cap overflow the whole extraction reruns at the next
    power-of-two cap (overflow is rare; caps above 1024 fall back)."""
    from pandelos_tpu.ops.candidate import (
        _next_pow2,
        build_signatures,
        check_hbm_fit,
        get_runner,
    )
    from pandelos_tpu.ops.score import pad_profiles

    import os
    import time

    _trace = os.environ.get("PT_TIMING") == "1"
    _t0 = time.monotonic()
    _phase_s = {}

    def _mark(label):
        nonlocal _t0
        dt = time.monotonic() - _t0
        # phase times keyed without the parenthesized detail; kept in
        # stats["phase_s"] so the bench can publish per-phase achieved
        # throughput (join pairs/s, gather bytes/s, BBH div ops/s)
        _phase_s[label.split("(")[0]] = round(dt, 4)
        if _trace:
            print(f"[pt:bbh] {label}: {dt:.2f}s", flush=True)
        _t0 = time.monotonic()

    config = config or PipelineConfig()
    G = index.n_sequences
    if G == 0 or index.profile_ids.size == 0:
        return [], {"n_cells": 0}

    from pandelos_tpu.ops.candidate import _resolve_n_devices

    use_pallas = config.backend == "pallas"
    # Ring composition (VERDICT r4 next #4): with config.ring_extract on
    # a multi-device mesh, the extraction column-shards + rotates the
    # signatures (ops/ring.py) instead of replicating them, and the BBH
    # consumes the step-axis outputs directly (_bbh_flat_local steps).
    use_ring = (
        bool(config.ring_extract)
        and use_pallas
        and max(1, _resolve_n_devices(config)) >= 2
    )
    check_hbm_fit(index, config, ring=use_ring)
    row_block = min(config.row_block, _round_up(G, 8))
    col_block = min(config.col_block, _round_up(G, 128))
    padded = pad_profiles(index, row_block, col_block)
    _mark("setup.pad_profiles")
    G_pad = padded.ids.shape[0]

    if use_ring:
        from pandelos_tpu.ops.pallas_hist import pick_buckets
        from pandelos_tpu.ops.ring import _ring_extract_program

        n_buckets, shift = pick_buckets(
            index.vocab_size, max(1, index.max_profile_len), index.k,
            n_genes=G_pad,
        )
        # signatures are built INSIDE the ring program per column shard;
        # the runner's replicated signature upload is bypassed
        sig_stub = np.zeros((1, 1), dtype=np.float32)
        runner = get_runner(index, padded, sig_stub, config, tag="ring")
        n_dev = runner.n_dev
        if G_pad % n_dev:
            raise ValueError(
                f"G_pad={G_pad} not divisible by n_devices={n_dev}; "
                f"choose a col_block divisible by the device count"
            )
        Gc = G_pad // n_dev
        _mark("setup.runner(upload)")
        _mark("setup.signatures")
    else:
        # runner first: the signature histogram then reads the runner's
        # own device-resident profiles instead of re-uploading them
        runner = get_runner(index, padded, None, config)
        _mark("setup.runner(upload)")
        sig_mass, _, _ = build_signatures(
            index, padded, config,
            ids_d=runner.all_ids, counts_d=runner.all_counts,
        )
        runner.set_sig(sig_mass)
        _mark("setup.signatures")

    widths = np.diff(index.profile_ptr)
    perm = np.argsort(widths, kind="stable").astype(np.int32)
    n_blocks = -(-G // row_block)
    perm_pad = np.full(n_blocks * row_block, G, dtype=np.int32)
    perm_pad[:G] = perm
    perm_ext = np.concatenate(
        [perm_pad, np.full(row_block, G, dtype=np.int32)]
    )
    starts = np.arange(0, n_blocks * row_block, row_block, np.int32)

    K = config.candidate_cap
    ring_steps = 1
    if use_ring:
        sg = runner._pad_starts(starts, len(perm_ext) - row_block)
        S = len(sg) // n_dev
        while True:
            rfn = _ring_extract_program(
                runner.mesh, runner.axis, row_block, S, K, G,
                2 * index.k, n_buckets, shift, Gc, padded.width, n_dev,
                upper_only=False,
            )
            grow_d, cand_d, counts_d = rfn(
                runner.all_ids, runner.all_counts, runner.col_lens,
                runner._replicate(np.asarray(perm_ext, np.int32)),
                runner._shard0(sg),
            )
            counts_h3 = runner.fetch(counts_d)  # [steps, S*n, R]
            grow_rows = np.stack(
                [perm_ext[s : s + row_block] for s in sg]
            )  # [S*n, R] real rows
            grow_steps = np.broadcast_to(
                grow_rows[None], counts_h3.shape
            )
            over = (counts_h3 > K) & (grow_steps < G)
            if not np.any(over):
                break
            K = _next_pow2(int(counts_h3[over].max()))
            if K > 1024:
                return None  # pathological: use the host cells path
        counts_h = counts_h3.reshape(-1)  # step-major virtual rows
        grow_h = grow_rows.reshape(-1)  # REAL rows (inv_perm source)
        grow_virt_h = grow_steps.reshape(-1)
        ring_steps = n_dev
    else:
        use_T = use_pallas and runner.use_bound_bits(
            len(starts), row_block
        )
        while True:
            if use_pallas:
                grow_d, cand_d, counts_d = runner.extract(
                    perm_ext, starts, row_block, padded.width, K,
                    do_join=False, upper_only=False, from_T=use_T,
                )
            else:
                (grow_d, cand_d, inter_d, perc_d, tr_d, valid_d,
                 counts_d) = runner.extract(
                    perm_ext, starts, row_block, padded.width, K,
                    do_join=True, upper_only=False,
                )
            counts_h = runner.fetch(counts_d).reshape(-1)
            grow_h = runner.grow_layout(
                perm_ext, starts, row_block
            ).reshape(-1)
            over = (counts_h > K) & (grow_h < G)
            if not np.any(over):
                break
            K = _next_pow2(int(counts_h[over].max()))
            if K > 1024:
                return None  # pathological: use the host cells path
        grow_virt_h = grow_h
    _mark(f"extract(K={K})")

    if use_pallas:
        if use_ring:
            # per-shard pair totals: rows are sharded contiguously on
            # the second (S*n) axis, steps replicate on the first
            nf3 = np.where(counts_h3 > K, 0, counts_h3)
            per_shard_ring = (
                nf3.reshape(ring_steps, n_dev, S, row_block)
                .sum(axis=(0, 2, 3), dtype=np.int64)
            )
            pair_cap, chunk = runner.pair_capacity_from_worst(
                int(per_shard_ring.max(initial=0))
            )
            from jax.sharding import NamedSharding, PartitionSpec as P

            grow_v = jax.device_put(
                np.ascontiguousarray(grow_steps.astype(np.int32)),
                NamedSharding(runner.mesh, P(None, runner.axis, None)),
            )
            fpi, fpj, fi, fp, ft, fv = runner.flatten_join(
                grow_v, cand_d, counts_d, K, pair_cap, chunk, ring=True
            )
            grow_d = grow_v  # the BBH consumes the step-axis layout
        else:
            pair_cap, chunk = runner.pair_capacity(counts_h, K)
            fpi, fpj, fi, fp, ft, fv = runner.flatten_join(
                grow_d, cand_d, counts_d, K, pair_cap, chunk
            )
        if _trace:
            np.asarray(fi[:8])  # sync point: isolates the join time
        _mark(f"flatten_join(pair_cap={pair_cap})")

    # gene -> global row position (consistent with all_gather row order)
    inv_perm = np.zeros(G_pad, dtype=np.int32)
    real = grow_h < G
    inv_perm[grow_h[real]] = np.flatnonzero(real).astype(np.int32)

    lens_pad = np.zeros(G_pad, dtype=np.float32)
    lens_pad[:G] = index.kseq_lengths
    genome_pad = np.zeros(G_pad, dtype=np.int32)
    genome_pad[:G] = index.seq_genome

    n_gen = index.n_genomes
    inv_perm_r = runner._replicate(inv_perm)
    lens_r = runner._replicate(lens_pad)
    genome_r = runner._replicate(genome_pad)

    # Canonical emission: every emitted cell is valid, valid pairs pass
    # the bound in both orientations, so globally emitted cells <= half
    # the candidate slots — exact on one device; per shard a pair's
    # mirror slot can sit elsewhere, so the doubling loop below remains
    # as safety.  (The old 8*G heuristic was exceeded on every
    # Mycoplasma-scale call, silently re-running the whole BBH program
    # at a doubled cap each time.)
    if use_ring:
        per_shard_pairs = per_shard_ring
    else:
        nf_cap = np.minimum(counts_h, K)
        per_shard_pairs = nf_cap.reshape(runner.n_dev, -1).sum(
            axis=1, dtype=np.int64
        )
    edge_cap = max(
        1 << 14, _next_pow2(int(per_shard_pairs.max(initial=0)) // 2 + 1)
    )
    # test hook: force a small initial cap so the doubling loop actually
    # executes at scale (exercised by dryrun_multichip step 6)
    cap_env = os.environ.get("PANDELOS_EDGE_CAP_INIT")
    if cap_env:
        edge_cap = _next_pow2(int(cap_env))
    edge_cap_initial = edge_cap
    while True:
        fn = _bbh_program(
            runner.mesh, runner.axis, n_gen, edge_cap, use_pallas,
            ring_steps=ring_steps,
        )
        if use_pallas:
            outs = fn(
                grow_d, cand_d, counts_d, fpi, fpj, fi, fp, ft, fv,
                inv_perm_r, lens_r, genome_r,
            )
        else:
            outs = fn(
                grow_d, cand_d, inter_d, perc_d, tr_d, valid_d,
                inv_perm_r, lens_r, genome_r,
            )
        (e_row, e_col, e_inter, e_acc,
         n_edges, n_valid, n_inter_d, n_intra_d,
         ims, gmin_s, gmin_p, gmax_p) = outs
        n_edges_h = runner.fetch(n_edges)
        if int(n_edges_h.max(initial=0)) <= edge_cap:
            break
        edge_cap = _next_pow2(int(n_edges_h.max()))
    _mark(f"bbh(edge_cap={edge_cap})")

    # --- ship the accepted cells.  The tunnel runs ~30-45MB/s down, so
    # the edge arrays are bit-packed on device when they fit (13B -> 8B
    # per slot: (row+1)<<16|col, inter<<1|acc — perc/tr never cross, the
    # genome-pair min/max stats aggregated on device) and, on a single
    # device, sliced to the known edge count before fetching.
    pack_ok = (
        G < 65535
        and int(np.asarray(index.kseq_lengths).max(initial=0)) < 2**24
        # test hook: force the unpacked fetch branch at small G
        # (test_net_device.py::test_unpacked_edge_fetch_branch)
        and os.environ.get("PANDELOS_NO_EDGE_PACK") != "1"
    )
    if pack_ok:
        key = ("packe", runner.mesh)
        pfn = _PROGRAMS.get(key)
        if pfn is None:
            def _pack(r, c, i, a):
                rc = jnp.where(r >= 0, ((r + 1) << 16) | c, 0)
                ia = (i.astype(jnp.int32) << 1) | a.astype(jnp.int32)
                return rc, ia

            pfn = jax.jit(_pack)
            _PROGRAMS[key] = pfn
        rc_d, ia_d = pfn(e_row, e_col, e_inter, e_acc)
        if runner.n_dev == 1 and jax.process_count() == 1:
            n_fetch = min(
                edge_cap, _round_up(int(n_edges_h.max(initial=0)) + 1, 4096)
            )
            rc_d, ia_d = (x[:n_fetch] for x in (rc_d, ia_d))
        (rc_h, ia_h, ims_h, gmin_s_h, gmin_p_h, gmax_p_h, n_valid_h,
         n_inter_h, n_intra_h) = runner.fetch_many(
            rc_d, ia_d, ims, gmin_s, gmin_p, gmax_p, n_valid,
            n_inter_d, n_intra_d,
        )
        rc_u = rc_h.view(np.uint32)
        keep_mask = rc_u != 0
        e_row = np.where(keep_mask, (rc_u >> 16).astype(np.int64) - 1, -1)
        e_col = (rc_u & 0xFFFF).astype(np.int64)
        e_inter = (ia_h >> 1).astype(np.int64)
        e_acc = (ia_h & 1).astype(bool)
    else:
        (e_row, e_col, e_inter, e_acc, ims_h, gmin_s_h, gmin_p_h,
         gmax_p_h, n_valid_h, n_inter_h, n_intra_h) = runner.fetch_many(
            e_row, e_col, e_inter, e_acc, ims, gmin_s, gmin_p, gmax_p,
            n_valid, n_inter_d, n_intra_d,
        )
    keep = e_row >= 0
    e_row = e_row[keep].astype(np.int64)
    e_col = e_col[keep].astype(np.int64)
    e_inter = e_inter[keep].astype(np.int64)
    # union derived host-side from the exact integer kseq lengths
    # (union = |A| + |B| - inter); saves one [edge_cap] device fetch.
    # Invariants the derivation relies on: the device-side accept
    # decision used f32 lens (exact only below 2^24), and every kept
    # edge must reference a real gene (padding profiles yield inter=0,
    # so score>0 filters them — made explicit here).
    assert int(np.asarray(index.kseq_lengths).max(initial=0)) < 2**24
    assert int(e_row.max(initial=-1)) < G and int(e_col.max(initial=-1)) < G
    lens_i64 = np.asarray(index.kseq_lengths, np.int64)
    e_union = lens_i64[e_row] + lens_i64[e_col] - e_inter
    e_acc = e_acc[keep]
    _mark(f"fetch(edges={int(keep.sum())})")

    # host-exact f32 scores + canonical dedup (PangeneNet.java:167-174).
    # Single shard: the device emitted each cell exactly once (canonical
    # col > row), so keys are already unique — an argsort replaces the
    # np.unique (the sort-and-scan dominated the post-fetch host tail).
    scores = e_inter.astype(np.float32) / e_union.astype(np.float32)
    a = np.minimum(e_row, e_col)
    b = np.maximum(e_row, e_col)
    key = (a << np.int64(32)) | b
    if runner.n_dev == 1 and jax.process_count() == 1:
        first = np.argsort(key, kind="stable")
        uk = key[first]
    else:
        uk, first = np.unique(key, return_index=True)
    from pandelos_tpu.io.net import EdgeList

    edges = EdgeList(
        uk >> np.int64(32),
        uk & np.int64(0xFFFFFFFF),
        scores[first].astype(np.float64),
    )
    _mark("host.edges")

    # genome-pair statistics — the same aggregates the host path
    # produces (net.py build_network, mirroring Pangenes.java:130-143's
    # prints).  The device aggregated the min/max families over the
    # canonical accepted cells (with exact IEEE perc/tr quotients);
    # accepted cells count from BOTH orientations in the reference, so
    # the canonical matrices mirror here as (m op m.T).  Only mean/count
    # remain host-side (float64 accumulation), via np.bincount over the
    # shipped cells.
    if runner.n_dev == 1 and jax.process_count() == 1:
        # keys already unique (single canonical emission)
        n_inter_edges = int(e_acc.sum())
        n_intra_edges = int((~e_acc).sum())
    else:
        n_inter_edges = int(np.unique(key[e_acc]).size)
        n_intra_edges = int(np.unique(key[~e_acc]).size)
    n_acc_canonical = int(n_inter_h.sum())
    stats = {
        "n_cells": int(n_valid_h.sum()),
        # the reference sees each accepted inter-genome cell from both
        # rows' passes
        "n_accepted_inter_cells": 2 * n_acc_canonical,
        "n_inter_edges": n_inter_edges,
        "n_intra_edges": n_intra_edges,
        "n_edges": len(edges),
        # ordered candidate pairs actually joined (work-model input for
        # the bench's VPU join-op accounting)
        "n_joined_pairs": int(
            np.minimum(counts_h, K)[grow_virt_h < G].sum(dtype=np.int64)
        ),
        "device_bbh": True,
        "ring_extract": bool(use_ring),
        "n_devices": runner.n_dev,
        "phase_s": dict(_phase_s),
        "candidate_cap_final": int(K),
        "edge_cap_initial": int(edge_cap_initial),
        "pair_cap": int(pair_cap) if use_pallas else None,
        "lane_D": int(runner.lane_D) if use_pallas else None,
        # lane_table_cols only when the lane2 table actually exists —
        # touching the lazy all_lane2 property under the lane/roll
        # fallback would build an unused (and, for unpackable counts,
        # overflowing) second table on device
        "lane_table_cols": (
            int(runner.all_lane2.shape[1])
            if use_pallas and runner.join_kernel == "lane2" else None
        ),
        "edge_cap": int(edge_cap),
    }
    if n_gen <= 128 and not _no_stats() and n_acc_canonical > 0:
        acc_i = e_row[e_acc]
        acc_j = e_col[e_acc]
        asc = scores[e_acc].astype(np.float64)
        sg = np.asarray(index.seq_genome)
        bins = sg[acc_i] * n_gen + sg[acc_j]
        S = np.bincount(bins, weights=asc, minlength=n_gen * n_gen)
        C = np.bincount(bins, minlength=n_gen * n_gen)
        gp_sum = S.reshape(n_gen, n_gen)
        gp_sum = gp_sum + gp_sum.T
        gp_cnt = C.reshape(n_gen, n_gen).astype(np.int64)
        gp_cnt = gp_cnt + gp_cnt.T
        # device matrices carry stage neutrals (+inf / 0) at empty
        # entries; the reference inits everything at 1.0, and max_perc's
        # init dominates (perc fractions <= 1.0 — the host-path quirk)
        gp_min = np.minimum(
            np.minimum(gmin_s_h, gmin_s_h.T), np.float32(1.0)
        )
        gp_minp = np.minimum(
            np.minimum(gmin_p_h, gmin_p_h.T), np.float32(1.0)
        )
        gp_maxp = np.maximum(
            np.maximum(gmax_p_h, gmax_p_h.T), np.float32(1.0)
        )
        with np.errstate(invalid="ignore"):
            gp_mean = np.where(gp_cnt > 0, gp_sum / np.maximum(gp_cnt, 1), 0.0)
        stats["genome_pairs"] = {
            "mean_score": gp_mean.round(6).tolist(),
            "min_score": gp_min.astype(float).tolist(),
            "max_score_lt1": ims_h.astype(float).tolist(),
            "min_perc": gp_minp.astype(float).tolist(),
            "max_perc": gp_maxp.astype(float).tolist(),
            "accepted_cells": gp_cnt.tolist(),
        }
    _mark("host.stats")
    return edges, stats
