"""Ablation attribution of the production device-BBH program: run
_bbh_flat_local variants with stages removed on the real bench inputs.

Usage: python scripts/bbh_ablate_probe.py [preset]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import read_faa
from pandelos_tpu.ksel import select_k
from pandelos_tpu.ops.candidate import build_signatures, get_runner
from pandelos_tpu.ops.exact_div import exact_div_f32
from pandelos_tpu.ops.net_device import (
    _bbh_flat_local, _chunked_genome_max, _ims_and_aggregates, _row_chunk,
)
from pandelos_tpu.ops.score import pad_profiles

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ds = read_faa(os.path.join(here, "bench_cache", f"{preset}.faa"))
k = select_k(ds.sequences)
index = build_index(ds, k=k)
G = index.n_sequences
cfg = PipelineConfig(backend="pallas", row_block=256, col_block=512,
                     device_bbh=True)
padded = pad_profiles(index, 256, 512)
runner = get_runner(index, padded, None, cfg)
sig, _, _ = build_signatures(index, padded, cfg,
                             ids_d=runner.all_ids, counts_d=runner.all_counts)
runner.set_sig(sig)
R = 256
n_blocks = -(-G // R)
widths = np.diff(index.profile_ptr)
perm = np.argsort(widths, kind="stable").astype(np.int32)
perm_pad = np.full(n_blocks * R, G, dtype=np.int32)
perm_pad[:G] = perm
perm_ext = np.concatenate([perm_pad, np.full(R, G, np.int32)])
starts = np.arange(0, n_blocks * R, R, np.int32)
K = 128
grow_d, cand_d, counts_d = runner.extract(
    perm_ext, starts, R, padded.width, K,
    do_join=False, upper_only=False, from_T=True)
counts_h = runner.fetch(counts_d).reshape(-1)
pair_cap, chunk = runner.pair_capacity(counts_h, K)
fpi, fpj, fi, fp, ft, fv = runner.flatten_join(
    grow_d, cand_d, counts_d, K, pair_cap, chunk)
jax.block_until_ready(fi)
n_gen = index.n_genomes
G_pad = padded.ids.shape[0]
edge_cap = 1 << 20
grow_h = runner.grow_layout(perm_ext, starts, R).reshape(-1)
inv_perm = np.zeros(G_pad, np.int32)
real = grow_h < G
inv_perm[grow_h[real]] = np.flatnonzero(real).astype(np.int32)
lens_pad = np.zeros(G_pad, np.float32)
lens_pad[:G] = index.kseq_lengths
genome_pad = np.zeros(G_pad, np.int32)
genome_pad[:G] = index.seq_genome
inv_perm_d = jnp.asarray(inv_perm)
lens_d = jnp.asarray(lens_pad)
genome_d = jnp.asarray(genome_pad)

args = (grow_d, cand_d, counts_d, fpi, fpj, fi, fp, ft, fv,
        inv_perm_d, lens_d, genome_d)


def timed(name, fn, reps=3):
    t0 = time.monotonic()
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.monotonic()
    best = float("inf")
    for _ in range(reps):
        ta = time.monotonic()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - ta)
    print(f"{name}: cold {t1 - t0:.2f}s warm {best * 1e3:.1f}ms", flush=True)


@jax.jit
def full(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
         inv_perm, lens, genome_of):
    return _bbh_flat_local(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft,
                           fv, inv_perm, lens, genome_of, None, n_gen,
                           edge_cap)


timed("full _bbh_flat_local", full)


def make_variant(do_stats=True, do_emit=True, do_mjgi=True, do_ims=True):
    def var(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
            inv_perm, lens, genome_of):
        K_ = cand_l.shape[-1]
        gf = grow_l.reshape(-1)
        cf = cand_l.reshape(-1, K_)
        nf = counts_l.reshape(-1)
        nf = jnp.where(nf > K_, 0, nf)
        cs = jnp.cumsum(nf)
        base = cs - nf
        P = gf.shape[0]
        rc = _row_chunk(P)
        lenA = lens[jnp.minimum(pi, lens.shape[0] - 1)]
        lenB = lens[jnp.minimum(pj, lens.shape[0] - 1)]
        union = lenA + lenB - fi
        score_f = exact_div_f32(
            jnp.maximum(fi, 1.0).astype(jnp.int32),
            jnp.maximum(union, 1.0).astype(jnp.int32))
        score_f = jnp.where(fv & (fi > 0), score_f, 0.0)
        sidx = jnp.arange(K_, dtype=jnp.int32)[None, :]
        slot_ok = sidx < nf[:, None]
        idx = jnp.minimum(base[:, None] + sidx, score_f.shape[0] - 1)
        score = jnp.where(slot_ok, score_f[idx], 0.0)
        g_i = genome_of[jnp.minimum(gf, genome_of.shape[0] - 1)]
        g_j = genome_of[cf]
        M_local = _chunked_genome_max(score, g_j, n_gen, rc)
        M_at_gj = jnp.take_along_axis(M_local, g_j, axis=1)
        if do_mjgi:
            jpos = inv_perm[cf]
            M_j_gi = M_local[jnp.minimum(jpos, P - 1), g_i[:, None]]
        else:
            M_j_gi = M_at_gj
        inter_genome = g_j != g_i[:, None]
        accept = ((score > 0) & inter_genome & (score == M_at_gj)
                  & (score == M_j_gi))
        lt1v = jnp.where(accept & (score < 1.0), score, 0.0)
        acc_cell = accept & (cf > gf[:, None])
        if do_stats:
            apf = exact_div_f32(jnp.maximum(fp, 1.0).astype(jnp.int32),
                                jnp.maximum(lenA, 1.0).astype(jnp.int32))
            apf = jnp.where(fp > 0, apf, 0.0)
            atpf = exact_div_f32(jnp.maximum(ft, 1.0).astype(jnp.int32),
                                 jnp.maximum(lenB, 1.0).astype(jnp.int32))
            atpf = jnp.where(ft > 0, atpf, 0.0)
            ap = jnp.where(slot_ok, apf[idx], 0.0)
            atp = jnp.where(slot_ok, atpf[idx], 0.0)
        else:
            ap = atp = score
        if do_ims:
            ims, gmin_s, gmin_p, gmax_p = _ims_and_aggregates(
                lt1v, acc_cell, score, ap, atp, g_i, g_j, n_gen, rc,
                do_stats)
        else:
            ims = jnp.zeros((n_gen, n_gen), jnp.float32)
            gmin_s = gmin_p = gmax_p = ims
        thr_cell = ims[g_i[:, None], g_j]
        row_thr = jnp.min(jnp.where(accept, thr_cell, jnp.inf), axis=1)
        intra = ((score > 0) & (~inter_genome) & (gf[:, None] < cf)
                 & (score == M_at_gj) & (score == M_j_gi)
                 & (score >= row_thr[:, None]))
        emask = (accept | intra) & (cf > gf[:, None])
        if do_emit:
            flat = emask.reshape(-1)
            (eidx,) = jnp.nonzero(flat, size=edge_cap, fill_value=-1)
            safe = jnp.maximum(eidx, 0)
            e_row = jnp.where(eidx >= 0, gf[safe // K_], -1)
            e_col = cf.reshape(-1)[safe]
            e_inter = fi[jnp.minimum(base[safe // K_] + (safe % K_),
                                     score_f.shape[0] - 1)]
        else:
            e_row = e_col = e_inter = jnp.zeros((8,), jnp.int32)
        n_edges = jnp.sum(emask, dtype=jnp.int32)[None]
        return (e_row, e_col, e_inter, n_edges, ims, gmin_s, gmin_p,
                gmax_p)

    return jax.jit(var)


timed("variant full-equiv", make_variant())
timed("no M_j_gi (skip inv_perm gather)", make_variant(do_mjgi=False))
timed("no stats (score-only ims)", make_variant(do_stats=False))
timed("no ims/aggregates at all", make_variant(do_ims=False))
timed("no emission", make_variant(do_emit=False))


def make_floor(stage):
    def var(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
            inv_perm, lens, genome_of):
        K_ = cand_l.shape[-1]
        gf = grow_l.reshape(-1)
        cf = cand_l.reshape(-1, K_)
        nf = counts_l.reshape(-1)
        nf = jnp.where(nf > K_, 0, nf)
        cs = jnp.cumsum(nf)
        base = cs - nf
        P = gf.shape[0]
        rc = _row_chunk(P)
        lenA = lens[jnp.minimum(pi, lens.shape[0] - 1)]
        lenB = lens[jnp.minimum(pj, lens.shape[0] - 1)]
        union = lenA + lenB - fi
        score_f = exact_div_f32(
            jnp.maximum(fi, 1.0).astype(jnp.int32),
            jnp.maximum(union, 1.0).astype(jnp.int32))
        score_f = jnp.where(fv & (fi > 0), score_f, 0.0)
        if stage == "div":
            return jnp.sum(score_f)
        sidx = jnp.arange(K_, dtype=jnp.int32)[None, :]
        slot_ok = sidx < nf[:, None]
        idx = jnp.minimum(base[:, None] + sidx, score_f.shape[0] - 1)
        score = jnp.where(slot_ok, score_f[idx], 0.0)
        if stage == "expand":
            return jnp.sum(score)
        g_i = genome_of[jnp.minimum(gf, genome_of.shape[0] - 1)]
        g_j = genome_of[cf]
        M_local = _chunked_genome_max(score, g_j, n_gen, rc)
        if stage == "mlocal":
            return jnp.sum(M_local)
        M_at_gj = jnp.take_along_axis(M_local, g_j, axis=1)
        inter_genome = g_j != g_i[:, None]
        accept = ((score > 0) & inter_genome & (score == M_at_gj))
        if stage == "accept":
            return jnp.sum(accept)
        row_thr = jnp.min(jnp.where(accept, score, jnp.inf), axis=1)
        intra = ((score > 0) & (~inter_genome) & (gf[:, None] < cf)
                 & (score == M_at_gj) & (score >= row_thr[:, None]))
        emask = (accept | intra) & (cf > gf[:, None])
        return jnp.sum(emask)

    return jax.jit(var)


for st in ("div", "expand", "mlocal", "accept", "all"):
    timed(f"floor:{st}", make_floor(st))


# --- layout check: same values, freshly device_put plain arrays
import jax.numpy as _jnp
args_fresh = tuple(
    jax.device_put(np.asarray(a)) for a in args
)
print("inputs re-device_put:", flush=True)

def timed_fresh(name, fn, reps=3):
    out = fn(*args_fresh)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        ta = time.monotonic()
        out = fn(*args_fresh)
        jax.block_until_ready(out)
        best = min(best, time.monotonic() - ta)
    print(f"{name}: warm {best * 1e3:.1f}ms", flush=True)


timed_fresh("fresh floor:div", make_floor("div"))
timed_fresh("fresh floor:expand", make_floor("expand"))
timed_fresh("fresh floor:all", make_floor("all"))
timed_fresh("fresh full", full)


@jax.jit
def trivial(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
            inv_perm, lens, genome_of):
    return jnp.sum(pi)


timed("trivial 12-arg sum", trivial)


@jax.jit
def trivial_cand(grow_l, cand_l, counts_l, pi, pj, fi, fp, ft, fv,
                 inv_perm, lens, genome_of):
    return jnp.sum(cand_l), jnp.sum(fi)


timed("trivial sum(cand)+sum(fi)", trivial_cand)
