"""Attribute the device-BBH program's warm time (VERDICT r4 next #6):
exact_div passes, [P, K] expansion, maxima one-hot reductions, and the
nonzero emission, at real bench shapes.

Usage: python scripts/bbh_split_probe.py [preset]
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
    _chunked_genome_max, _chunked_genome_multi, _genome_segment_multi,
    _row_chunk,
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
P = n_blocks * R
rc = _row_chunk(P)
edge_cap = 1 << 20
print(f"P={P} K={K} pair_cap={pair_cap} rc={rc} n_gen={n_gen}", flush=True)

G_pad = padded.ids.shape[0]
lens_pad = np.zeros(G_pad, np.float32)
lens_pad[:G] = index.kseq_lengths
genome_pad = np.zeros(G_pad, np.int32)
genome_pad[:G] = index.seq_genome
lens_r = jnp.asarray(lens_pad)
genome_r = jnp.asarray(genome_pad)
grow_f = jnp.asarray(runner.grow_layout(perm_ext, starts, R).reshape(-1))
cand_f = cand_d.reshape(-1, K)
nf_d = jnp.minimum(counts_d.reshape(-1), K)


def timed(name, fn, *args, reps=3):
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
    return out


@jax.jit
def stage_scores(pi, pj, fi, fv, lens):
    lenA = lens[jnp.minimum(pi, lens.shape[0] - 1)]
    lenB = lens[jnp.minimum(pj, lens.shape[0] - 1)]
    union = lenA + lenB - fi
    score_f = exact_div_f32(
        jnp.maximum(fi, 1.0).astype(jnp.int32),
        jnp.maximum(union, 1.0).astype(jnp.int32))
    return jnp.where(fv & (fi > 0), score_f, 0.0)


score_f = timed("scores (1x exact_div over pair_cap)", stage_scores,
                fpi, fpj, fi, fv, lens_r)


@jax.jit
def stage_div3(pi, pj, fi, fp, ft, fv, lens):
    s = stage_scores(pi, pj, fi, fv, lens)
    lenA = lens[jnp.minimum(pi, lens.shape[0] - 1)]
    lenB = lens[jnp.minimum(pj, lens.shape[0] - 1)]
    ap = exact_div_f32(jnp.maximum(fp, 1.0).astype(jnp.int32),
                       jnp.maximum(lenA, 1.0).astype(jnp.int32))
    atp = exact_div_f32(jnp.maximum(ft, 1.0).astype(jnp.int32),
                        jnp.maximum(lenB, 1.0).astype(jnp.int32))
    return s, ap, atp


timed("scores+perc+tr (3x exact_div)", stage_div3,
      fpi, fpj, fi, fp, ft, fv, lens_r)


@jax.jit
def stage_expand(score_f, nf, grow_f):
    cs = jnp.cumsum(nf)
    base = cs - nf
    sidx = jnp.arange(K, dtype=jnp.int32)[None, :]
    slot_ok = sidx < nf[:, None]
    idx = jnp.minimum(base[:, None] + sidx, score_f.shape[0] - 1)
    return jnp.where(slot_ok, score_f[idx], 0.0)


score_pk = timed("expand [P,K] slot gather", stage_expand,
                 score_f, nf_d, grow_f)


@jax.jit
def stage_maxima(score_pk, cand_f, grow_f, genome_of):
    g_i = genome_of[jnp.minimum(grow_f, genome_of.shape[0] - 1)]
    g_j = genome_of[cand_f]
    M_local = _chunked_genome_max(score_pk, g_j, n_gen, rc)
    M_at_gj = jnp.take_along_axis(M_local, g_j, axis=1)
    jpos = jnp.zeros(G_pad, jnp.int32)[cand_f]
    return M_local, M_at_gj, jpos


timed("maxima (one-hot genome max + gathers)", stage_maxima,
      score_pk, cand_f, grow_f, genome_r)


@jax.jit
def stage_ims(score_pk, cand_f, grow_f, genome_of):
    g_i = genome_of[jnp.minimum(grow_f, genome_of.shape[0] - 1)]
    g_j = genome_of[cand_f]
    acc = score_pk > 0
    r = _chunked_genome_multi(
        [(score_pk, "max"),
         (jnp.where(acc, score_pk, jnp.inf), "min"),
         (jnp.where(acc, score_pk, jnp.inf), "min"),
         (jnp.where(acc, score_pk, 0.0), "max")],
        g_j, n_gen, rc)
    return _genome_segment_multi(
        [(r[0], "max"), (r[1], "min"), (r[2], "min"), (r[3], "max")],
        g_i, n_gen, rc)


timed("ims+stats (4-way fused one-hots)", stage_ims,
      score_pk, cand_f, grow_f, genome_r)


@jax.jit
def stage_emit(score_pk, cand_f, grow_f):
    emask = (score_pk > 0) & (cand_f > grow_f[:, None])
    flat = emask.reshape(-1)
    (eidx,) = jnp.nonzero(flat, size=edge_cap, fill_value=-1)
    safe = jnp.maximum(eidx, 0)
    e_col = cand_f.reshape(-1)[safe]
    return eidx, e_col


timed("emission (nonzero size=1M over P*K)", stage_emit,
      score_pk, cand_f, grow_f)


@jax.jit
def stage_onehot_only(score_pk, cand_f, genome_of):
    g_j = genome_of[cand_f]
    return _chunked_genome_max(score_pk, g_j, n_gen, rc)


timed("onehot genome-max only", stage_onehot_only,
      score_pk, cand_f, genome_r)


@jax.jit
def stage_onehot_swapped(score_pk, cand_f, genome_of):
    g_j = genome_of[cand_f]

    def body(ci, M):
        g = jax.lax.dynamic_slice(g_j, (ci * rc, 0), (rc, K))
        s = jax.lax.dynamic_slice(score_pk, (ci * rc, 0), (rc, K))
        onehot = g[:, None, :] == jnp.arange(
            n_gen, dtype=jnp.int32)[None, :, None]  # [rc, n_gen, K]
        part = jnp.max(
            jnp.where(onehot, s[:, None, :], 0.0), axis=2)  # [rc, n_gen]
        return jax.lax.dynamic_update_slice(M, part, (ci * rc, 0))

    return jax.lax.fori_loop(
        0, P // rc, body, jnp.zeros((P, n_gen), jnp.float32))


M_sw = timed("onehot swapped axes", stage_onehot_swapped,
             score_pk, cand_f, genome_r)
M_ref = stage_onehot_only(score_pk, cand_f, genome_r)
print("swap MATCH" if bool(jnp.array_equal(M_sw, M_ref)) else "swap DIFFER",
      flush=True)


@jax.jit
def stage_jpos_gather(cand_f):
    inv = jnp.zeros(G_pad, jnp.int32)
    return inv[cand_f]


timed("jpos [P,K] element gather", stage_jpos_gather, cand_f)
