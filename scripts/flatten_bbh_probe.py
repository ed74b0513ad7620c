"""Attribute flatten_join + BBH time on the bench preset: flatten only,
+sort, +lane2 kernel, and exact_div / maxima / emission pieces of the
BBH program.  Real-fetch synced.

Usage: python scripts/flatten_bbh_probe.py [preset]
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
from pandelos_tpu.ops.lane_join import lane2_join_core
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
print(f"pair_cap={pair_cap} chunk={chunk} lane_D=?", flush=True)

table = runner.all_lane2
D = runner.lane_D
dg = runner.dg
G_pad = runner.G_pad
pad_gene = jnp.int32(G)
k2f = jnp.float32(runner.k2)
col_lens = runner.col_lens


def timed(name, fn, *args):
    t0 = time.monotonic()
    out = fn(*args)
    sync = out[0] if isinstance(out, tuple) else out
    np.asarray(sync.ravel()[:4])
    t1 = time.monotonic()
    out = fn(*args)
    sync = out[0] if isinstance(out, tuple) else out
    np.asarray(sync.ravel()[:4])
    t2 = time.monotonic()
    print(f"{name}: cold {t1-t0:.2f}s warm {t2-t1:.3f}s", flush=True)
    return out


def flat_core(grow_l, cand_l, counts_l):
    gf = grow_l.reshape(-1)
    cf = cand_l.reshape(-1, K)
    nf = counts_l.reshape(-1)
    nf = jnp.where(nf > K, 0, nf)
    cs = jnp.cumsum(nf)
    total = cs[-1]
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    b = cs - nf
    row_ids = jnp.arange(gf.shape[0], dtype=jnp.int32)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[
        jnp.where(nf > 0, b, pair_cap)].max(row_ids, mode="drop")
    r = jax.lax.associative_scan(jnp.maximum, marks)
    r_safe = jnp.minimum(r, gf.shape[0] - 1)
    base = jnp.where(r_safe > 0, cs[jnp.maximum(r_safe - 1, 0)], 0)
    s = jnp.clip(p - base, 0, K - 1)
    ok = p < total
    pi = jnp.where(ok, gf[r_safe], pad_gene).astype(jnp.int32)
    pj = jnp.where(ok, cf[r_safe, s], pad_gene).astype(jnp.int32)
    return pi, pj


@jax.jit
def flatten_only(grow_l, cand_l, counts_l):
    return flat_core(grow_l, cand_l, counts_l)


@jax.jit
def flatten_sort(grow_l, cand_l, counts_l, dg):
    pi, pj = flat_core(grow_l, cand_l, counts_l)
    da = dg[pi]
    db = dg[pj]
    order = jnp.argsort(da * 1024 + db, stable=True).astype(jnp.int32)
    pi_s = pi[order]
    pj_s = pj[order]
    da_oct = jnp.max(da[order].reshape(-1, 8), axis=1)
    db_oct = jnp.max(db[order].reshape(-1, 8), axis=1)
    inv = jnp.argsort(order).astype(jnp.int32)
    return pi_s, pj_s, da_oct, db_oct, inv


@jax.jit
def kernel_only(table, pi_s, pj_s, da_oct, db_oct):
    return lane2_join_core(table, pi_s, pj_s, da_oct, db_oct,
                           D=D, chunk=chunk)


@jax.jit
def div_only(fi, union):
    return exact_div_f32(
        jnp.maximum(fi, 1.0).astype(jnp.int32),
        jnp.maximum(union, 1.0).astype(jnp.int32),
    )


pi, pj = timed("flatten", flatten_only, grow_d, cand_d, counts_d)
outs = timed("flatten+sort", flatten_sort, grow_d, cand_d, counts_d, dg)
pi_s, pj_s, da_oct, db_oct, inv = outs
j = timed("lane2 kernel", kernel_only, table, pi_s, pj_s, da_oct, db_oct)
fi = j[0]
lens = col_lens
lenA = lens[jnp.minimum(pi_s, lens.shape[0] - 1)]
lenB = lens[jnp.minimum(pj_s, lens.shape[0] - 1)]
union = jnp.asarray(np.asarray(lenA) + np.asarray(lenB)) - fi
timed("exact_div (pair_cap)", div_only, fi, union)
print("n_pairs_real:", int((np.asarray(pi) < G).sum()), flush=True)
