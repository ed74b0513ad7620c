"""Attribute the lane2 join's warm time on the bench preset: row
gathers vs Pallas kernel vs sort, at the real pair list/depths.

Usage: python scripts/lane2_micro.py [preset]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import read_faa
from pandelos_tpu.ksel import select_k
from pandelos_tpu.ops.candidate import build_signatures, get_runner
from pandelos_tpu.ops.lane_join import (
    _PAIR_BLOCK, _make_lane2_kernel, lane2_join_core,
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
table = runner.all_lane2
D = runner.lane_D
dg = runner.dg
print(f"pair_cap={pair_cap} chunk={chunk} D={D} "
      f"table={tuple(table.shape)}", flush=True)

# real sorted pair list (host-side replay of the flatten + sort)
nf = np.minimum(counts_h, K)
gf = runner.grow_layout(perm_ext, starts, R).reshape(-1)
cand_h = runner.fetch(cand_d).reshape(-1, K)
ai_l, bi_l = [], []
for r in range(len(nf)):
    n = nf[r]
    if n and gf[r] < G:
        ai_l.extend([gf[r]] * n)
        bi_l.extend(cand_h[r, :n].tolist())
pi = np.full(pair_cap, G, np.int32)
pj = np.full(pair_cap, G, np.int32)
pi[: len(ai_l)] = ai_l
pj[: len(bi_l)] = bi_l
dg_h = runner.fetch(dg)
da = dg_h[np.minimum(pi, len(dg_h) - 1)]
db = dg_h[np.minimum(pj, len(dg_h) - 1)]
da[pi >= G] = 0
db[pj >= G] = 0
order = np.argsort(da.astype(np.int64) * (D + 1) + db, kind="stable")
pi_s = jnp.asarray(pi[order])
pj_s = jnp.asarray(pj[order])
da_oct = jnp.asarray(da[order].reshape(-1, 8).max(axis=1).astype(np.int32))
db_oct = jnp.asarray(db[order].reshape(-1, 8).max(axis=1).astype(np.int32))
tot_steps = int((da[order].reshape(-1, 8).max(axis=1).astype(np.int64)
                 * db[order].reshape(-1, 8).max(axis=1)).sum())
print(f"pairs={len(ai_l)} octet-steps={tot_steps} "
      f"(avg {tot_steps / (pair_cap // 8):.1f}/octet)", flush=True)


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


# --- 1. full lane2 core (gathers + kernel), the production op
@jax.jit
def full_core(table, pi_s, pj_s, da_oct, db_oct):
    return lane2_join_core(table, pi_s, pj_s, da_oct, db_oct,
                           D=D, chunk=chunk)


timed("full lane2_join_core", full_core, table, pi_s, pj_s, da_oct, db_oct)

# --- 2. gathers only (all chunks, summed to avoid fetch)
@jax.jit
def gathers_only(table, pi_s, pj_s):
    def body(ci, acc):
        aiv = jax.lax.dynamic_slice(pi_s, (ci * chunk,), (chunk,))
        biv = jax.lax.dynamic_slice(pj_s, (ci * chunk,), (chunk,))
        a_exp = jnp.take(table, aiv, axis=0)
        b_exp = jnp.take(table, biv, axis=0)
        return acc + jnp.sum(a_exp[:, :1]) + jnp.sum(b_exp[:, :1])

    return jax.lax.fori_loop(0, pair_cap // chunk, body, jnp.float32(0))


timed("gathers only", gathers_only, table, pi_s, pj_s)

# --- 3. kernel only on one pre-gathered chunk x n_chunks
kern = _make_lane2_kernel(D)
W = table.shape[1]
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
pcall = pl.pallas_call(
    kern, grid_spec=grid_spec,
    out_shape=[jax.ShapeDtypeStruct((1, chunk), jnp.float32)
               for _ in range(3)],
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)),
)

ci = (pair_cap // chunk) // 2  # a mid-depth chunk

@jax.jit
def expand(table, pi_s, pj_s):
    aiv = jax.lax.dynamic_slice(pi_s, (ci * chunk,), (chunk,))
    biv = jax.lax.dynamic_slice(pj_s, (ci * chunk,), (chunk,))
    return jnp.take(table, aiv, axis=0), jnp.take(table, biv, axis=0)


a_exp, b_exp = jax.block_until_ready(expand(table, pi_s, pj_s))
da_c = jax.lax.dynamic_slice(da_oct, (ci * (chunk // 8),), (chunk // 8,))
db_c = jax.lax.dynamic_slice(db_oct, (ci * (chunk // 8),), (chunk // 8,))


@jax.jit
def kernel_all_chunks(da_c, db_c, a_exp, b_exp):
    def body(i, acc):
        outs = pcall(da_c, db_c, a_exp, b_exp)
        return acc + jnp.sum(outs[0])

    return jax.lax.fori_loop(0, pair_cap // chunk, body, jnp.float32(0))


timed("kernel only (mid chunk x n_chunks)", kernel_all_chunks,
      da_c, db_c, a_exp, b_exp)

# --- 4. device sort (argsort key + inverse), as in production
dg_dev = dg

@jax.jit
def sort_only(pi_u, pj_u):
    dav = dg_dev[pi_u]
    dbv = dg_dev[pj_u]
    order = jnp.argsort(
        dav * (D + 1) + dbv, stable=True).astype(jnp.int32)
    inv = jnp.argsort(order).astype(jnp.int32)
    return order, inv


timed("sort+inverse", sort_only, jnp.asarray(pi), jnp.asarray(pj))

# --- 5. gather variants: full-width forced, narrow slice, big chunk
@jax.jit
def gathers_full_sum(table, pi_s, pj_s):
    def body(ci, acc):
        aiv = jax.lax.dynamic_slice(pi_s, (ci * chunk,), (chunk,))
        biv = jax.lax.dynamic_slice(pj_s, (ci * chunk,), (chunk,))
        a_exp = jnp.take(table, aiv, axis=0)
        b_exp = jnp.take(table, biv, axis=0)
        return acc + jnp.sum(a_exp, dtype=jnp.int32) + jnp.sum(
            b_exp, dtype=jnp.int32)

    return jax.lax.fori_loop(0, pair_cap // chunk, body, jnp.int32(0))


timed("gathers full-sum", gathers_full_sum, table, pi_s, pj_s)

D0 = 8
table_n = table[:, : D0 * 128]

@jax.jit
def gathers_narrow(table_n, pi_s, pj_s):
    def body(ci, acc):
        aiv = jax.lax.dynamic_slice(pi_s, (ci * chunk,), (chunk,))
        biv = jax.lax.dynamic_slice(pj_s, (ci * chunk,), (chunk,))
        a_exp = jnp.take(table_n, aiv, axis=0)
        b_exp = jnp.take(table_n, biv, axis=0)
        return acc + jnp.sum(a_exp, dtype=jnp.int32) + jnp.sum(
            b_exp, dtype=jnp.int32)

    return jax.lax.fori_loop(0, pair_cap // chunk, body, jnp.int32(0))


timed(f"gathers narrow D0={D0}", gathers_narrow, table_n, pi_s, pj_s)

BIGC = 131072

@jax.jit
def full_core_bigchunk(table, pi_s, pj_s, da_oct, db_oct):
    return lane2_join_core(table, pi_s, pj_s, da_oct, db_oct,
                           D=D, chunk=BIGC)


timed("full core chunk=128k", full_core_bigchunk,
      table, pi_s, pj_s, da_oct, db_oct)

SMALLC = 8192

@jax.jit
def full_core_smallchunk(table, pi_s, pj_s, da_oct, db_oct):
    return lane2_join_core(table, pi_s, pj_s, da_oct, db_oct,
                           D=D, chunk=SMALLC)


timed("full core chunk=8k", full_core_smallchunk,
      table, pi_s, pj_s, da_oct, db_oct)

for C in (16384, 4096, 2048):
    @jax.jit
    def full_core_c(table, pi_s, pj_s, da_oct, db_oct, C=C):
        return lane2_join_core(table, pi_s, pj_s, da_oct, db_oct,
                               D=D, chunk=C)

    timed(f"full core chunk={C}", full_core_c,
          table, pi_s, pj_s, da_oct, db_oct)
