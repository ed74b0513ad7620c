"""Attribute the flatten program's ~230s cold compile (VERDICT r4 #5).

Compiles three variants of the pair-list build at bench shapes and
reports compile + warm times and output equality:
  A. boundary-scatter + associative_scan cummax (current production)
  B. boundary-scatter + lax.cummax
  C. searchsorted(cs, p, side='right') (no scatter, no scan)

Usage: python scripts/flatten_compile_probe.py [pair_cap_log2 rows]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# NO persistent cache: we are measuring compiles
PC = int(sys.argv[1]) if len(sys.argv) > 1 else 21
ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 40192
pair_cap = 1 << PC
K = 128

rng = np.random.default_rng(0)
nf_h = rng.integers(0, K, ROWS).astype(np.int32)
scale = pair_cap * 0.92 / nf_h.sum()
nf_h = (nf_h * scale).astype(np.int32)
gf_h = rng.permutation(ROWS).astype(np.int32)
cf_h = rng.integers(0, ROWS, (ROWS, K)).astype(np.int32)

nf = jnp.asarray(nf_h)
gf = jnp.asarray(gf_h)
cf = jnp.asarray(cf_h)
pad_gene = jnp.int32(ROWS)


def common(nf):
    cs = jnp.cumsum(nf)
    total = cs[-1]
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    b = cs - nf
    return cs, total, p, b


def finish(r, cs, total, p, gf, cf):
    r_safe = jnp.minimum(r, gf.shape[0] - 1)
    base = jnp.where(r_safe > 0, cs[jnp.maximum(r_safe - 1, 0)], 0)
    s = jnp.clip(p - base, 0, K - 1)
    ok = p < total
    pi = jnp.where(ok, gf[r_safe], pad_gene).astype(jnp.int32)
    pj = jnp.where(ok, cf[r_safe, s], pad_gene).astype(jnp.int32)
    return pi, pj


@jax.jit
def variant_a(nf, gf, cf):
    cs, total, p, b = common(nf)
    row_ids = jnp.arange(gf.shape[0], dtype=jnp.int32)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[
        jnp.where(nf > 0, b, pair_cap)].max(row_ids, mode="drop")
    r = jax.lax.associative_scan(jnp.maximum, marks)
    return finish(r, cs, total, p, gf, cf)


@jax.jit
def variant_b(nf, gf, cf):
    cs, total, p, b = common(nf)
    row_ids = jnp.arange(gf.shape[0], dtype=jnp.int32)
    marks = jnp.zeros((pair_cap,), jnp.int32).at[
        jnp.where(nf > 0, b, pair_cap)].max(row_ids, mode="drop")
    r = jax.lax.cummax(marks)
    return finish(r, cs, total, p, gf, cf)


@jax.jit
def variant_c(nf, gf, cf):
    cs, total, p, b = common(nf)
    r = jnp.searchsorted(cs, p, side="right").astype(jnp.int32)
    return finish(r, cs, total, p, gf, cf)


def timed(name, fn):
    t0 = time.monotonic()
    out = fn(nf, gf, cf)
    np.asarray(out[0][:4])
    t1 = time.monotonic()
    best = float("inf")
    for _ in range(3):
        ta = time.monotonic()
        out = fn(nf, gf, cf)
        np.asarray(out[0][:4])
        best = min(best, time.monotonic() - ta)
    print(f"{name}: cold {t1-t0:.2f}s warm {best:.4f}s", flush=True)
    return np.asarray(out[0]), np.asarray(out[1])


order = os.environ.get("PROBE_ORDER", "cab")
res = {}
fns = {"a": ("scatter+assoc_scan", variant_a),
       "b": ("scatter+cummax", variant_b),
       "c": ("searchsorted", variant_c)}
for key in order:
    name, fn = fns[key]
    res[key] = timed(name, fn)

ks = list(res)
for other in ks[1:]:
    same = all(np.array_equal(res[ks[0]][i], res[other][i]) for i in (0, 1))
    print(f"{ks[0]} vs {other}: {'MATCH' if same else 'DIFFER'}", flush=True)
