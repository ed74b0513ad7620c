"""Probe: pure-XLA flat join over the packed lane table vs the lane2
Pallas kernel.  The lane table makes id compares lane-aligned by
construction, so a full-width elementwise compare IS the exact join —
and XLA can fuse the row gather into the consumer, eliminating the
gather-output round trip the pallas_call boundary forces.

Usage: python scripts/xla_flat_join_probe.py [preset] [chunk_log2]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

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
from pandelos_tpu.ops.lane_join import lane2_join_core
from pandelos_tpu.ops.score import pad_profiles

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
CLOG = int(sys.argv[2]) if len(sys.argv) > 2 else 12
here = __file__.rsplit("/", 2)[0]
ds = read_faa(f"{here}/bench_cache/{preset}.faa")
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
w = np.diff(index.profile_ptr)
perm = np.argsort(w, kind="stable").astype(np.int32)
perm_pad = np.full(n_blocks * R, G, np.int32)
perm_pad[:G] = perm
perm_ext = np.concatenate([perm_pad, np.full(R, G, np.int32)])
starts = np.arange(0, n_blocks * R, R, np.int32)
grow_d, cand_d, counts_d = runner.extract(
    perm_ext, starts, R, padded.width, 128,
    do_join=False, upper_only=False, from_T=True)
counts_h = runner.fetch(counts_d).reshape(-1)
pair_cap, _ = runner.pair_capacity(counts_h, 128)
table = runner.all_lane2
D = runner.lane_D
dg = runner.dg

nf = np.minimum(counts_h, 128)
gf = runner.grow_layout(perm_ext, starts, R).reshape(-1)
cand_h = runner.fetch(cand_d).reshape(-1, 128)
ai_l, bi_l = [], []
for r in range(len(nf)):
    if nf[r] and gf[r] < G:
        ai_l.extend([gf[r]] * nf[r])
        bi_l.extend(cand_h[r, : nf[r]].tolist())
pi = np.full(pair_cap, G, np.int32)
pj = np.full(pair_cap, G, np.int32)
pi[: len(ai_l)] = ai_l
pj[: len(bi_l)] = bi_l
pi_d, pj_d = jnp.asarray(pi), jnp.asarray(pj)
dg_h = runner.fetch(dg)
da_oct = jnp.asarray(
    dg_h[np.minimum(pi, len(dg_h) - 1)].reshape(-1, 8).max(axis=1)
    .astype(np.int32))
db_oct = jnp.asarray(
    dg_h[np.minimum(pj, len(dg_h) - 1)].reshape(-1, 8).max(axis=1)
    .astype(np.int32))
chunk = 1 << CLOG
print(f"pair_cap={pair_cap} D={D} chunk={chunk}", flush=True)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    t0 = time.monotonic()
    s = float(np.asarray(jax.tree.leaves(out)[0][:4]).sum())  # real sync
    compile_and_first = time.monotonic() - t0
    best = float("inf")
    for _ in range(reps):
        ta = time.monotonic()
        out = fn(*args)
        s += float(np.asarray(jax.tree.leaves(out)[0][:4]).sum())
        best = min(best, time.monotonic() - ta)
    print(f"{name}: first {compile_and_first:.2f}s warm {best*1e3:.1f}ms",
          flush=True)
    return out


@jax.jit
def pallas_join(table, pi_d, pj_d, da_oct, db_oct):
    return lane2_join_core(table, pi_d, pj_d, da_oct, db_oct,
                           D=D, chunk=chunk)


@jax.jit
def xla_join(table, pi_d, pj_d):
    P = pi_d.shape[0]

    def body(ci, outs):
        ai = jax.lax.dynamic_slice(pi_d, (ci * chunk,), (chunk,))
        bi = jax.lax.dynamic_slice(pj_d, (ci * chunk,), (chunk,))
        a = jnp.take(table, ai, axis=0)  # [C, D*128] packed id<<8|cnt
        b = jnp.take(table, bi, axis=0)
        eq = ((a ^ b) >> 8) == 0  # sentinel-sentinel matches carry cnt 0
        a_cnt = (a & 255).astype(jnp.float32)
        b_cnt = (b & 255).astype(jnp.float32)
        inter = jnp.sum(
            jnp.where(eq, jnp.minimum(a_cnt, b_cnt), 0.0), axis=1)
        perc = jnp.sum(jnp.where(eq, a_cnt, 0.0), axis=1)
        tr = jnp.sum(jnp.where(eq, b_cnt, 0.0), axis=1)
        o0, o1, o2 = outs
        return (
            jax.lax.dynamic_update_slice(o0, inter, (ci * chunk,)),
            jax.lax.dynamic_update_slice(o1, perc, (ci * chunk,)),
            jax.lax.dynamic_update_slice(o2, tr, (ci * chunk,)),
        )

    z = jnp.zeros((P,), jnp.float32)
    return jax.lax.fori_loop(0, P // chunk, body, (z, z, z))


wp = timed("pallas lane2 core", pallas_join, table, pi_d, pj_d,
           da_oct, db_oct)
wx = timed("pure-XLA flat join", xla_join, table, pi_d, pj_d)
same = all(
    np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(wp, wx)
)
print("MATCH" if same else "DIFFER", flush=True)

ip, pp, tp = (np.asarray(x) for x in wp)
ix, px, tx = (np.asarray(x) for x in wx)
for name, a, b in (("inter", ip, ix), ("perc", pp, px), ("tr", tp, tx)):
    bad = np.flatnonzero(a != b)
    print(f"{name}: {bad.size} mismatches", flush=True)
    if bad.size:
        j = bad[:5]
        print("  idx", j.tolist())
        print("  pallas", a[j].tolist(), " xla", b[j].tolist())
        print("  pi", np.asarray(pi_d)[j].tolist(),
              " pj", np.asarray(pj_d)[j].tolist(),
              " da", dg_h[np.minimum(np.asarray(pi_d)[j], len(dg_h)-1)].tolist(),
              " db", dg_h[np.minimum(np.asarray(pj_d)[j], len(dg_h)-1)].tolist())


# full depth x depth XLA compare (the correct join): [C, D, D, 128]
def make_xla_dd(chunk2):
    @jax.jit
    def xla_join_dd(table, pi_d, pj_d):
        P = pi_d.shape[0]

        def body(ci, outs):
            ai = jax.lax.dynamic_slice(pi_d, (ci * chunk2,), (chunk2,))
            bi = jax.lax.dynamic_slice(pj_d, (ci * chunk2,), (chunk2,))
            a = jnp.take(table, ai, axis=0).reshape(chunk2, D, 1, 128)
            b = jnp.take(table, bi, axis=0).reshape(chunk2, 1, D, 128)
            eq = ((a ^ b) >> 8) == 0
            a_cnt = (a & 255).astype(jnp.float32)
            b_cnt = (b & 255).astype(jnp.float32)
            inter = jnp.sum(
                jnp.where(eq, jnp.minimum(a_cnt, b_cnt), 0.0),
                axis=(1, 2, 3))
            perc = jnp.sum(jnp.where(eq, a_cnt, 0.0), axis=(1, 2, 3))
            tr = jnp.sum(jnp.where(eq, b_cnt, 0.0), axis=(1, 2, 3))
            o0, o1, o2 = outs
            return (
                jax.lax.dynamic_update_slice(o0, inter, (ci * chunk2,)),
                jax.lax.dynamic_update_slice(o1, perc, (ci * chunk2,)),
                jax.lax.dynamic_update_slice(o2, tr, (ci * chunk2,)),
            )

        z = jnp.zeros((P,), jnp.float32)
        return jax.lax.fori_loop(0, P // chunk2, body, (z, z, z))

    return xla_join_dd


for c2 in (512, 2048):
    wdd = timed(f"XLA DxD join chunk={c2}", make_xla_dd(c2),
                table, pi_d, pj_d)
    same = all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(wp, wdd))
    print("DxD", c2, "MATCH" if same else "DIFFER", flush=True)
