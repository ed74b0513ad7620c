"""Attribute scan-B (T-mode extraction) time: T reads + mask/counts,
+cumsum, +searchsorted, +cand gather — cumulative jit variants, each
synced with a real fetch.

Usage: python scripts/stage2_probe.py [preset]
"""
import functools
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
from pandelos_tpu.ops.score import pad_profiles

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ds = read_faa(os.path.join(here, "bench_cache", f"{preset}.faa"))
k = select_k(ds.sequences)
index = build_index(ds, k=k)
G = index.n_sequences
cfg = PipelineConfig(backend="pallas", row_block=256, col_block=512)
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
T = runner.bound_bits(perm_ext, starts, R)
np.asarray(T[:1, :8])
GP = n_blocks * R
K = 128
n_true = G
perm_d = runner._replicate(perm_ext)
starts_d = runner._replicate(starts)
lens_d = runner.col_lens
print(f"GP={GP} blocks={n_blocks}", flush=True)


def make(level):
    @jax.jit
    def run(T, perm_pad, col_lens, starts):
        cols_gene = jax.lax.slice(perm_pad, (0,), (GP,))
        lens_gp = col_lens[jnp.minimum(cols_gene, col_lens.shape[0] - 1)]

        def body(_, start):
            idxs = jax.lax.dynamic_slice(perm_pad, (start,), (R,))
            grow = idxs
            row_lens = col_lens[idxs]
            bits_r = jax.lax.dynamic_slice(T, (start, 0), (R, GP))
            bits_c = jax.lax.dynamic_slice(T, (0, start), (GP, R))
            bound = (bits_r | bits_c.T) > 0
            cand_mask = (
                bound
                & (cols_gene[None, :] != grow[:, None])
                & (cols_gene[None, :] < n_true)
                & (grow[:, None] < n_true)
                & (row_lens[:, None] > 0)
                & (lens_gp[None, :] > 0)
            )
            counts = jnp.sum(cand_mask, axis=1, dtype=jnp.int32)
            if level == 0:
                return None, counts
            cs = jnp.cumsum(cand_mask.astype(jnp.int32), axis=1)
            if level == 1:
                return None, counts + cs[:, -1]
            queries = jnp.arange(1, K + 1, dtype=jnp.int32)
            cand = jax.vmap(
                lambda cs_row: jnp.searchsorted(cs_row, queries)
            )(cs).astype(jnp.int32)
            if level == 2:
                return None, counts + cand[:, 0]
            have = jnp.arange(K, dtype=jnp.int32)[None, :] < counts[:, None]
            cg = cols_gene[jnp.minimum(cand, GP - 1)]
            cg = jnp.where(have, jnp.minimum(cg, col_lens.shape[0] - 1),
                           n_true)
            return None, counts + cg[:, 0]

        _, outs = jax.lax.scan(body, None, starts)
        return outs

    return run


names = ["mask+counts", "+cumsum", "+searchsorted", "+cand gather"]
for level in range(4):
    fn = make(level)
    t0 = time.monotonic()
    out = fn(T, perm_d, lens_d, starts_d)
    np.asarray(out[:4])
    t1 = time.monotonic()
    out = fn(T, perm_d, lens_d, starts_d)
    np.asarray(out[:4])
    t2 = time.monotonic()
    print(f"{names[level]}: cold {t1-t0:.2f}s warm {t2-t1:.3f}s", flush=True)
