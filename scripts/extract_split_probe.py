#!/usr/bin/env python
"""Attribute the extract-phase time: signature-bound matmuls alone vs
the full extraction (matmuls + mask + cumsum + searchsorted), and the
BBH program's internal stages, on the bench preset.

Usage: python scripts/extract_split_probe.py [preset]
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
cfg = PipelineConfig(backend="pallas", row_block=256, col_block=512,
                     device_bbh=True)
padded = pad_profiles(index, 256, 512)
sig_mass, n_buckets, shift = build_signatures(index, padded, cfg)
runner = get_runner(index, padded, sig_mass, cfg)
G_pad = padded.ids.shape[0]
R = 256
n_blocks = -(-G // R)
print(f"G={G} G_pad={G_pad} W={padded.width} B={sig_mass.shape[1]} "
      f"blocks={n_blocks}", flush=True)

widths = np.diff(index.profile_ptr)
perm = np.argsort(widths, kind="stable").astype(np.int32)
perm_pad = np.full(n_blocks * R, G, dtype=np.int32)
perm_pad[:G] = perm
perm_ext = np.concatenate([perm_pad, np.full(R, G, dtype=np.int32)])
starts = np.arange(0, n_blocks * R, R, np.int32)


@functools.partial(jax.jit, static_argnames=("row_block",))
def bound_only(sig_mass, perm_pad_d, starts_d, row_block):
    sig_bf = sig_mass.astype(jnp.bfloat16)
    sig_pres = (sig_bf != 0).astype(jnp.bfloat16)

    def body(_, start):
        idxs = jax.lax.dynamic_slice(perm_pad_d, (start,), (row_block,))
        mass_a = sig_bf[idxs]
        pres_a = sig_pres[idxs]
        perc_bnd = jax.lax.dot_general(
            mass_a, sig_pres, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tr_bnd = jax.lax.dot_general(
            pres_a, sig_bf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # cheap summary to keep outputs small
        return None, (jnp.sum(perc_bnd) + jnp.sum(tr_bnd))

    _, sums = jax.lax.scan(body, None, starts_d)
    return sums


perm_d = runner._replicate(perm_ext)
starts_d = runner._shard0(starts)

# NOTE: on the remote axon backend block_until_ready does NOT block --
# a host fetch is the only real sync point (round-4 measurement).
t0 = time.monotonic()
out = bound_only(runner.sig, perm_d, starts_d, R)
np.asarray(out)
print(f"bound-only compile+run: {time.monotonic()-t0:.2f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.monotonic()
    out = bound_only(runner.sig, perm_d, starts_d, R)
    np.asarray(out)
    best = min(best, time.monotonic() - t0)
flops = 4.0 * n_blocks * R * sig_mass.shape[1] * G_pad
print(f"bound-only warm: {best:.3f}s ({flops/best/1e12:.1f} TFLOP/s)",
      flush=True)

# full extraction (no join)
t0 = time.monotonic()
outs = runner.extract(perm_ext, starts, R, padded.width, 128,
                      do_join=False, upper_only=False)
np.asarray(outs[-1])
print(f"extract compile+run: {time.monotonic()-t0:.2f}s", flush=True)
best2 = 1e9
for _ in range(3):
    t0 = time.monotonic()
    outs = runner.extract(perm_ext, starts, R, padded.width, 128,
                          do_join=False, upper_only=False)
    np.asarray(outs[-1])
    best2 = min(best2, time.monotonic() - t0)
print(f"extract warm: {best2:.3f}s  (mask+cumsum+searchsorted = "
      f"{best2-best:.3f}s)", flush=True)
