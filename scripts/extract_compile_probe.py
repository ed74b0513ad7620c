"""Attribute the extraction phase's fresh-cache compile time: the
bound-bits T build vs the extract (rank-select) program.

Usage: PANDELOS_JAX_CACHE=$(mktemp -d) python scripts/extract_compile_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax

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

t0 = time.monotonic()
T = runner.bound_bits(perm_ext, starts, R)
jax.block_until_ready(T)
print(f"bound_bits T build: {time.monotonic()-t0:.2f}s", flush=True)

t0 = time.monotonic()
outs = runner.extract(perm_ext, starts, R, padded.width, 128,
                      do_join=False, upper_only=False, from_T=True)
jax.block_until_ready(outs)
print(f"extract program (from_T): {time.monotonic()-t0:.2f}s", flush=True)

t0 = time.monotonic()
outs = runner.extract(perm_ext, starts, R, padded.width, 128,
                      do_join=False, upper_only=False, from_T=True)
jax.block_until_ready(outs)
print(f"extract warm: {time.monotonic()-t0:.2f}s", flush=True)
