#!/usr/bin/env python
"""Head-to-head: rotate join (ops/pallas_join) vs lane join
(ops/lane_join) on REAL bench-preset profiles and a random pair list.

Usage: python scripts/lane_join_micro.py [preset] [n_pairs]
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

from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import read_faa
from pandelos_tpu.ksel import select_k
from pandelos_tpu.ops.score import pad_profiles, _round_up
from pandelos_tpu.ops.pallas_join import (
    _CHUNK as ROLL_CHUNK, _join_pairs_device, pack_profiles,
)
from pandelos_tpu.ops.lane_join import (
    _CHUNK as LANE_CHUNK, join_pairs_lane_device, pack_lane_profiles,
)

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ds = read_faa(os.path.join(here, "bench_cache", f"{preset}.faa"))
k = select_k(ds.sequences)
index = build_index(ds, k=k)
G = index.n_sequences
padded = pad_profiles(index, 256, 512)
G_pad = padded.ids.shape[0]
W = padded.width
print(f"G={G} W={W} G_pad={G_pad}", flush=True)

rng = np.random.default_rng(0)
# pair list biased to look like candidates: sorted a-side (run locality)
i = np.sort(rng.integers(0, G, size=n_pairs)).astype(np.int32)
j = rng.integers(0, G, size=n_pairs).astype(np.int32)

dev = jax.devices()[0]

# --- rotate join
all_pair = jax.device_put(
    np.concatenate([padded.ids, padded.counts], axis=1).astype(np.int32), dev
)
chunk = min(ROLL_CHUNK, n_pairs)
ai, bi = jax.device_put(i, dev), jax.device_put(j, dev)
def _sync(o):
    # axon remote backend: block_until_ready is unreliable; a tiny fetch
    # is the only true sync point
    np.asarray(o[0][:8]); np.asarray(o[1][:8]); np.asarray(o[2][:8])

t0 = time.monotonic()
out = _join_pairs_device(all_pair, ai, bi, w_pad=W, chunk=chunk)
_sync(out)
print(f"rotate compile+run: {time.monotonic()-t0:.2f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.monotonic()
    out_r = _join_pairs_device(all_pair, ai, bi, w_pad=W, chunk=chunk)
    _sync(out_r)
    best = min(best, time.monotonic() - t0)
print(f"rotate warm: {best:.3f}s  ({n_pairs/best/1e6:.1f}M pairs/s)",
      flush=True)

# --- lane join
t0 = time.monotonic()
packed, D = pack_lane_profiles(index, G_pad)
print(f"lane pack: {time.monotonic()-t0:.2f}s D={D}", flush=True)
all_lane = jax.device_put(packed, dev)
chunk2 = min(LANE_CHUNK, n_pairs)
t0 = time.monotonic()
out = join_pairs_lane_device(all_lane, ai, bi, D=D, chunk=chunk2)
_sync(out)
print(f"lane compile+run: {time.monotonic()-t0:.2f}s", flush=True)
best2 = 1e9
for _ in range(3):
    t0 = time.monotonic()
    out_l = join_pairs_lane_device(all_lane, ai, bi, D=D, chunk=chunk2)
    _sync(out_l)
    best2 = min(best2, time.monotonic() - t0)
print(f"lane warm:   {best2:.3f}s  ({n_pairs/best2/1e6:.1f}M pairs/s)  "
      f"speedup {best/best2:.1f}x", flush=True)

# cross-check exactness on device results
r = [np.asarray(x) for x in out_r]
l = [np.asarray(x) for x in out_l]
for name, a, b in zip(("inter", "perc", "tr"), r, l):
    bad = np.flatnonzero(a != b)
    print(f"{name}: {'MATCH' if bad.size == 0 else f'{bad.size} diffs'}",
          flush=True)
