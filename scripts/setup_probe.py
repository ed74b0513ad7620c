"""Attribute MeshRunner setup time on the bench preset: host pack,
packed upload, unpack jit, device histogram, set_sig — each with a real
fetch sync (axon block_until_ready is a no-op).

Usage: python scripts/setup_probe.py [preset]
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
from pandelos_tpu.ops.score import pad_profiles

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ds = read_faa(os.path.join(here, "bench_cache", f"{preset}.faa"))
k = select_k(ds.sequences)
cfg = PipelineConfig(backend="pallas", row_block=256, col_block=512)
dev = jax.devices()[0]


def stage(label, t0):
    print(f"  {label}: {time.monotonic()-t0:.2f}s", flush=True)
    return time.monotonic()


for rep in range(2):
    print(f"--- rep {rep} (fresh index) ---", flush=True)
    t = time.monotonic()
    index = build_index(ds, k=k)
    t = stage("build_index", t)
    padded = pad_profiles(index, 256, 512)
    t = stage("pad_profiles", t)
    packed = (padded.ids << np.int32(8)) | padded.counts.astype(np.int32)
    t = stage("host pack int32", t)
    packed_d = jax.device_put(packed, dev)
    np.asarray(packed_d[:1, :8])
    t = stage("upload packed (sync)", t)
    unpack = lambda p: (jax.lax.shift_right_logical(p, 8), p & 0xFF)
    ids_d, counts_d = jax.jit(unpack)(packed_d)
    np.asarray(ids_d[:1, :8])
    t = stage("unpack jit (sync)", t)
    from pandelos_tpu.ops.pallas_hist import device_histogram, pick_buckets

    n_buckets, shift = pick_buckets(
        index.vocab_size, max(1, index.max_profile_len), index.k,
        n_genes=padded.ids.shape[0],
    )
    mass = device_histogram(
        ids_d, counts_d, n_buckets=n_buckets, shift=shift,
        round_up_bf16=True,
    )
    np.asarray(mass[:1, :8])
    t = stage(f"device_histogram B={n_buckets} (sync)", t)
    sig = jax.device_put(mass, dev)
    np.asarray(sig[:1, :8])
    t = stage("set_sig device_put (sync)", t)
    from pandelos_tpu.ops.lane_join import lane_depth, pack_lane_device

    D = lane_depth(index)
    t = stage(f"lane_depth D={D}", t)
    lane2 = pack_lane_device(ids_d, counts_d, D, packed=True)
    np.asarray(lane2[:1, :8])
    t = stage("pack_lane_device packed (sync)", t)
