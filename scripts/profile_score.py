"""Timing breakdown of the device score path on the bench preset.

Usage: PT_TIMING=1 python scripts/profile_score.py [preset]
Shows per-stage times for repeated compute_network_device calls and for a
fresh index object (what run_pipeline does), to attribute e2e overheads.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PT_TIMING", "1")

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

from pandelos_tpu.config import PipelineConfig
from pandelos_tpu.index import build_index
from pandelos_tpu.io.faa import read_faa
from pandelos_tpu.ksel import select_k
from pandelos_tpu.ops.net_device import compute_network_device

preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
faa = os.path.join(here, "bench_cache", f"{preset}.faa")

ds = read_faa(faa)
k = select_k(ds.sequences)
t = time.monotonic()
index = build_index(ds, k=k)
print(f"index_build: {time.monotonic()-t:.2f}s", flush=True)

cfg = PipelineConfig(
    backend="pallas",
    row_block=int(os.environ.get("PT_ROW_BLOCK", "256")),
    col_block=int(os.environ.get("PT_COL_BLOCK", "512")),
    level_cap=4,
    device_bbh=True,
)
print(f"row_block={cfg.row_block} col_block={cfg.col_block}", flush=True)

for i in range(3):
    t = time.monotonic()
    out = compute_network_device(index, cfg)
    print(f"score run {i}: {time.monotonic()-t:.2f}s "
          f"(edges={len(out[0]) if out else None})", flush=True)

t = time.monotonic()
index2 = build_index(ds, k=k)
print(f"index_build (fresh): {time.monotonic()-t:.2f}s", flush=True)
t = time.monotonic()
out = compute_network_device(index2, cfg)
print(f"score with fresh index: {time.monotonic()-t:.2f}s", flush=True)
