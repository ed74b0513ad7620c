#!/usr/bin/env python
"""TPU perf iteration harness: stage-by-stage timings of the candidate
engine on a cached dataset.  Run with the preset name (default
salmonella7); prints per-stage wall times after a warm-up pass so compile
is excluded.  Usage:

    python scripts/tpu_perf.py [preset] [row_block] [col_block] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "salmonella7"
    row_block = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    col_block = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from pandelos_tpu.bench.synth import generate_preset
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.index import KmerIndex, build_index

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench_cache"
    )
    os.makedirs(cache, exist_ok=True)
    idx_path = os.path.join(cache, f"{preset}.index.npz")
    if os.path.exists(idx_path):
        index = KmerIndex.load(idx_path)
    else:
        ds = generate_preset(preset)
        t0 = time.monotonic()
        index = build_index(ds)
        print(f"index_build: {time.monotonic()-t0:.2f}s", flush=True)
        index.save(idx_path)

    G = index.n_sequences
    print(
        f"preset={preset} G={G} k={index.k} W={index.max_profile_len} "
        f"vocab={index.vocab_size} lookups={int(index.computation_costs.sum())}",
        flush=True,
    )

    import jax

    from pandelos_tpu.ops.candidate import build_signatures
    from pandelos_tpu.ops.score import _round_up, _width_buckets, pad_profiles

    cfg = PipelineConfig(row_block=row_block, col_block=col_block,
                         candidate_cap=K,
                         backend=os.environ.get("PT_BACKEND", "xla"))

    t0 = time.monotonic()
    padded = pad_profiles(index, row_block, col_block)
    print(f"pad_profiles: {time.monotonic()-t0:.2f}s", flush=True)

    t0 = time.monotonic()
    sig, B, shift = build_signatures(index, padded, cfg)
    jax.block_until_ready(sig)
    print(
        f"signatures: {time.monotonic()-t0:.2f}s  B={B} shift={shift} "
        f"bytes={sig.size * 2 / 1e9:.2f}GB",
        flush=True,
    )
    t0 = time.monotonic()
    sig2, _, _ = build_signatures(index, padded, cfg)
    jax.block_until_ready(sig2)
    print(f"signatures warm: {time.monotonic()-t0:.2f}s", flush=True)
    del sig, sig2, padded  # each stage below re-creates its own copies

    # warm-up + timed full cells pass
    if os.environ.get("PT_SKIP_CELLS", "0") != "1":
        from pandelos_tpu.ops.candidate import compute_cells_candidate

        t0 = time.monotonic()
        cells = compute_cells_candidate(index, cfg)
        print(
            f"cells cold (incl compile): {time.monotonic()-t0:.1f}s "
            f"n={len(cells.row)}",
            flush=True,
        )
        for trial in range(2):
            t0 = time.monotonic()
            cells = compute_cells_candidate(index, cfg)
            dt = time.monotonic() - t0
            lookups = int(index.computation_costs.sum())
            print(
                f"cells warm[{trial}]: {dt:.2f}s -> "
                f"{lookups/dt/1e6:.1f}M lookups/s "
                f"(ref 40.5M/s, x{lookups/dt/40505500:.2f})",
                flush=True,
            )

        del cells

    # device BBH end-to-end
    if os.environ.get("PT_SKIP_NET", "0") != "1":
        from pandelos_tpu.ops.net_device import compute_network_device

        t0 = time.monotonic()
        out = compute_network_device(index, cfg)
        print(f"net_device cold: {time.monotonic()-t0:.1f}s", flush=True)
        if out is not None:
            t0 = time.monotonic()
            out = compute_network_device(index, cfg)
            dt = time.monotonic() - t0
            lookups = int(index.computation_costs.sum())
            print(
                f"net_device warm: {dt:.2f}s edges={len(out[0])} -> "
                f"{lookups/dt/1e6:.1f}M lookups/s (x{lookups/dt/40505500:.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
