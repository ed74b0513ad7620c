#!/usr/bin/env python
"""One-off probe: bound+extract-only timing (cand_cap=1) and the
candidate-count distribution per row, on a cached preset."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

import numpy as np  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
    row_block = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import jax

    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.index import KmerIndex
    from pandelos_tpu.ops.candidate import build_signatures, get_runner
    from pandelos_tpu.ops.score import _width_buckets, pad_profiles

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench_cache"
    )
    index = KmerIndex.load(os.path.join(cache, f"{preset}.index.npz"))
    G = index.n_sequences
    cfg = PipelineConfig(row_block=row_block, col_block=512, candidate_cap=cap)

    padded = pad_profiles(index, row_block, 512)
    sig, B, shift = build_signatures(index, padded, cfg)
    jax.block_until_ready(sig)
    runner = get_runner(index, padded, sig, cfg)
    widths = np.diff(index.profile_ptr)

    def one_pass():
        counts_all = []
        for w_row, perm_pad, starts in _width_buckets(
            widths, row_block, padded.width
        ):
            perm_ext = np.concatenate(
                [perm_pad, np.full(row_block, G, dtype=np.int32)]
            )
            outs = runner.extract_fetched(
                perm_ext, starts, row_block, w_row, cap, do_join=False)
            grow = outs[0].reshape(-1)
            counts = outs[2].reshape(-1)
            keep = grow < G
            counts_all.append(counts[keep])
        return np.concatenate(counts_all)

    t0 = time.monotonic()
    counts = one_pass()
    print(f"bound+extract cold: {time.monotonic()-t0:.1f}s", flush=True)
    t0 = time.monotonic()
    counts = one_pass()
    print(f"bound+extract warm: {time.monotonic()-t0:.2f}s", flush=True)

    counts = np.sort(counts)
    q = lambda p: int(counts[min(len(counts) - 1, int(p * len(counts)))])
    print(
        f"rows={len(counts)} cand total={counts.sum()} "
        f"mean={counts.mean():.1f} p50={q(.5)} p90={q(.9)} p99={q(.99)} "
        f"p99.9={q(.999)} max={counts.max()}",
        flush=True,
    )
    hist, edges = np.histogram(
        counts, bins=[0, 1, 8, 16, 32, 64, 128, 256, 512, 1024, 1 << 30]
    )
    print("count histogram", dict(zip([str(e) for e in edges[:-1]], hist.tolist())))


if __name__ == "__main__":
    main()
