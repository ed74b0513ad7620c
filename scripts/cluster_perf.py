#!/usr/bin/env python
"""Cluster-phase perf harness: build (and cache) the mycoplasma64 .net via
the oracle host path, then time cluster_network with a per-stage breakdown.

    python scripts/cluster_perf.py [preset] [--profile]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "mycoplasma64"
    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "bench_cache"
    )
    os.makedirs(cache, exist_ok=True)

    from pandelos_tpu.bench.synth import generate_preset
    from pandelos_tpu.index import KmerIndex, build_index
    from pandelos_tpu.io.net import read_net, write_net

    idx_path = os.path.join(cache, f"{preset}.index.npz")
    if os.path.exists(idx_path):
        index = KmerIndex.load(idx_path)
    else:
        index = build_index(generate_preset(preset))
        index.save(idx_path)

    net_path = os.path.join(cache, f"{preset}.net")
    if os.path.exists(net_path):
        t0 = time.monotonic()
        edges = read_net(net_path)
        print(f"read_net: {time.monotonic()-t0:.2f}s ({len(edges)} edges)")
    else:
        from pandelos_tpu.net import build_network, finalize_scores
        from pandelos_tpu.oracle.cells import compute_cells_oracle

        t0 = time.monotonic()
        cells = compute_cells_oracle(index)
        print(f"oracle cells: {time.monotonic()-t0:.2f}s ({len(cells.row)})")
        t0 = time.monotonic()
        fin = finalize_scores(cells, index.kseq_lengths, index.k)
        net = build_network(
            fin, index.seq_genome, index.n_genomes, index.n_sequences
        )
        print(f"finalize+net: {time.monotonic()-t0:.2f}s ({len(net.edges)})")
        write_net(net_path, net.edges)
        edges = net.edges

    from pandelos_tpu.cluster import cluster_network

    seq_genome = np.asarray(index.seq_genome)
    if "--profile" in sys.argv:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        res = cluster_network(edges, seq_genome, index.n_sequences)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
    else:
        for trial in range(2):
            t0 = time.monotonic()
            res = cluster_network(edges, seq_genome, index.n_sequences)
            print(f"cluster trial {trial}: {time.monotonic()-t0:.2f}s "
                  f"({len(res.families)} families)")


if __name__ == "__main__":
    main()
