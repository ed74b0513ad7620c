#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric: k-mer index lookups per second through the scoring phase — the
reference's own inner-loop unit of work.  The reference hardcodes its
measured native-core throughput as 40,505.5 lookups/ms
(``ig/native/library.cpp:352``) and derives run ETAs from it; the same
"total lookups" complexity model (Σ over shared-rank posting groups of
group size per member, ``library.cpp:327``) is computed here by the index,
so ``vs_baseline`` = our lookups/s divided by the reference's lookups/s on
the same workload definition.

Dataset: scale-matched synthetic stand-in for the reference's largest
benchmark (Mycoplasma, 64 genomes — ``example/mycoplasma.list.txt``),
since NCBI downloads need network access.  Cached between runs.

Env overrides: BENCH_PRESET (default mycoplasma64), BENCH_BACKEND.
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_LOOKUPS_PER_SEC = 40505.500586716735 * 1000.0  # library.cpp:352


def _device_healthy(timeout_s: float = 150.0) -> bool:
    """Probe the accelerator in a SUBPROCESS under a watchdog; the remote
    TPU tunnel can wedge for hours after a worker crash, and a hung
    backend init would poison this process too."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "x = jax.device_put(np.ones((8, 128), np.float32));"
        "assert float(x.sum()) == 1024.0"
    )
    try:
        rc = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
        )
        return rc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _watchdog_main() -> int:
    """Run the real bench in a child process under a deadline: the remote
    TPU tunnel can stall mid-execution (not just at init), and a hung
    bench would otherwise eat the whole driver round.  On timeout the
    child is killed and the bench reruns on CPU (device_note marks it)."""
    import subprocess

    deadline = float(os.environ.get("BENCH_TIMEOUT_S", "1500"))
    env = dict(os.environ, BENCH_INNER="1")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=deadline, env=env, capture_output=True, text=True,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            print(proc.stdout.strip().splitlines()[-1])
            return 0
        note = f"device bench failed rc={proc.returncode}"
        sys.stderr.write(proc.stderr[-2000:])
    except subprocess.TimeoutExpired:
        note = f"device bench exceeded {deadline:.0f}s (tunnel stall?)"
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_PRESET=os.environ.get("BENCH_PRESET_FALLBACK", "toy"),
        BENCH_DEVICE_NOTE=note,
    )
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        timeout=deadline, env=env, capture_output=True, text=True,
    )
    if proc.stdout.strip():
        print(proc.stdout.strip().splitlines()[-1])
        return 0
    sys.stderr.write(proc.stderr[-2000:])
    return 1


def main() -> int:
    from pandelos_tpu.utils.jaxenv import enable_compilation_cache

    enable_compilation_cache()

    device_note = os.environ.get("BENCH_DEVICE_NOTE") or None
    if not _device_healthy():
        # accelerator unreachable: fall back to CPU so the bench always
        # reports (marked in extra.device_note)
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        device_note = "accelerator unreachable; CPU fallback"
        if os.environ.get("BENCH_PRESET") is None:
            os.environ["BENCH_PRESET"] = "toy"

    preset = os.environ.get("BENCH_PRESET", "mycoplasma64")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import numpy as np

    from pandelos_tpu.bench.synth import generate_preset
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.index import KmerIndex, build_index
    from pandelos_tpu.io.faa import FaaDataset

    timings = {}

    # --- dataset + index (cached; host preprocessing timed separately)
    idx_path = os.path.join(cache_dir, f"{preset}.index.npz")
    meta_path = os.path.join(cache_dir, f"{preset}.meta.json")
    if os.path.exists(idx_path) and os.path.exists(meta_path):
        index = KmerIndex.load(idx_path)
        with open(meta_path) as fh:
            meta = json.load(fh)
        timings["index_build"] = meta.get("index_build_s")
    else:
        t0 = time.monotonic()
        ds: FaaDataset = generate_preset(preset)
        timings["synth"] = time.monotonic() - t0
        t0 = time.monotonic()
        index = build_index(ds)
        timings["index_build"] = time.monotonic() - t0
        index.save(idx_path)
        with open(meta_path, "w") as fh:
            json.dump(
                {
                    "preset": preset,
                    "n_sequences": index.n_sequences,
                    "n_genomes": index.n_genomes,
                    "index_build_s": timings["index_build"],
                },
                fh,
            )

    total_lookups = int(index.computation_costs.sum())

    # Bench default since r2: pallas backend + device BBH (the mesh BBH
    # with pallas-join support is now the production TPU path, shipping
    # accepted cells instead of every valid cell).  BENCH_r01 entries
    # measured xla+device-BBH, then pallas+host-BBH — compare across the
    # flips only with explicit BENCH_BACKEND/BENCH_DEVICE_BBH overrides.
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    use_device_bbh = os.environ.get("BENCH_DEVICE_BBH", "1") == "1"
    config = PipelineConfig(
        backend=backend, row_block=256, col_block=512, level_cap=4
    )

    from pandelos_tpu.pipeline import compute_cells

    import jax

    device = jax.devices()[0]

    net = None
    n_cells = 0
    if use_device_bbh and backend in ("xla", "pallas"):
        from pandelos_tpu.ops.net_device import compute_network_device

        t0 = time.monotonic()
        out = compute_network_device(index, config)
        timings["score_with_compile"] = time.monotonic() - t0
        if out is not None:
            score_time = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                out = compute_network_device(index, config)
                score_time = min(score_time, time.monotonic() - t0)
            timings["score"] = score_time
            n_cells = out[1].get("n_cells", 0)

            class _Net:
                edges = out[0]

            net = _Net()

    if net is None:
        t0 = time.monotonic()
        cells = compute_cells(index, config)  # includes first-call compile
        timings["score_with_compile"] = time.monotonic() - t0

        # best of two warm passes: the 2-vCPU host makes single-trial
        # numpy stages noisy (page faults / tunnel servicing)
        score_time = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            cells = compute_cells(index, config)
            score_time = min(score_time, time.monotonic() - t0)
        timings["score"] = score_time
        n_cells = int(len(cells.row))

        # --- finalize + network (host)
        from pandelos_tpu.net import build_network, finalize_scores

        t0 = time.monotonic()
        fin = finalize_scores(cells, index.kseq_lengths, index.k)
        net = build_network(
            fin, index.seq_genome, index.n_genomes, index.n_sequences
        )
        timings["network"] = time.monotonic() - t0

    from pandelos_tpu.cluster import cluster_network
    t0 = time.monotonic()
    clusters = cluster_network(net.edges, index.seq_genome, index.n_sequences)
    timings["cluster"] = time.monotonic() - t0

    lookups_per_sec = total_lookups / score_time
    maxrss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    result = {
        "metric": "kmer_index_lookups_per_sec",
        "value": round(lookups_per_sec, 1),
        "unit": "lookups/s",
        "vs_baseline": round(lookups_per_sec / REFERENCE_LOOKUPS_PER_SEC, 3),
        "extra": {
            "preset": preset,
            "device": str(device),
            "backend": backend,
            "n_sequences": index.n_sequences,
            "n_genomes": index.n_genomes,
            "k": index.k,
            "total_lookups": total_lookups,
            "n_cells": n_cells,
            "n_edges": len(net.edges),
            "n_families": len(clusters.families),
            "maxrss_mb": round(maxrss_mb, 1),
            "device_note": device_note,
            "timings_s": {kk: round(v, 3) for kk, v in timings.items() if v is not None},
            "reference_eta_s": round(
                total_lookups / REFERENCE_LOOKUPS_PER_SEC, 3
            ),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1":
        sys.exit(main())
    sys.exit(_watchdog_main())
