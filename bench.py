#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric: k-mer index lookups per second through the warm scoring
phase — the reference's own inner-loop unit of work.  The reference
hardcodes its measured native-core throughput as 40,505.5 lookups/ms
(``ig/native/library.cpp:352``) and derives run ETAs from it; the same
"total lookups" complexity model (Σ over shared-rank posting groups of
group size per member, ``library.cpp:327``) is computed here by the index,
so ``vs_baseline`` = our lookups/s divided by the reference's lookups/s on
the same workload definition.

Also reported (extra):
- ``end_to_end_s``: one full cold-index warm-jit pipeline pass
  (read .faa -> k -> index -> score+BBH -> cluster -> write .net/.clus),
  BASELINE.md's end-to-end north star.  Nothing is loaded from cache.
- ``achieved_tflops`` / ``pct_bf16_peak``: analytic bound-matmul FLOPs
  (ops/candidate.work_model) over the warm score time, against the
  measured 358 TFLOP/s bf16 peak (docs/DESIGN.md).
- ``matches_reference_golden``: whether the end-to-end .net/.clus equal
  the committed goldens produced by the independent reference backend
  (bench_cache/<preset>.{net,clus}).

Dataset: realistic synthetic stand-in for the reference's largest
benchmark (Mycoplasma, 64 genomes — ``example/mycoplasma.list.txt``), since
NCBI downloads need network access (synth.py v2: empirical residue
frequencies, k=6, indels, divergence spread).

Env overrides: BENCH_PRESET (default mycoplasma64), BENCH_BACKEND,
BENCH_DEVICE_BBH, BENCH_PRESET_FALLBACK (CPU-fallback preset, default
mycoplasma16 — never toy: a toy fallback destroys cross-round trend data).
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_LOOKUPS_PER_SEC = 40505.500586716735 * 1000.0  # library.cpp:352
BF16_PEAK_TFLOPS = 358.0  # measured in-program on this chip (docs/DESIGN.md)


def _device_healthy(timeout_s: float = 150.0, attempts: int = 3) -> bool:
    """Probe the accelerator in a SUBPROCESS under a watchdog; the remote
    TPU tunnel can wedge for hours after a worker crash, and a hung
    backend init would poison this process too.  Retries with backoff:
    a single failed probe was observed while the tunnel recovered."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "x = jax.device_put(np.ones((8, 128), np.float32));"
        "assert float(x.sum()) == 1024.0"
    )
    for attempt in range(attempts):
        try:
            rc = subprocess.run(
                [sys.executable, "-c", code],
                timeout=timeout_s,
                capture_output=True,
            )
            if rc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < attempts:
            time.sleep(30 * (attempt + 1))
    return False


def _watchdog_main() -> int:
    """Run the real bench in a child process under a deadline: the remote
    TPU tunnel can stall mid-execution (not just at init), and a hung
    bench would otherwise eat the whole driver round.  Only a TIMEOUT (or
    an unhealthy-device marker from the child) triggers the CPU rerun —
    a plain nonzero exit is a code regression and propagates as failure."""
    import subprocess

    deadline = float(os.environ.get("BENCH_TIMEOUT_S", "1500"))
    env = dict(os.environ, BENCH_INNER="1")
    note = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=deadline, env=env, capture_output=True, text=True,
        )
        if proc.returncode == 0 and proc.stdout.strip():
            print(proc.stdout.strip().splitlines()[-1])
            return 0
        if proc.returncode == 17:  # child marks: device probe failed
            note = "accelerator unreachable"
        else:
            sys.stderr.write(proc.stderr[-4000:])
            return proc.returncode or 1
    except subprocess.TimeoutExpired:
        note = f"device bench exceeded {deadline:.0f}s (tunnel stall?)"

    # CPU fallback at a scaled preset of the SAME data distribution —
    # never toy (BENCH_r02 lesson: a toy fallback is incomparable with
    # other rounds' numbers).
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_PRESET=os.environ.get("BENCH_PRESET_FALLBACK", "mycoplasma16"),
        # the Pallas kernel only interprets on CPU (far too slow at preset
        # scale); the xla backend is the comparable compiled path there
        BENCH_BACKEND=os.environ.get("BENCH_BACKEND", "xla"),
        BENCH_DEVICE_NOTE=f"{note}; CPU fallback",
        BENCH_SKIP_PROBE="1",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=deadline, env=env, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        print(json.dumps({
            "metric": "kmer_index_lookups_per_sec", "value": None,
            "unit": "lookups/s", "vs_baseline": None,
            "extra": {"error": f"CPU fallback also exceeded {deadline:.0f}s",
                      "device_note": note},
        }))
        return 1
    if proc.returncode == 0 and proc.stdout.strip():
        print(proc.stdout.strip().splitlines()[-1])
        return 0
    sys.stderr.write(proc.stderr[-4000:])
    print(json.dumps({
        "metric": "kmer_index_lookups_per_sec", "value": None,
        "unit": "lookups/s", "vs_baseline": None,
        "extra": {"error": f"CPU fallback failed rc={proc.returncode}",
                  "device_note": note},
    }))
    return 1


def main() -> int:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var; force it in-process
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pandelos_tpu.utils.jaxenv import enable_compilation_cache

    enable_compilation_cache()

    device_note = os.environ.get("BENCH_DEVICE_NOTE") or None
    if os.environ.get("BENCH_SKIP_PROBE") != "1" and not _device_healthy():
        return 17  # watchdog reruns on CPU at the fallback preset

    preset = os.environ.get("BENCH_PRESET", "mycoplasma64")
    here = os.path.dirname(os.path.abspath(__file__))
    cache_dir = os.path.join(here, "bench_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import numpy as np

    from pandelos_tpu.bench.synth import generate_preset
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.index import build_index
    from pandelos_tpu.io.faa import read_faa, write_faa
    from pandelos_tpu.ksel import select_k

    timings = {}

    # --- dataset (.faa text cached; everything downstream runs fresh)
    faa_path = os.path.join(cache_dir, f"{preset}.faa")
    if not os.path.exists(faa_path):
        t0 = time.monotonic()
        write_faa(faa_path, generate_preset(preset))
        timings["synth"] = time.monotonic() - t0

    t0 = time.monotonic()
    ds = read_faa(faa_path)
    timings["ingest"] = time.monotonic() - t0
    t0 = time.monotonic()
    k = select_k(ds.sequences)
    timings["k_select"] = time.monotonic() - t0
    t0 = time.monotonic()
    index = build_index(ds, k=k)
    timings["index_build"] = time.monotonic() - t0

    total_lookups = int(index.computation_costs.sum())

    # Bench default since r2: pallas backend + device BBH (the production
    # TPU path, shipping accepted cells instead of every valid cell).
    backend = os.environ.get("BENCH_BACKEND", "pallas")
    use_device_bbh = os.environ.get("BENCH_DEVICE_BBH", "1") == "1"
    config = PipelineConfig(
        backend=backend, row_block=256, col_block=512, level_cap=4,
        device_bbh=use_device_bbh if backend in ("xla", "pallas") else None,
    )

    import jax

    device = jax.devices()[0]

    # --- score phase: compile, then best-of-2 warm (the 2-vCPU host makes
    # single-trial host stages noisy)
    net_edges = None
    stats = {}
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
            net_edges, stats = out

    if net_edges is None:
        from pandelos_tpu.net import build_network, finalize_scores
        from pandelos_tpu.pipeline import compute_cells

        t0 = time.monotonic()
        cells = compute_cells(index, config)
        timings["score_with_compile"] = time.monotonic() - t0
        score_time = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            cells = compute_cells(index, config)
            score_time = min(score_time, time.monotonic() - t0)
        timings["score"] = score_time
        stats = {"n_cells": int(len(cells.row))}
        t0 = time.monotonic()
        fin = finalize_scores(cells, index.kseq_lengths, index.k)
        net = build_network(
            fin, index.seq_genome, index.n_genomes, index.n_sequences
        )
        timings["network"] = time.monotonic() - t0
        net_edges = net.edges

    from pandelos_tpu.cluster import cluster_network

    t0 = time.monotonic()
    clusters = cluster_network(net_edges, index.seq_genome, index.n_sequences)
    timings["cluster"] = time.monotonic() - t0

    # --- end-to-end: one full pipeline pass, cold index, warm jit
    # (BASELINE.md north star: .faa on disk -> .clus on disk)
    from pandelos_tpu.pipeline import run_pipeline

    out_prefix = os.path.join(cache_dir, f"_e2e_{preset}")
    t0 = time.monotonic()
    res = run_pipeline(faa_path, out_prefix, config)
    end_to_end_s = time.monotonic() - t0
    timings["e2e_phases"] = dict(res.phase_times)

    # --- golden comparison (goldens produced by the independent
    # reference backend, scripts/regen_goldens.py --large)
    matches_golden = None
    golden_net = os.path.join(cache_dir, f"{preset}.net")
    golden_clus = os.path.join(cache_dir, f"{preset}.clus")
    if os.path.exists(golden_net) and os.path.exists(golden_clus):
        import filecmp

        matches_golden = filecmp.cmp(
            out_prefix + ".net", golden_net, shallow=False
        ) and filecmp.cmp(out_prefix + ".clus", golden_clus, shallow=False)
    for suffix in (".net", ".clus", ".stats.json"):
        try:
            os.remove(out_prefix + suffix)
        except OSError:
            pass

    # --- achieved-throughput accounting (VERDICT r2 next #8)
    from pandelos_tpu.ops.candidate import work_model

    wm = work_model(index, config)
    achieved_tflops = wm["bound_matmul_flops"] / timings["score"] / 1e12
    join_ops = wm["join_ops_per_pair"] * stats.get("n_joined_pairs", 0)

    lookups_per_sec = total_lookups / timings["score"]
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
            "device_bbh": bool(use_device_bbh),
            "n_sequences": index.n_sequences,
            "n_genomes": index.n_genomes,
            "k": index.k,
            "total_lookups": total_lookups,
            "n_cells": stats.get("n_cells", 0),
            "n_edges": len(net_edges),
            "n_families": len(clusters.families),
            "end_to_end_s": round(end_to_end_s, 3),
            "matches_reference_golden": matches_golden,
            "achieved_tflops": round(achieved_tflops, 2),
            "pct_bf16_peak": round(100 * achieved_tflops / BF16_PEAK_TFLOPS, 1),
            "bound_matmul_tflop": round(wm["bound_matmul_flops"] / 1e12, 2),
            "join_vector_ops": int(join_ops),
            "maxrss_mb": round(maxrss_mb, 1),
            "device_note": device_note,
            "timings_s": {
                kk: (round(v, 3) if isinstance(v, float) else
                     {k2: round(v2, 3) for k2, v2 in v.items()})
                for kk, v in timings.items() if v is not None
            },
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
