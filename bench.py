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


def _probe_once(timeout_s: float) -> bool:
    """One accelerator probe in a SUBPROCESS under a watchdog; a hung
    backend init must not poison this process."""
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


def _device_healthy(budget_s: float = 600.0) -> bool:
    """Probe the accelerator until it answers or ``budget_s`` runs out.
    The remote TPU tunnel has been observed to wedge for tens of minutes
    after a worker crash (docs/DESIGN.md), so a short probe window settles
    on the CPU fallback exactly when waiting would have won — the round-3
    official bench was lost to that (VERDICT r3 weak #1)."""
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        remain = deadline - time.monotonic()
        if remain <= 0:
            return False
        if _probe_once(min(120.0, max(15.0, remain))):
            return True
        attempt += 1
        sleep_s = min(60.0 * attempt, max(0.0, deadline - time.monotonic()))
        if sleep_s <= 0:
            return False
        time.sleep(sleep_s)


def _run_child(env: dict, timeout_s: float):
    """Run this file in a child with ``env``; returns (rc, last_stdout
    line or None, stderr_tail, timed_out)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            timeout=timeout_s, env=env, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None, None, "", True
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else None
    return proc.returncode, line, proc.stderr[-4000:], False


def _cache_dir() -> str:
    return os.environ.get(
        "PANDELOS_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "pandelos_tpu", "jax_cache"
        ),
    )


def _last_device_capture():
    """Newest committed artifacts/tpu_r*/bench_trial*.json, wrapped with
    provenance (commit, mtime) and an explicit staleness note — embedded
    in CPU-fallback records so the official bench output always carries
    the most recent REAL device measurement."""
    import glob
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    trials = sorted(
        glob.glob(os.path.join(here, "artifacts", "tpu_r*", "bench_trial*.json")),
        # (mtime, path): path breaks mtime ties deterministically (a
        # fresh checkout materializes every artifact at the same mtime)
        key=lambda p: (os.path.getmtime(p), p),
    )
    if not trials:
        return None
    path = trials[-1]
    try:
        with open(path) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        return None
    commit = None
    try:
        commit = subprocess.run(
            ["git", "-C", here, "log", "-n", "1", "--format=%H %cI", "--", path],
            capture_output=True, text=True, timeout=30,
        ).stdout.strip() or None
    except Exception:
        pass
    return {
        "note": (
            "STALE: builder-committed TPU capture from a prior session; "
            "the accelerator was unreachable for this driver run"
        ),
        "path": os.path.relpath(path, here),
        "committed": commit,
        "capture": data,
    }


def _watchdog_main() -> int:
    """Orchestrate the bench as watchdog-guarded child steps so a tunnel
    stall can never eat the whole driver round (VERDICT r3 next #1):

    1. probe the accelerator with a LONG budget (the tunnel recovers on
       the tens-of-minutes scale),
    2. WARM step — one full pipeline pass that populates the persistent
       compile cache; if the cache was empty this doubles as the honest
       cold end-to-end measurement (VERDICT r3 next #6),
    3. MEASURED run (compiles now cached, so its own deadline is tight);
       one retry after a fresh probe before giving up on the device,
    4. optional fresh-cache COLD step when the warm step found a
       pre-populated cache.

    Only if the device stays unreachable does the CPU fallback run, at a
    scaled preset of the same data distribution (never toy: BENCH_r02
    lesson — a toy fallback is incomparable across rounds)."""
    t_start = time.monotonic()
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET_S", "3300"))

    def remaining() -> float:
        return total_budget - (time.monotonic() - t_start)

    env = dict(os.environ, BENCH_INNER="1", BENCH_SKIP_PROBE="1")
    note = None
    cold_e2e = None
    cold_note = None

    # Observed tunnel wedge durations run 60-90+ minutes (round-4 log).
    # Spend almost the whole driver budget probing before surrendering
    # to the CPU fallback (VERDICT r4 next #1b): a late device capture
    # beats an early fallback every time, so reserve only what the
    # fallback itself needs (~25 min worst case on the downscaled
    # preset) and probe with the rest.
    fallback_reserve = float(
        os.environ.get("BENCH_FALLBACK_RESERVE_S", "1600")
    )
    probe_budget = float(os.environ.get(
        "BENCH_PROBE_BUDGET_S",
        str(max(900.0, total_budget - fallback_reserve)),
    ))
    healthy = _device_healthy(min(probe_budget, remaining()))

    if healthy:
        # --- warm step (also the cold e2e when the cache starts empty)
        cdir = _cache_dir()
        cache_empty = not (
            os.path.isdir(cdir) and any(os.scandir(cdir))
        )
        # PT_TIMING gives the warm/cold pass real per-phase sync points
        # (without them async dispatch attributes everything to the next
        # fetching phase); the [pt:bbh] prints land on stdout but only
        # the LAST line is parsed as JSON
        warm_env = dict(env, BENCH_WARM="1", PT_TIMING="1")
        # an all-cold compile of the round-4 program set measured ~830s
        # on an erratic tunnel; 900s left no slack (one observed miss)
        warm_deadline = float(
            os.environ.get("BENCH_WARM_TIMEOUT_S", "1200")
        )
        rc = line = None
        for attempt in range(2):
            if remaining() < 120:
                break
            rc, line, err, timed_out = _run_child(
                warm_env, min(warm_deadline, remaining())
            )
            if rc == 0 and line:
                break
            if not timed_out and rc not in (None, 17):
                sys.stderr.write(err)
                return rc  # code regression: propagate, don't mask
            # stall mid-warm: give the tunnel one recovery window
            if attempt == 0 and not _device_healthy(min(300, remaining())):
                healthy = False
                note = "accelerator lost during warm-up"
                break
        if healthy and rc == 0 and line:
            try:
                warm = json.loads(line)
                if cache_empty and warm.get("e2e_s"):
                    cold_e2e = warm["e2e_s"]
                    cold_note = "warm step on empty compile cache"
            except ValueError:
                pass
        elif healthy and note is None and rc != 0:
            note = "warm step never finished (tunnel stall?)"
            healthy = False

    if healthy:
        # --- measured run (one retry after a fresh probe)
        deadline = float(os.environ.get("BENCH_TIMEOUT_S", "900"))
        for attempt in range(2):
            if remaining() < 120:
                note = "bench budget exhausted before measured run"
                healthy = False
                break
            rc, line, err, timed_out = _run_child(
                env, min(deadline, remaining())
            )
            if rc == 0 and line:
                result = json.loads(line)
                # --- optional fresh-cache cold step
                if cold_e2e is None and remaining() > 300 and \
                        os.environ.get("BENCH_COLD", "1") == "1":
                    import tempfile

                    tmp = tempfile.mkdtemp(prefix="pandelos_coldcache_")
                    cold_env = dict(
                        env, BENCH_WARM="1", PANDELOS_JAX_CACHE=tmp,
                        PT_TIMING="1",
                    )
                    crc, cline, _, _ = _run_child(
                        cold_env,
                        min(float(os.environ.get(
                            "BENCH_COLD_TIMEOUT_S", "900")), remaining()),
                    )
                    if crc == 0 and cline:
                        try:
                            cold_e2e = json.loads(cline).get("e2e_s")
                            cold_note = "fresh-cache pipeline pass"
                        except ValueError:
                            pass
                    else:
                        cold_note = "cold step failed or timed out"
                result.setdefault("extra", {})
                result["extra"]["end_to_end_cold_s"] = cold_e2e
                result["extra"]["cold_note"] = cold_note
                print(json.dumps(result))
                return 0
            if not timed_out and rc not in (None, 17):
                sys.stderr.write(err)
                return rc or 1
            note = (
                "accelerator unreachable" if rc == 17
                else f"device bench exceeded {deadline:.0f}s (tunnel stall?)"
            )
            if attempt == 0 and not _device_healthy(min(300, remaining())):
                break
    elif note is None:
        note = "accelerator unreachable"

    # --- CPU fallback
    fb_deadline = float(os.environ.get("BENCH_FALLBACK_TIMEOUT_S", "1500"))
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_PRESET=os.environ.get("BENCH_PRESET_FALLBACK", "mycoplasma16"),
        # the Pallas kernel only interprets on CPU (far too slow at preset
        # scale); the xla backend is the comparable compiled path there
        BENCH_BACKEND=os.environ.get("BENCH_BACKEND", "xla"),
        BENCH_DEVICE_NOTE=f"{note}; CPU fallback",
    )
    env.pop("BENCH_WARM", None)
    rc, line, err, timed_out = _run_child(env, fb_deadline)
    if rc == 0 and line:
        # The official record must always carry the real device trend
        # (VERDICT r4 next #1c): embed the newest committed TPU capture,
        # clearly marked stale, so a tunnel outage at capture time never
        # erases the device evidence from the round's record.
        try:
            result = json.loads(line)
            capture = _last_device_capture()
            if capture is not None:
                result.setdefault("extra", {})
                result["extra"]["last_device_capture"] = capture
            line = json.dumps(result)
        except ValueError:
            pass
        print(line)
        return 0
    sys.stderr.write(err)
    print(json.dumps({
        "metric": "kmer_index_lookups_per_sec", "value": None,
        "unit": "lookups/s", "vs_baseline": None,
        "extra": {
            "error": (
                f"CPU fallback also exceeded {fb_deadline:.0f}s"
                if timed_out else f"CPU fallback failed rc={rc}"
            ),
            "device_note": note,
        },
    }))
    return 1


def _warm_main() -> int:
    """One full pipeline pass on the bench preset: populates the
    persistent compile cache and reports its own wall time (the honest
    cold end-to-end number when the cache started empty)."""
    from pandelos_tpu.utils.jaxenv import enable_compilation_cache

    enable_compilation_cache()

    from pandelos_tpu.bench.synth import generate_preset
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.io.faa import write_faa
    from pandelos_tpu.pipeline import run_pipeline

    preset = os.environ.get("BENCH_PRESET", "mycoplasma64")
    here = os.path.dirname(os.path.abspath(__file__))
    cache_dir = os.path.join(here, "bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    faa_path = os.path.join(cache_dir, f"{preset}.faa")
    if not os.path.exists(faa_path):
        write_faa(faa_path, generate_preset(preset))

    backend = os.environ.get("BENCH_BACKEND", "pallas")
    config = PipelineConfig(
        backend=backend, row_block=256, col_block=512, level_cap=4,
        device_bbh=(os.environ.get("BENCH_DEVICE_BBH", "1") == "1")
        if backend in ("xla", "pallas") else None,
    )
    out_prefix = os.path.join(cache_dir, f"_warm_{preset}")
    t0 = time.monotonic()
    res = run_pipeline(faa_path, out_prefix, config)
    e2e = time.monotonic() - t0
    for suffix in (".net", ".clus", ".stats.json"):
        try:
            os.remove(out_prefix + suffix)
        except OSError:
            pass
    print(json.dumps({
        "warm": True,
        "e2e_s": round(e2e, 3),
        # per-phase breakdown: on an empty compile cache this is the
        # compile-time attribution VERDICT r4 next #5 asked for
        "phases_s": {k: round(v, 3) for k, v in res.phase_times.items()},
        "score_phase_s": (res.stats.get("network") or {}).get("phase_s"),
    }))
    return 0


def main() -> int:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon TPU plugin ignores the env var; force it in-process
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pandelos_tpu.utils.jaxenv import enable_compilation_cache

    enable_compilation_cache()

    device_note = os.environ.get("BENCH_DEVICE_NOTE") or None
    if os.environ.get("BENCH_SKIP_PROBE") != "1" and not _device_healthy(
        300.0
    ):
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
            # best-of-3: tunnel-side jitter spreads single warm passes
            # over 1.4-1.7s at m64 scale
            score_time = float("inf")
            for _ in range(3):
                t0 = time.monotonic()
                out = compute_network_device(index, config)
                score_time = min(score_time, time.monotonic() - t0)
            timings["score"] = score_time
            net_edges, stats = out
            # one traced pass for truthful per-phase times: without
            # PT_TIMING there are no device sync points between phases,
            # so async dispatch attributes everything to the next
            # fetching phase and the roofline numbers are meaningless.
            # Timed runs above stay untraced (syncs cost ~15ms).
            import contextlib

            prev = os.environ.get("PT_TIMING")
            os.environ["PT_TIMING"] = "1"
            try:
                with contextlib.redirect_stdout(sys.stderr):
                    traced = compute_network_device(index, config)
            finally:
                if prev is None:
                    os.environ.pop("PT_TIMING", None)
                else:
                    os.environ["PT_TIMING"] = prev
            if traced is not None:
                stats = dict(stats)
                stats["phase_s"] = traced[1].get("phase_s")

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

    # per-phase achieved throughput (VERDICT r4 next #6): the join and
    # BBH dominate the warm pass — lookups/s alone doesn't say whether
    # they are fast for this chip.  Gather floor context in
    # docs/DESIGN.md (row gathers ~25GB/s in-program on v5e).
    phase_s = stats.get("phase_s") or {}
    roofline = {}
    t_join = phase_s.get("flatten_join")
    if t_join and stats.get("pair_cap"):
        n_pairs = stats.get("n_joined_pairs", 0)
        gather_bytes = 2 * stats["pair_cap"] * (
            stats.get("lane_table_cols") or 0
        ) * 4
        roofline["join_s"] = t_join
        roofline["join_pairs_per_sec"] = round(n_pairs / t_join, 1)
        roofline["join_gather_bytes_per_sec"] = round(
            gather_bytes / t_join, 1
        )
    t_bbh = phase_s.get("bbh")
    if t_bbh and stats.get("pair_cap"):
        # 3 exact_div passes over the pair list (score, perc, tr)
        roofline["bbh_s"] = t_bbh
        roofline["bbh_exact_div_per_sec"] = round(
            3 * stats["pair_cap"] / t_bbh, 1
        )
    if phase_s.get("extract"):
        roofline["extract_s"] = phase_s["extract"]

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
            "join_lane2_vector_ops": int(
                wm.get("join_lane2_ops_per_pair", 0)
                * stats.get("n_joined_pairs", 0)
            ),
            "phase_s": phase_s or None,
            "roofline": roofline or None,
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
        if os.environ.get("BENCH_WARM") == "1":
            sys.exit(_warm_main())
        sys.exit(main())
    sys.exit(_watchdog_main())
