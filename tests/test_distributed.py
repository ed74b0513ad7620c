"""Multi-host execution: 2 real OS processes under jax.distributed.

The reference is single-node (one JVM + thread pool, Pangenes.java:54-64);
the TPU framework's multi-host story is SPMD over a global mesh.  These
tests spawn two processes on a CPU coordinator (2 virtual devices each ->
a 4-device global mesh), run the FULL pipeline — mesh extraction, fused
flatten+Pallas join, and the device-BBH all_gather/pmax maxima merge
(the collective form of library.cpp:515) — across the process boundary,
and assert byte-equality of the outputs with a single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from pandelos_tpu.bench.synth import SynthSpec, generate
from pandelos_tpu.io.faa import write_faa

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(proc_id: int, coord: str, faa: str, out: str, extra):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    return subprocess.Popen(
        [sys.executable, _WORKER, str(proc_id), coord, faa, out] + list(extra),
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )


@pytest.mark.parametrize("extra", [[], ["--device-bbh"]],
                         ids=["host_bbh", "device_bbh"])
def test_two_process_run_matches_single(tmp_path, extra):
    ds = generate(
        SynthSpec(
            n_genomes=4,
            n_families=16,
            singleton_per_genome=2,
            min_len=40,
            max_len=110,
            seed=17,
        )
    )
    faa = str(tmp_path / "d.faa")
    write_faa(faa, ds)

    # single-process truth (oracle backend: the independent host path)
    from pandelos_tpu.config import PipelineConfig
    from pandelos_tpu.pipeline import run_pipeline

    run_pipeline(faa, str(tmp_path / "single"),
                 PipelineConfig(backend="oracle"))

    coord = f"127.0.0.1:{_free_port()}"
    out = str(tmp_path / "dist")
    procs = [_spawn(i, coord, faa, out, extra) for i in range(2)]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i]}"

    # only the primary wrote outputs; they equal the single-process run
    assert not os.path.exists(out + ".net.1")
    with open(tmp_path / "single.net", "rb") as fh:
        want_net = fh.read()
    with open(out + ".net", "rb") as fh:
        assert fh.read() == want_net
    with open(tmp_path / "single.clus", "rb") as fh:
        want_clus = fh.read()
    with open(out + ".clus", "rb") as fh:
        assert fh.read() == want_clus
