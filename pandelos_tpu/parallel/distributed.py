"""Multi-host (DCN) execution.

The reference has no multi-node story (single JVM + thread pool,
SURVEY §2.3); this module adds it the JAX way: every host runs the same
program, ``jax.distributed.initialize`` wires the processes into one
runtime, and the scoring/BBH mesh programs (``ops/candidate.MeshRunner``,
``ops/net_device``) span every global device — the maxima merges that the
reference does with a single-node mutex (``library.cpp:515``,
``Pangenes.java:103-104``) become ``all_gather``/``pmax`` collectives
that ride ICI within a host and cross DCN once per host.

The CLI entry is ``--distributed`` (``cli.py``): every process executes
the same SPMD pipeline; only the primary writes outputs.  Real
multi-host runs set the standard env vars::

    PANDELOS_COORDINATOR=host0:9999 PANDELOS_NUM_PROCS=2 \
    PANDELOS_PROC_ID=0 python -m pandelos_tpu.cli run ... --distributed

The 2-process CPU-coordinator test lives in
``tests/test_distributed.py`` (spawns real OS processes, asserts
cell-level and .net/.clus byte equality with a single-process run).
"""

from __future__ import annotations

import os

import jax


def initialize_from_env() -> dict:
    """Initialize jax.distributed from PANDELOS_* env vars (no-op for a
    single process).  Returns topology info."""
    coordinator = os.environ.get("PANDELOS_COORDINATOR")
    num_procs = int(os.environ.get("PANDELOS_NUM_PROCS", "1"))
    proc_id = int(os.environ.get("PANDELOS_PROC_ID", "0"))
    if coordinator and num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_procs,
            process_id=proc_id,
        )
    return {
        "process_id": proc_id,
        "num_processes": num_procs,
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the process that should write outputs."""
    try:
        return jax.process_index() == 0
    except Exception:
        return int(os.environ.get("PANDELOS_PROC_ID", "0")) == 0
