"""Multi-host (DCN) execution scaffolding.

The reference has no multi-node story (single JVM + thread pool,
SURVEY §2.3); this module adds it the JAX way: every host runs the same
program, ``jax.distributed.initialize`` wires the processes into one
runtime, and the scoring pass runs over a global 2-level mesh
(``make_mesh_2d``: hosts x local chips) with the row axis sharded over
both levels — maxima merges ride ICI within a host and cross DCN once.

Single-chip environments can exercise this path with ``n_processes=1``;
real multi-host runs set the standard env vars::

    PANDELOS_COORDINATOR=host0:9999 PANDELOS_NUM_PROCS=2 \
    PANDELOS_PROC_ID=0 python -m pandelos_tpu.cli run ... --distributed
"""

from __future__ import annotations

import os
from typing import Optional

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


def global_mesh(axes=("hosts", "rows")):
    """Global 2-level mesh: process axis x local-device axis."""
    from pandelos_tpu.parallel.mesh import make_mesh_2d

    n_local = len(jax.local_devices())
    n_procs = max(1, len(jax.devices()) // max(1, n_local))
    return make_mesh_2d(n_procs, n_local, axes=axes)


def is_primary() -> bool:
    return int(os.environ.get("PANDELOS_PROC_ID", "0")) == 0
