"""Typed configuration for the whole pipeline.

The reference scatters configuration across three layers (bash positional
args + ``PANDELOS_PATH`` env at ``pandelos.sh:16-22,44-57``, Apache
commons-cli in ``Cli.java:11-57``, structopt in
``benchmark/test-framework/src/main.rs:22-79``).  Here a single dataclass
covers all of it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


@dataclasses.dataclass
class PipelineConfig:
    # --- k selection (-k/--kvalue in Cli.java:21-24; auto as calculate_k.py)
    k: Optional[int] = None  # None -> derive via entropy formula

    # --- scoring backend
    backend: str = "auto"  # "oracle" | "xla" | "pallas" | "auto"
    # Row-block height for the blocked score pass (the reference analogue is
    # the 2048-wide column stepping at library.cpp:453-458).
    row_block: int = 256
    # Column-block width for the dense score tiles.
    col_block: int = 2048
    # Count-level cap for the min-sum level decomposition; per-(gene,kmer)
    # multiplicities above this are handled by the exact overflow path.
    level_cap: int = 4
    # Working dtype for the level matmuls ("bf16" uses bfloat16 operands with
    # f32 accumulation; exact for counts <= 256).
    matmul_dtype: str = "bf16"
    # Capacity factor for device-side nonzero-cell extraction: max extracted
    # cells per row-block = nnz_cap_per_row * row_block.  Overflow triggers a
    # host-side retry with a doubled cap.
    nnz_cap_per_row: int = 512
    # --- candidate engine (ops/candidate.py)
    # Bucket count of the host-built mass signatures used for the exact
    # upper-bound prefilter matmuls.
    signature_buckets: int = 8192
    # Max candidate columns per row on device; rows exceeding it fall back
    # to the exact host posting walk.
    candidate_cap: int = 128
    # Run the BBH network construction on device (ships only accepted
    # cells over the host link); falls back to the host path on
    # pathological candidate overflow.  None -> on for real accelerator
    # backends (the tunnel is the bottleneck there), off on CPU.
    device_bbh: Optional[bool] = None
    # Exact-join kernel for the pallas backend: "lane2" (lane-bucketed,
    # per-gene depth bounds prefetched as scalars, packed id<<8|count
    # entries — no in-kernel reductions at all; falls back to "lane"
    # when counts >= 256 or ids >= 2^23), "lane" (lane-bucketed, banded
    # id-range windows), or "roll" (compare-and-rotate,
    # ops/pallas_join.py).
    join_kernel: str = "lane2"
    # Ring-sharded extraction (ops/ring.py): signatures column-sharded
    # over the mesh and rotated with ppermute instead of replicated —
    # the memory-scaling mode for datasets whose replicated signatures
    # exceed one device's HBM (see ops/candidate.memory_model).
    # Requires n_devices >= 2; cells are identical either way.
    ring_extract: bool = False

    # --- parallelism
    # Number of devices to shard the row-block axis of the scoring mesh
    # over.  None -> 1 device in a single-process runtime, every global
    # device under jax.distributed (multi-host).
    n_devices: Optional[int] = None
    mesh_axis: str = "rows"

    # --- complexity / dry-run mode (-c/--complexity, Cli.java:30-35)
    only_complexity: bool = False

    # --- outputs
    write_net: bool = True
    write_clus: bool = True
    # Also write <out>.report: the netclu per-family F{ }/D{ }/S{ } stream
    # (netclu_ng.py:117-138) for consumers of the raw netclu output.
    write_report: bool = False
    # Keep phase checkpoints (.net is the reference's de-facto checkpoint,
    # pandelos.sh:73-76); allows resuming clustering without rescoring.
    checkpoint_dir: Optional[str] = None

    # --- observability
    # When set, the score phase runs under a JAX profiler trace written to
    # this directory (viewable with TensorBoard / xprof).
    profile_dir: Optional[str] = None

    # --- verification
    # Edge-weight tolerance used by the differential checker (the reference
    # harness uses 0.001, benchmark/test-framework/src/main.rs:144-148).
    check_tolerance: float = 0.001

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "PipelineConfig":
        return PipelineConfig(**json.loads(s))
