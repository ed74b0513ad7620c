"""Multi-chip sharding of the scoring pass.

The reference's only parallelism is a single-node thread pool with one task
per genome over a read-only shared index (``Pangenes.java:54-64``).  The
TPU-native equivalent is data parallelism over the gene (row) axis of the
score matrix on a ``jax.sharding.Mesh``:

- profiles are replicated (they are small: G x W int32), row-blocks are
  sharded over the ``rows`` mesh axis via ``shard_map``,
- each device computes integer accumulators and its local per-(row, genome)
  score maxima ``M[i, g]``,
- the BBH filter needs ``M`` for both endpoints of a cell
  (Pangenes.java:100-101), so the row-sharded maxima are merged with an
  ``all_gather`` over the ICI mesh axis — this is the reference's
  cross-thread ``col_max_scores`` merge (library.cpp:515) reborn as a
  collective,
- genome-pair statistics reduce with ``psum``/``pmax``.

Scores for the on-device maxima are finalized in f32 with exactly the
host finalization formula; the default correctness path still extracts
integer cells and finalizes on host (bit-exact), with the device maxima
used for scale-out scheduling and diagnostics.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def make_mesh_2d(
    n_hosts: int, n_per_host: int, axes=("hosts", "rows")
) -> Mesh:
    """Two-level mesh for multi-host runs: the outer axis maps to DCN
    (host boundary), the inner to ICI.  Row sharding uses BOTH axes
    (PartitionSpec((hosts, rows))), so collectives that merge row-shard
    maxima ride ICI within a host and cross DCN once per host."""
    devices = jax.devices()
    need = n_hosts * n_per_host
    if need > len(devices):
        raise ValueError(f"requested {need} devices, only {len(devices)}")
    return Mesh(
        np.array(devices[:need]).reshape(n_hosts, n_per_host), axes
    )


def _finalize_f32(inter, perc, tr, len_rows, len_cols, k):
    """On-device f32 finalization (library.cpp:493-502 formulas)."""
    union = len_rows[:, None] + len_cols[None, :] - inter
    perc_f = perc / jnp.maximum(len_rows[:, None], 1.0)
    tr_f = tr / jnp.maximum(len_cols[None, :], 1.0)
    thr = jnp.float32(1.0) / (jnp.float32(2.0) * jnp.float32(k))
    valid = (perc_f >= thr) | (tr_f >= thr)
    score = jnp.where(valid & (inter > 0), inter / jnp.maximum(union, 1.0), 0.0)
    return score


def sharded_score_step(
    mesh: Mesh,
    vocab_size: int,
    n_genomes: int,
    k: int,
    col_block: int,
    level_cap: int = 4,
    matmul_dtype: str = "bf16",
    axis: str = "rows",
):
    """Build a jitted multi-device scoring step.

    Returns ``fn(row_ids, row_counts, all_ids, all_counts, seq_genome_pad,
    len_pad, row_lens) -> (inter, perc, tr, M_full)`` where the row arrays
    are sharded over the mesh ``rows`` axis and ``M_full`` is the
    all-gathered per-(row, genome) score maximum.
    """
    from pandelos_tpu.ops.score import _score_row_block

    def local_step(
        row_ids,
        row_counts,
        all_ids,
        all_counts,
        col_genome,
        col_lens,
        row_lens,
        row_pos,
    ):
        # row_ids: [R_local, W] — this device's shard of the row axis.
        inter, perc, tr = _score_row_block(
            row_ids,
            row_counts,
            all_ids,
            all_counts,
            vocab_size=vocab_size,
            col_block=col_block,
            level_cap=level_cap,
            matmul_dtype=matmul_dtype,
        )
        score = _finalize_f32(inter, perc, tr, row_lens, col_lens, k)
        # zero the self cell (library.cpp:484-487); row_pos carries each
        # local row's global index
        cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        score = jnp.where(cols == row_pos[:, None], 0.0, score)
        # Per-(local row, genome) maxima: segment-max over columns by the
        # column's genome id -> M_local [R_local, n_genomes].
        onehot = (
            col_genome[None, :, None]
            == jnp.arange(n_genomes, dtype=jnp.int32)[None, None, :]
        )
        M_local = jnp.max(
            jnp.where(onehot, score[:, :, None], 0.0), axis=1
        )
        # The collective: every device needs every row's maxima for the
        # BBH both-endpoint test.
        M_full = jax.lax.all_gather(M_local, axis, tiled=True)
        return inter, perc, tr, M_full

    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(axis, None),  # row ids sharded
            P(axis, None),  # row counts sharded
            P(None, None),  # all ids replicated
            P(None, None),  # all counts replicated
            P(None),  # column genome ids replicated
            P(None),  # column kseq lengths replicated
            P(axis),  # row kseq lengths sharded
            P(axis),  # global row positions sharded
        ),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(None, None)),
        # the fori_loop carries inside the score kernel start as unvarying
        # zeros and become device-varying; skip the vma type check
        check_vma=False,
    )
    return jax.jit(shard)


def shard_rows(mesh: Mesh, arr, axis="rows"):
    """Place an array with its leading axis sharded over the mesh; pass a
    tuple of axis names to shard over a multi-level mesh."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1)))))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P(*([None] * arr.ndim))))


@functools.partial(jax.jit, static_argnames=("n_genomes",))
def genome_pair_stats(M_full, seq_genome, n_genomes: int):
    """[n_genomes, n_genomes] max-of-maxima diagnostic (the structured
    analogue of Pangenes.java:130-143's per-pair prints)."""
    onehot = (
        seq_genome[:, None] == jnp.arange(n_genomes, dtype=jnp.int32)[None, :]
    )
    # stats[g, h] = max over rows in genome g of M[row, h]
    return jnp.max(
        jnp.where(onehot.T[:, :, None], M_full[None, :, :], 0.0), axis=1
    )
