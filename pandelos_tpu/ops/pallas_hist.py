"""Pallas TPU kernel: per-gene bucket-mass histogram (signature builder).

XLA's scatter on TPU is catastrophically slow (measured ~11s for a single
500k-element scatter), so the [G, B] signature matrix for the candidate
engine's bound matmuls cannot be built with ``.at[].add`` on device, and
host-building + upload costs ~20s/GB over the remote-TPU tunnel.  This
kernel builds it on device:

- buckets are CONTIGUOUS id ranges (``bucket = id >> shift``), so each
  gene's bucket sequence is sorted (profiles are id-sorted);
- grid over (gene-block, bucket-chunk); each step binary-searches the
  gene's sorted entries for the chunk's range, then walks only the
  in-range entries with a scalar loop accumulating into a VMEM tile —
  every entry is visited exactly once across the whole grid.

The same histogram on host is a NumPy bincount (CPU fallback and test
oracle).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GENE_BLOCK = 8
BUCKET_CHUNK = 4096


def _make_hist_kernel(shift: int, w: int):
    log_w = max(1, int(np.ceil(np.log2(max(2, w)))))

    def kernel(ids_ref, counts_ref, out_ref, scratch):
        chunk = pl.program_id(1)
        lo = chunk * BUCKET_CHUNK
        hi = lo + BUCKET_CHUNK

        scratch[...] = jnp.zeros_like(scratch)

        def per_gene(g, carry):
            # binary search: first entry with bucket >= lo (entries are
            # id-sorted, hence bucket-sorted; sentinel ids sort last)
            def bs_step(_, bounds):
                l, r = bounds
                m = (l + r) // 2
                b = jax.lax.shift_right_logical(ids_ref[g, m], shift)
                go_right = b < lo
                return (jnp.where(go_right, m + 1, l), jnp.where(go_right, r, m))

            start, _ = jax.lax.fori_loop(0, log_w, bs_step, (0, w))

            def walk(state):
                wi, _ = state
                b = jax.lax.shift_right_logical(ids_ref[g, wi], shift)

                @pl.when(b < hi)
                def _():
                    cnt = counts_ref[g, wi].astype(jnp.float32)
                    scratch[g, b - lo] = scratch[g, b - lo] + cnt

                return wi + 1, b

            def cond(state):
                wi, last_b = state
                return (wi < w) & (last_b < hi)

            jax.lax.while_loop(cond, walk, (start, jnp.int32(0)))
            return carry

        jax.lax.fori_loop(0, GENE_BLOCK, per_gene, 0)
        out_ref[...] = scratch[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("n_buckets", "shift"))
def device_histogram(ids, counts, n_buckets: int, shift: int):
    """[G_pad, W] sorted profiles -> [G_pad, n_buckets] f32 bucket masses.

    Padding entries must use a sentinel id with ``sentinel >> shift >=
    n_buckets`` (they sort last and never land in a valid chunk)."""
    G_pad, W = ids.shape
    assert G_pad % GENE_BLOCK == 0
    assert n_buckets % BUCKET_CHUNK == 0
    kernel = _make_hist_kernel(shift, W)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G_pad, n_buckets), jnp.float32),
        grid=(G_pad // GENE_BLOCK, n_buckets // BUCKET_CHUNK),
        in_specs=[
            pl.BlockSpec(
                (GENE_BLOCK, W), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (GENE_BLOCK, W), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (GENE_BLOCK, BUCKET_CHUNK), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((GENE_BLOCK, BUCKET_CHUNK), jnp.float32)],
    )(ids, counts)


def host_histogram(ids, counts, n_buckets: int, shift: int):
    """NumPy oracle of device_histogram (also the CPU fallback)."""
    G_pad, _ = ids.shape
    bucket = ids.astype(np.int64) >> shift
    valid = bucket < n_buckets
    gene = np.broadcast_to(np.arange(G_pad)[:, None], ids.shape)
    flat = gene[valid] * n_buckets + bucket[valid]
    hist = np.bincount(
        flat, weights=counts[valid].astype(np.float64),
        minlength=G_pad * n_buckets,
    )
    return hist.reshape(G_pad, n_buckets).astype(np.float32)


def pick_buckets(
    vocab_size: int, max_width: int, k: int, n_genes: int = 0
) -> tuple:
    """(n_buckets, shift).

    Collision noise on the perc bound for a random pair is ~|A| * W/B
    (mean) with sigma ~ sqrt(W^2/B); the validity threshold is |A|/(2k).
    Target B = 8*k*W puts mean noise at threshold/4 (mean + 5 sigma still
    clears the threshold), bounded below by 4096 and above by a device
    memory cap (~6GB for mass+presence bf16 signatures)."""
    target = max(4096, 8 * k * max_width)
    n_buckets = BUCKET_CHUNK
    while n_buckets < target and n_buckets < 131072:
        n_buckets *= 2
    if n_genes:
        mem_cap = int(6e9 // (4 * max(1, n_genes)))
        while n_buckets > BUCKET_CHUNK and n_buckets > mem_cap:
            n_buckets //= 2
    shift = 0
    while (max(1, vocab_size - 1) >> shift) >= n_buckets:
        shift += 1
    used = ((max(1, vocab_size - 1) >> shift) + 1)
    used_padded = ((used + BUCKET_CHUNK - 1) // BUCKET_CHUNK) * BUCKET_CHUNK
    return used_padded, shift
