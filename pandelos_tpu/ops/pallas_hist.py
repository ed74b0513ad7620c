"""Device bucket-mass histogram (signature builder) — scatter-free.

XLA's scatter on TPU is catastrophically slow (measured ~11s for a single
500k-element scatter), so the [G, B] signature matrix for the candidate
engine's bound matmuls cannot be built with ``.at[].add`` on device, and
host-building + upload costs ~20s/GB over the remote-TPU tunnel.

The device build uses a two-level one-hot MXU contraction instead of any
scatter: bucket ids split as ``b = hi * 128 + lane``; per gene-chunk the
two indicator tensors

    A[g, h, w] = counts[g, w] * [hi(g, w) == h]      (f32)
    B[g, w, l] = [lane(g, w) == l]                   (f32)

contract over w on the MXU (batched over g, HIGHEST precision) to give
``mass[g, h*128+l]``.  All products are integer * {0,1} and partial sums
stay below 2^24, so f32 HIGHEST-precision accumulation is exact.  This
replaced an earlier Pallas scalar-walk kernel: current Mosaic cannot
store scalars to VMEM, and per-entry one-hot vector updates cost
O(bucket_chunk) each — the matmul form does the same work at MXU rates
and lowers everywhere (TPU and CPU).

The same histogram on host is a NumPy bincount (CPU fallback and test
oracle).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

BUCKET_CHUNK = 4096  # n_buckets granularity (pick_buckets pads to this)
_LANES = 128


def _bf16_round_up_f32(x):
    """f32 -> nearest bf16 value >= x (as bf16); preserves upper-bound
    semantics of the signature masses."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    trunc = bits & jnp.uint32(0xFFFF0000)
    lost = (bits & jnp.uint32(0x0000FFFF)) != 0
    bumped = trunc + jnp.where(lost, jnp.uint32(0x00010000), jnp.uint32(0))
    return jax.lax.bitcast_convert_type(bumped, jnp.float32).astype(
        jnp.bfloat16
    )


def histogram_core(
    ids, counts, n_buckets: int, shift: int, round_up_bf16: bool = False
):
    """Traceable core of :func:`device_histogram` — callable from inside
    ``shard_map`` (the ring-extraction mode histograms shard-local
    profile slices without ever materializing the global signatures)."""
    G_pad, W = ids.shape
    assert n_buckets % _LANES == 0
    H = n_buckets // _LANES

    # gene-chunk size: cap the [C, H, W] f32 indicator temporary at ~96MB
    C = max(8, min(G_pad, int(96e6 // max(1, H * W * 4))))
    n_chunks = -(-G_pad // C)

    hi_iota = jnp.arange(H, dtype=jnp.int32)
    lane_iota = jnp.arange(_LANES, dtype=jnp.int32)

    def body(ci, out):
        start = jnp.minimum(ci * C, G_pad - C)
        ids_c = jax.lax.dynamic_slice(ids, (start, 0), (C, W))
        cnt_c = jax.lax.dynamic_slice(counts, (start, 0), (C, W)).astype(
            jnp.float32
        )
        bucket = jax.lax.shift_right_logical(ids_c, shift)  # [C, W]
        hi = jax.lax.shift_right_logical(bucket, 7)
        lane = jnp.bitwise_and(bucket, _LANES - 1)
        A = (
            (hi[:, None, :] == hi_iota[None, :, None]).astype(jnp.float32)
            * cnt_c[:, None, :]
        )  # [C, H, W]
        Bm = (lane[:, :, None] == lane_iota[None, None, :]).astype(
            jnp.float32
        )  # [C, W, L]
        part = jax.lax.dot_general(
            A,
            Bm,
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [C, H, L]
        part = part.reshape(C, n_buckets)
        if round_up_bf16:
            part = _bf16_round_up_f32(part)
        return jax.lax.dynamic_update_slice(out, part, (start, 0))

    out0 = jnp.zeros(
        (G_pad, n_buckets), jnp.bfloat16 if round_up_bf16 else jnp.float32
    )
    return jax.lax.fori_loop(0, n_chunks, body, out0)


@functools.partial(
    jax.jit, static_argnames=("n_buckets", "shift", "round_up_bf16")
)
def device_histogram(
    ids, counts, n_buckets: int, shift: int, round_up_bf16: bool = False
):
    """[G_pad, W] sorted profiles -> [G_pad, n_buckets] bucket masses
    (f32, or bf16 rounded UP when ``round_up_bf16`` — fused per chunk so
    the full-size f32 result is never materialized; at Mycoplasma-64
    scale that is a 3.2GB HBM saving).

    Padding entries must use a sentinel id with ``sentinel >> shift >=
    n_buckets`` (their hi-level one-hot row is all zero, so they never
    contribute)."""
    return histogram_core(ids, counts, n_buckets, shift, round_up_bf16)


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
    import os

    env = os.environ.get("PT_SIG_BUCKETS")
    if env:  # experimentation override (bench sweeps)
        target = int(env)
        n_buckets = BUCKET_CHUNK
        while n_buckets < target:
            n_buckets *= 2
        shift = 0
        while (max(1, vocab_size - 1) >> shift) >= n_buckets:
            shift += 1
        used = (max(1, vocab_size - 1) >> shift) + 1
        used_padded = ((used + BUCKET_CHUNK - 1) // BUCKET_CHUNK) * BUCKET_CHUNK
        return used_padded, shift

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
