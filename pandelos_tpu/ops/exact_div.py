"""Correctly-rounded f32 division of small integers, in pure integer ops.

TPU f32 division is NOT IEEE-correctly rounded (measured: ~35% of integer
quotients differ from the host by one ulp, and x/x can be != 1.0).  The
reference's BBH semantics compare f32 scores for exact equality
(Pangenes.java:100-101), so any on-device score computation must
reproduce the host's IEEE quotients bit-for-bit.

``exact_div_f32(i, u)`` computes ``fl(i / u)`` for integers
``1 <= i <= u < 2^24``:

1. the hardware quotient seeds a small candidate window of consecutive
   floats (bit-pattern +/- CAND_RADIUS),
2. each candidate ``c = m * 2^(e-150)`` is compared EXACTLY against the
   rational ``i/u`` via multi-limb (12-bit) integer arithmetic:
   ``sign(m*u - i*2^(150-e))``,
3. the bracketing pair is resolved by comparing against the exact
   midpoint ``(2m+1) * 2^(e-151)`` with round-half-to-even.

All arithmetic stays within int32 (products of 13-bit by 12-bit limbs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CAND_RADIUS = 3  # hardware quotient assumed within 3 ulp
_N_LIMBS = 7  # base-2^12 limbs; values < 2^84 cover i * 2^(150-e) <= 2^72


def _limbs_mul(m, u):
    """Exact base-2^12 limbs of m * u for m < 2^25, u < 2^24 -> [..., L]."""
    m0 = m & 0xFFF
    m1 = (m >> 12) & 0x1FFF  # up to 13 bits
    u0 = u & 0xFFF
    u1 = u >> 12
    p0 = m0 * u0  # < 2^24
    p1 = m0 * u1 + m1 * u0  # < 2^26
    p2 = m1 * u1  # < 2^25
    d0 = p0 & 0xFFF
    c = p0 >> 12
    t1 = p1 + c
    d1 = t1 & 0xFFF
    c = t1 >> 12
    t2 = p2 + c
    d2 = t2 & 0xFFF
    d3 = (t2 >> 12) & 0xFFF
    d4 = t2 >> 24
    zeros = jnp.zeros_like(d0)
    return jnp.stack([d0, d1, d2, d3, d4, zeros, zeros], axis=-1)


def _limbs_shifted(i, s):
    """Exact base-2^12 limbs of i * 2^s for i < 2^24, 0 <= s <= 50."""
    limbs = []
    for j in range(_N_LIMBS):
        p = j * 12 - s  # bit position of this limb's LSB within i
        pos = jnp.maximum(p, 0)
        neg = jnp.maximum(-p, 0)
        # (i >> pos) << neg, masked to 12 bits; shifts < 32 are required
        down = jnp.where(pos < 32, i >> jnp.minimum(pos, 31), 0)
        limb = jnp.where(neg < 12, (down << neg) & 0xFFF, 0)
        limbs.append(limb)
    return jnp.stack(limbs, axis=-1)


def _limbs_cmp(a, b):
    """-1 / 0 / +1 comparing little-endian limb arrays along last axis."""
    diff = jnp.sign(a - b)  # per limb
    # most-significant nonzero limb decides
    weight = jnp.arange(1, _N_LIMBS + 1)
    idx = jnp.argmax(
        jnp.where(diff != 0, weight, 0)[..., ::-1], axis=-1
    )
    msl = (_N_LIMBS - 1) - idx
    return jnp.take_along_axis(diff, msl[..., None], axis=-1)[..., 0]


def _cmp_cand(m, e, u, i):
    """sign(c - i/u) for candidate mantissa m (<2^25) at exponent e:
    sign(m*u - i*2^(150-e)); e may carry a -1 offset for midpoints via
    the caller passing e-1."""
    s = 150 - e
    return _limbs_cmp(_limbs_mul(m, u), _limbs_shifted(i, s))


@jax.jit
def exact_div_f32(i, u):
    """fl(i/u) for int32 arrays with 1 <= i <= u < 2^24 (elementwise)."""
    i = i.astype(jnp.int32)
    u = u.astype(jnp.int32)
    q0 = i.astype(jnp.float32) / u.astype(jnp.float32)
    bits0 = jax.lax.bitcast_convert_type(q0, jnp.int32)
    return _exact_div_from_seed(bits0, i, u)


@jax.jit
def _exact_div_from_seed(bits0, i, u):
    best_lo_bits = jnp.maximum(bits0 - CAND_RADIUS, 0x00800000)
    exact_bits = jnp.zeros_like(bits0)
    has_exact = jnp.zeros(bits0.shape, jnp.bool_)

    # scan the candidate window for the largest candidate <= i/u and any
    # exact hit
    for d in range(-CAND_RADIUS, CAND_RADIUS + 1):
        cb = bits0 + d
        cb = jnp.maximum(cb, 0x00800000)  # keep normal & positive
        m = (cb & 0x7FFFFF) | 0x800000
        e = (cb >> 23) & 0xFF
        sgn = _cmp_cand(m, e, u, i)
        is_le = sgn <= 0
        best_lo_bits = jnp.where(
            is_le & (cb > best_lo_bits), cb, best_lo_bits
        )
        has_exact = has_exact | (sgn == 0)
        exact_bits = jnp.where(sgn == 0, cb, exact_bits)

    lo_bits = best_lo_bits
    hi_bits = lo_bits + 1
    m_lo = (lo_bits & 0x7FFFFF) | 0x800000
    e_lo = (lo_bits >> 23) & 0xFF

    # midpoint (2*m_lo + 1) * 2^(e_lo - 151)
    mid_sgn = _cmp_cand(2 * m_lo + 1, e_lo - 1, u, i)
    # mid < x -> round up; mid > x -> round down; tie -> even mantissa
    round_up = (mid_sgn < 0) | ((mid_sgn == 0) & ((m_lo & 1) == 1))
    out_bits = jnp.where(round_up, hi_bits, lo_bits)
    out_bits = jnp.where(has_exact, exact_bits, out_bits)
    return jax.lax.bitcast_convert_type(out_bits, jnp.float32)
