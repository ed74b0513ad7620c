#!/usr/bin/env python
"""Microbenchmark of the Pallas join kernel on synthetic data.

Times one chunk of pairs at full width and prints effective
compare-pairs/s, plus ablation variants to isolate slow ops:
  full    - the real kernel
  noroll  - rotation replaced by reuse (wrong results, perf signal)
  notrans - per-octet transpose-reduce replaced by plain reduce
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pandelos_tpu.utils.jaxenv import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_OCT = 8
_PB = 128


def make_kernel(W, variant):
    n_oct = _PB // _OCT

    def kernel(a_blk, b_blk, inter_ref):
        inter_row = jnp.zeros((1, _PB), jnp.float32)
        for o in range(n_oct):
            sl = slice(o * _OCT, (o + 1) * _OCT)
            acc0 = jnp.zeros((_OCT, _LANE), jnp.float32)
            nb = W // _LANE
            na = W // _LANE

            def b_tile_body(bi, accs, sl=sl):
                b_ids = b_blk[sl, pl.ds(bi * _LANE, _LANE)]
                b_cnt = b_blk[sl, pl.ds(W + bi * _LANE, _LANE)].astype(
                    jnp.float32
                )

                def a_tile_body(ai, acc):
                    a_ids = a_blk[sl, pl.ds(ai * _LANE, _LANE)]
                    a_cnt = a_blk[sl, pl.ds(W + ai * _LANE, _LANE)].astype(
                        jnp.float32
                    )

                    if variant == "staticroll":
                        # independent static-shift rolls from the base
                        # tile: no serial dependency chain
                        acc2 = jnp.zeros_like(acc)
                        acc3 = jnp.zeros_like(acc)
                        acc4 = jnp.zeros_like(acc)
                        accs4 = [acc, acc2, acc3, acc4]
                        for s in range(_LANE):
                            rb_ids = pltpu.roll(b_ids, s, 1)
                            rb_cnt = pltpu.roll(b_cnt, s, 1)
                            eq = a_ids == rb_ids
                            accs4[s % 4] = accs4[s % 4] + jnp.where(
                                eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                            )
                        return accs4[0] + accs4[1] + accs4[2] + accs4[3]

                    def rot_body(s, st):
                        acc, rb_ids, rb_cnt = st
                        eq = a_ids == rb_ids
                        acc = acc + jnp.where(
                            eq, jnp.minimum(a_cnt, rb_cnt), 0.0
                        )
                        if variant != "noroll":
                            rb_ids = pltpu.roll(rb_ids, 1, 1)
                            rb_cnt = pltpu.roll(rb_cnt, 1, 1)
                        return acc, rb_ids, rb_cnt

                    acc, _, _ = jax.lax.fori_loop(
                        0, _LANE, rot_body, (acc, b_ids, b_cnt),
                        unroll=128,
                    )
                    return acc

                return jax.lax.fori_loop(0, na, a_tile_body, accs,
                                         unroll=False)

            acc = jax.lax.fori_loop(0, nb, b_tile_body, acc0, unroll=False)

            if variant == "notrans":
                sums = jnp.sum(acc, axis=1, keepdims=True)  # [8,1] unused
                inter_row = inter_row + jnp.sum(acc) * 0  # keep alive
            else:
                sums = jnp.sum(
                    jnp.swapaxes(acc, 0, 1), axis=0, keepdims=True
                )
                wide = jnp.concatenate(
                    [sums, jnp.zeros((1, _PB - _OCT), jnp.float32)],
                    axis=1,
                )
                inter_row = inter_row + pltpu.roll(wide, o * _OCT, 1)
        inter_ref[...] = inter_row

    return kernel


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 14
    rng = np.random.default_rng(0)
    a = rng.integers(1, 1 << 20, size=(chunk, 2 * W), dtype=np.int32)
    b = rng.integers(1, 1 << 20, size=(chunk, 2 * W), dtype=np.int32)
    a[:, W:] = 1 + a[:, W:] % 4  # counts > 0 so bounds hit max
    b[:, W:] = 1 + b[:, W:] % 4
    da, db = jnp.asarray(a), jnp.asarray(b)

    for variant in ("staticroll", "noroll", "full"):
        kern = make_kernel(W, variant)
        f = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(chunk // _PB,),
                in_specs=[
                    pl.BlockSpec((_PB, 2 * W), lambda p: (p, 0)),
                    pl.BlockSpec((_PB, 2 * W), lambda p: (p, 0)),
                ],
                out_specs=[pl.BlockSpec((1, _PB), lambda p: (0, p))],
            ),
            out_shape=[jax.ShapeDtypeStruct((1, chunk), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )
        t0 = time.monotonic()
        out = np.asarray(jax.block_until_ready(f(da, db))[0])
        cold = time.monotonic() - t0
        t0 = time.monotonic()
        reps = 3
        ck = 0.0
        for _ in range(reps):
            out = np.asarray(f(da, db)[0])
            ck += float(out.sum())
        dt = (time.monotonic() - t0) / reps
        cp = chunk * W * W
        print(
            f"{variant:8s} cold={cold:.1f}s warm={dt*1e3:.1f}ms "
            f"-> {cp/dt/1e12:.2f}T cmp/s  checksum={ck:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
