"""Probe persistent-cache key stability for the hot device programs.

Lowers (does NOT execute) the flatten_join / bbh programs at the
mycoplasma64 bench shapes and prints each program's serialized-module
hash.  Run twice in separate processes and diff the output: a differing
hash explains why a fresh process re-pays the server-side compile.

Usage: python scripts/probe_cache_key.py [outfile]
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    out = open(sys.argv[1], "w") if len(sys.argv) > 1 else sys.stdout

    from jax.sharding import Mesh
    from pandelos_tpu.ops.candidate import _flatten_join_program

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("rows",))

    # mycoplasma64 bench shapes
    pair_cap, chunk, w_pad = 2097152, 512, 768
    K = 128
    n_rows = 39680  # n_blocks * row_block
    G_pad = 39808

    fn = _flatten_join_program(mesh, "rows", pair_cap, chunk, w_pad, False)
    args = (
        jax.ShapeDtypeStruct((n_rows,), jnp.int32),          # grow
        jax.ShapeDtypeStruct((n_rows // 256, 256, K), jnp.int32),  # cand
        jax.ShapeDtypeStruct((n_rows // 256, 256), jnp.int32),     # counts
        jax.ShapeDtypeStruct((G_pad, 2 * w_pad), jnp.int32),  # all_pair
        jax.ShapeDtypeStruct((G_pad,), jnp.float32),          # col_lens
        jax.ShapeDtypeStruct((), jnp.int32),                  # pad_gene
        jax.ShapeDtypeStruct((), jnp.float32),                # k2f
    )
    lowered = fn.lower(*args)
    stable = lowered.as_text()
    h = hashlib.sha256(stable.encode()).hexdigest()
    print(f"flatten_join stablehlo sha256: {h}", file=out)

    # the actual persistent-cache key jax would use — private JAX
    # internals (jax._src.cache_key / compiler, lowered._lowering) that
    # move across versions; guarded so the public stablehlo hash above
    # still works when they do (dev-only probe, JAX 0.8-era API).
    try:
        from jax._src import cache_key, compiler

        module = lowered._lowering.stablehlo()
        backend = jax.devices()[0].client
        copts = compiler.get_compile_options(1, 1)
        key = cache_key.get(
            module, np.asarray(jax.devices()[:1]), copts, backend
        )
        print(f"flatten_join persistent key: {key}", file=out)
        # key ingredients that could vary per process
        d = jax.devices()[0]
        print(f"platform_version: "
              f"{getattr(backend, 'platform_version', '?')}", file=out)
        print(f"runtime_type: {getattr(backend, 'runtime_type', '?')}",
              file=out)
        print(f"device repr: {repr(d)}", file=out)
        desc = {}
        try:
            desc = d.description() if callable(
                getattr(d, "description", None)) else {}
        except Exception:
            pass
        print(f"device desc: {desc}", file=out)
        try:
            print(f"device attrs: {sorted(dir(d))}", file=out)
            for a in ("id", "process_index", "coords", "core_on_chip",
                      "device_kind", "slice_index"):
                print(f"  {a} = {getattr(d, a, '?')}", file=out)
        except Exception:
            pass
        print(f"compile_options hash: "
              f"{hashlib.sha256(copts.SerializeAsString()).hexdigest()}",
              file=out)
    except (ImportError, AttributeError) as e:
        print(f"persistent-key probe unavailable (private API moved): {e}",
              file=out)

    # dump the full serialized module for diffing
    dump = os.environ.get("PT_KEY_DUMP")
    if dump:
        with open(dump, "w") as fh:
            fh.write(stable)
    if out is not sys.stdout:
        out.close()


if __name__ == "__main__":
    main()
