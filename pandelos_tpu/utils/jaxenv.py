"""JAX environment helpers: persistent compilation cache, platform forcing."""

from __future__ import annotations

import os

_CACHE_SET = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist XLA executables across processes.  First compiles of the
    scoring programs take minutes on TPU; the cache makes repeat runs
    (and the bench harness) start hot."""
    global _CACHE_SET
    if _CACHE_SET:
        return
    import jax

    cache_dir = path or os.environ.get(
        "PANDELOS_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "pandelos_tpu", "jax_cache"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # keep source-location metadata out of the cache key: unrelated
        # source edits must not invalidate 400s-compile executables
        jax.config.update(
            "jax_compilation_cache_include_metadata_in_key", False
        )
    except Exception:
        pass
    _CACHE_SET = True
