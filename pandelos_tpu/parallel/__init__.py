from pandelos_tpu.parallel.distributed import (  # noqa: F401
    initialize_from_env,
    is_primary,
)
