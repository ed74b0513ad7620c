from pandelos_tpu.native.loader import (  # noqa: F401
    native_available,
    native_build_index,
)
