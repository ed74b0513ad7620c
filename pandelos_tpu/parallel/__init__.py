from pandelos_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    sharded_score_step,
)
