from pandelos_tpu.ops.score import compute_cells_xla, pad_profiles  # noqa: F401
