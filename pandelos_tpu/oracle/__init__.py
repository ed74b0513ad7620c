from pandelos_tpu.oracle.cells import compute_cells_oracle  # noqa: F401
