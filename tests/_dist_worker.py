"""Worker for the 2-process jax.distributed test (tests/test_distributed.py).

Runs the full CLI pipeline as one SPMD process of a 2-process CPU
cluster: 2 local virtual devices per process -> a 4-device global mesh,
so the scoring shard_map and the BBH all_gather/pmax collectives cross
a real process boundary (Gloo).
"""

import os
import sys


def main() -> int:
    proc_id, coord, faa, out = sys.argv[1:5]
    extra = sys.argv[5:]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["PANDELOS_COORDINATOR"] = coord
    os.environ["PANDELOS_NUM_PROCS"] = "2"
    os.environ["PANDELOS_PROC_ID"] = proc_id

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pandelos_tpu.cli import main as cli_main

    return cli_main(
        ["run", faa, out, "--backend", "pallas", "--distributed"] + extra
    )


if __name__ == "__main__":
    sys.exit(main())
