"""Worker process for the 2-process multihost test (not a test module).

Each worker owns 4 virtual CPU devices; together they form the 8-device
"cluster". Usage:

    python tests/multihost_worker.py <coord_port> <process_id> <num_procs> \
        <corpus_path> <k> <out_json> <pattern...>
"""

import json
import os
import sys


def main() -> None:
    port, pid, nproc, corpus_path, k, out_json = sys.argv[1:7]
    patterns = [p.encode() for p in sys.argv[7:]]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=int(nproc),
        process_id=int(pid),
    )
    assert jax.process_count() == int(nproc), jax.process_count()
    assert len(jax.devices()) == 4 * int(nproc)

    from apm.models.scanner import Scanner
    from apm.parallel.multihost import count_multihost
    from apm.utils.config import ApmConfig

    cfg = ApmConfig(
        backend="pallas", interpret=True, engine="filter", block_windows=1024
    )
    sc = Scanner(patterns, int(k), cfg)
    counts = count_multihost(sc, corpus_path)
    with open(out_json, "w") as f:
        json.dump(
            {
                "process": int(pid),
                "process_count": jax.process_count(),
                "counts": [int(c) for c in counts[: len(patterns)]],
            },
            f,
        )


if __name__ == "__main__":
    main()
