#!/usr/bin/env python
"""Multi-device / multi-host scan example.

Single host with several chips: the Scanner shards the window axis over
every visible device automatically (strategy "database_over_devices").
Multi-host (one process per host, e.g. a TPU pod):

    # on every host (jax autodetects the cluster):
    python examples/distributed_scan.py /path/to/corpus.fa

Each host stages only the byte ranges its own devices scan — no host ever
materializes the whole corpus. Simulate multiple devices anywhere with:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/distributed_scan.py
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

plat = os.environ.get("JAX_PLATFORMS")
if plat and "," not in plat:
    jax.config.update("jax_platforms", plat)

import apm
from apm.parallel import multihost
from apm.utils.config import ApmConfig


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/dna/small_chrY_x100.fa"
    multihost.initialize()  # no-op single-process
    patterns = [b"GATTACA" * 3, b"CATCATCAT"]
    backend = "xla" if jax.devices()[0].platform == "cpu" else "pallas"
    scanner = apm.Scanner(patterns, k=1, config=ApmConfig(backend=backend))
    counts = multihost.count_multihost(scanner, path)
    if jax.process_index() == 0:  # host 0 prints (rank-0 analog)
        print(f"devices={jax.device_count()} processes={jax.process_count()}")
        for p, c in zip(patterns, counts):
            print(f"Number of matches for pattern <{p.decode()}>: {int(c)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
