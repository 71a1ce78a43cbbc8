#!/usr/bin/env python
"""Headline benchmark: the reference's "Big" workload on one TPU chip.

Workload (matches the reference's best recorded configuration, BASELINE.md):
``dna/small_chrY_bigger.fa`` (1,591,301 bytes) scanned for 6 patterns
(1x 32-char non-existent + 5x 50-char line_20783) at k = 0.

Reference best: 3.89 s all-in on 3 nodes x (6 ranks x 8 OMP threads) + 1
Pascal GPU per rank (experiments.xlsx "With GPU" rows 10-12), i.e.
~0.409 MB/s. ``vs_baseline`` reports our throughput relative to that.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import apm

    dna = "/root/reference/dna"
    big = os.path.join(dna, "small_chrY_bigger.fa")
    if not os.path.exists(big):
        print(json.dumps({"metric": "corpus_throughput", "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0, "error": "corpus missing"}))
        return 1
    corpus = apm.read_input_file(big)
    pats = [open(os.path.join(dna, "line_non_existent.fa"), "rb").read()] + [
        open(os.path.join(dna, "line_20783.fa"), "rb").read()
    ] * 5

    sc = apm.Scanner(pats, k=0)
    counts = sc.count(corpus)  # warm-up / compile

    expected = apm.utils.oracle.count_matches(corpus, pats, 0)
    if counts.tolist() != expected:
        print(json.dumps({"metric": "corpus_throughput", "value": 0.0, "unit": "MB/s", "vs_baseline": 0.0, "error": f"count mismatch {counts.tolist()} != {expected}"}))
        return 1

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sc.count(corpus)
        times.append(time.perf_counter() - t0)
    best = min(times)

    n = len(corpus)
    mbps = n / best / 1e6
    ref_mbps = n / 3.89 / 1e6  # reference best: 3.89 s on 3 nodes + GPUs

    # Steady-state throughput on a 64 MB synthetic corpus (same 6 patterns):
    # the link's fixed per-call latency is amortized, so this is close to
    # the chip's actual scan rate. Measured at k=0 and k=1.
    steady = {}
    try:
        rng = np.random.default_rng(0)
        alpha = np.frombuffer(b"ACGT\n", dtype=np.uint8)
        syn = alpha[rng.integers(0, 5, size=64 << 20)]
        for kk in (0, 1):
            sc_big = apm.Scanner(pats, k=kk)
            sc_big.count(syn)
            tt = []
            for _ in range(3):
                t0 = time.perf_counter()
                sc_big.count(syn)
                tt.append(time.perf_counter() - t0)
            steady[kk] = round(len(syn) / min(tt) / 1e6, 1)
    except Exception:
        pass

    # Large-corpus steady state (512 MB, two chunks): per-call overhead
    # fully amortized — the closest number to the chip's scan rate.
    big512 = 0.0
    try:
        syn512 = alpha[rng.integers(0, 5, size=512 << 20)]
        sc512 = apm.Scanner(pats, k=0)
        sc512.count(syn512)
        tt = []
        for _ in range(2):
            t0 = time.perf_counter()
            sc512.count(syn512)
            tt.append(time.perf_counter() - t0)
        big512 = round(len(syn512) / min(tt) / 1e6, 1)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "corpus_throughput_big_6pat_k0",
                "value": round(mbps, 3),
                "unit": "MB/s",
                "vs_baseline": round(mbps / ref_mbps, 2),
                "steady_state_64mb_k0_mb_per_s": steady.get(0, 0.0),
                "steady_state_64mb_k1_mb_per_s": steady.get(1, 0.0),
                "steady_state_512mb_k0_mb_per_s": big512,
            }
        )
    )
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as e:  # always emit the one JSON line the driver expects
        print(
            json.dumps(
                {
                    "metric": "corpus_throughput_big_6pat_k0",
                    "value": 0.0,
                    "unit": "MB/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            )
        )
        sys.exit(1)
