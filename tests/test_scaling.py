"""Scaling-overhead bound on the virtual device mesh.

On 8 virtual CPU devices sharing the same physical cores, wall-clock
cannot improve with device count — what must hold is that partitioning
OVERHEAD (halo staging, shard assembly, psum, per-device dispatch) stays
bounded: sharding a fixed workload over 8 devices may not blow up the
runtime. The real-chip scaling anchor is recorded by
``bench/sweep.py --scaling`` (bench/scaling_cpu8.jsonl for the overhead
shape; BASELINE.md's >= 80% linear target needs real multi-chip
hardware, unavailable on this testbed).
"""

import time

import jax
import numpy as np
import pytest

from apm.models.scanner import Scanner
from apm.utils.config import ApmConfig
from tests.conftest import random_dna


@pytest.fixture(scope="module", autouse=True)
def need_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _best_time(sc, corpus, reps=3):
    sc.count(corpus)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sc.count(corpus)
        ts.append(time.perf_counter() - t0)
    return min(ts)


@pytest.mark.parametrize(
    "strategy", ["database_over_devices", "patterns_over_devices"]
)
def test_sharding_overhead_bounded(strategy):
    corpus = random_dna(512 << 10, seed=201)
    pats = [random_dna(50, seed=210 + i) for i in range(8)]
    t1 = _best_time(
        Scanner(pats, 1, ApmConfig(backend="xla", strategy="single")), corpus
    )
    t8 = _best_time(
        Scanner(
            pats, 1, ApmConfig(backend="xla", strategy=strategy, max_devices=8)
        ),
        corpus,
    )
    # Bound set from the regenerated 32 MB sweep (bench/scaling_cpu8.jsonl,
    # session 2026-08-20): every 8-device configuration beat single-device
    # (efficiency 1.61-1.80), and the worst overhead ratio anywhere in the
    # sweep — interpret-mode database at 8x 128 KB shards, where per-shard
    # block padding dominates — was t8 = 1.62 * t1. 2.5x + 0.25 s leaves
    # CI-variance headroom over that worst case (was 4x before the data).
    assert t8 <= 2.5 * t1 + 0.25, (t1, t8)
