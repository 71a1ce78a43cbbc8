"""A/B: classic diagonal-band DP vs bit-parallel (Myers) band on chip.

Workloads pick SHORT patterns at mid/high k so the banded-DP engine is the
only eligible one (no filtration tier applies) — the exact regime the bit
mode targets. Within-session comparison (the tunneled link's bandwidth
drifts session to session; see CLAUDE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/myers_ab.py
"""

import time

import numpy as np

from apm.models.scanner import Scanner
from apm.utils.config import ApmConfig
from apm.utils.corpus import random_corpus

MB = 1 << 20
N = 64 * MB
REPS = 3


def run(corpus, pats, k, dp_impl):
    cfg = ApmConfig(
        backend="pallas", strategy="single", engine="dp", dp_impl=dp_impl,
        cache_corpus=True, verbose=False,
    )
    sc = Scanner(pats, k, cfg)
    c0 = sc.count(corpus)  # compile + stage
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = sc.count(corpus)
        assert np.array_equal(out, c0)
    dt = (time.perf_counter() - t0) / REPS
    return N / dt / 1e9, c0


def main():
    rng = np.random.default_rng(0)
    corpus = random_corpus(N, seed=1)
    print(f"corpus {N // MB} MB, engine=dp, {REPS} reps/point")
    for k, m in [(2, 16), (3, 18), (4, 24), (6, 24), (8, 30), (10, 36),
                 (12, 40), (14, 44)]:
        pos = int(rng.integers(0, N - m))
        pat = bytes(corpus[pos : pos + m])
        gbs_b, cb = run(corpus, [pat], k, "band")
        gbs_m, cm = run(corpus, [pat], k, "myers")
        assert np.array_equal(cb, cm), (k, m, cb, cm)
        print(
            f"k={k:2d} m={m:3d}  band {gbs_b*1e3:7.0f} MB/s   "
            f"myers {gbs_m*1e3:7.0f} MB/s   x{gbs_m/gbs_b:.2f}  "
            f"counts={cb.tolist()}"
        )


if __name__ == "__main__":
    main()
