#!/usr/bin/env python
"""On-chip end-to-end check of the shift-folded corr engine (k=0) and
conv phase 1 (k=1) through the Scanner API, 256 MB steady state."""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import apm

    MB = 256
    rng = np.random.default_rng(0)
    alph = np.sort(np.frombuffer(b"ACGT\n", dtype=np.uint8))
    corpus = alph[rng.integers(0, 5, size=MB << 20)]
    m = 50

    def plant(pats, n=60):
        for t in range(n):
            pos = (t * 7919 * 6151) % (len(corpus) - m)
            p = pats[t % len(pats)]
            corpus[pos : pos + len(p)] = np.frombuffer(p, np.uint8)

    def run(sc, label):
        sc.count(corpus)  # compile + stage (device rows stay cached)
        ts = []
        for r in range(4):
            t0 = time.perf_counter()
            out = sc.count(corpus)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{label}: {MB / t / 1e3:.2f} GB/s  ({t*1e3:.0f} ms)  counts={np.asarray(out)[:6]}")

    for P in (6, 16, 64):
        pats = [
            bytes(alph[rng.integers(0, 5, size=m)]) for _ in range(P)
        ]
        plant(pats)
        sc = apm.Scanner(pats, 0, apm.ApmConfig(engine="corr"))
        run(sc, f"k=0 corr P={P}")

    # k=1 conv phase 1 (auto picks fp1_conv for this shape)
    pats = [bytes(alph[rng.integers(0, 5, size=m)]) for _ in range(6)]
    plant(pats)
    sc = apm.Scanner(pats, 1, apm.ApmConfig(engine="auto"))
    from apm.models.pipeline import make_plan

    plan = make_plan(sc, len(corpus))
    print("k=1 plan: fp1_conv =", plan.fp1_conv)
    run(sc, "k=1 auto  P=6 ")


if __name__ == "__main__":
    main()
