#!/usr/bin/env python
"""Randomized on-chip conformance fuzz — exits nonzero on ANY mismatch.

`bench/conformance_tpu.py` replays the fixed reference corpus x k matrix
on the real chip; this adds randomized PROPERTY fuzzing on the same
silicon: random corpora (DNA and raw-binary alphabets, planted exact and
k-error occurrences), random pattern bytes, `count()` vs the NumPy
oracle, `find()` positions vs `banded_distances`, and `count_batch` vs
per-corpus counts. The CPU test suite fuzzes these properties in
interpret mode every run (tests/), but Mosaic-compiled kernels on real
hardware are a different lowering — this is the script that checks THEM.

Compile amortization: trials draw (k, pattern-length multiset) from a
fixed pool and pin `block_windows`, so each pool entry compiles once and
every later trial with new random bytes reuses the executable (pattern
CONTENT is runtime data; only the length multiset is a compile key).

    PYTHONPATH=/root/repo:/root/.axon_site python bench/fuzz_tpu.py \
        --trials 40 [--find-every 4] [--batch-every 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (k, pattern lengths, alphabet): the pool bounds the number of distinct
# compiled configs. Lengths cover: short DP-only, filtration exact tier,
# banded tier (k in [5,16] mid lengths), Myers regime, and binary bytes.
POOL = [
    (0, (7, 50), "dna"),
    (0, (50, 50, 32), "dna"),
    (1, (24, 50), "dna"),
    (1, (20, 40), "bin"),
    (2, (9, 33), "dna"),
    (4, (50, 80), "dna"),
    (6, (24, 64), "dna"),
    (12, (112,), "dna"),
    (16, (40, 140), "dna"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=36)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--find-every", type=int, default=4)
    ap.add_argument("--batch-every", type=int, default=5)
    ap.add_argument("--max-bytes", type=int, default=1 << 20)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("APM_COMPILE_CACHE", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    import apm
    from apm.utils.config import ApmConfig
    from apm.utils.oracle import banded_distances, count_matches

    print(f"platform={jax.devices()[0].platform} trials={args.trials}",
          file=sys.stderr, flush=True)
    rng = np.random.default_rng(args.seed)
    dna = np.frombuffer(b"ACGT\n", dtype=np.uint8)
    failures = 0
    t0 = time.perf_counter()

    for trial in range(args.trials):
        k, plens, alpha_kind = POOL[trial % len(POOL)]
        n = int(rng.integers(64 << 10, args.max_bytes + 1))
        if alpha_kind == "dna":
            corpus = dna[rng.integers(0, 5, size=n)]
        else:  # raw binary incl. NUL / 0xFF
            corpus = rng.integers(0, 256, size=n, dtype=np.uint16).astype(
                np.uint8
            )
        # patterns: random bytes over the corpus alphabet, half the trials
        # additionally planting real (exact or <= k-edit) occurrences
        pats = []
        for m in plens:
            if alpha_kind == "dna":
                p = dna[rng.integers(0, 4, size=m)]
            else:
                p = rng.integers(0, 256, size=m, dtype=np.uint16).astype(
                    np.uint8
                )
            pats.append(p)
        if trial % 2 == 0:
            for p in pats:
                for _ in range(int(rng.integers(1, 6))):
                    occ = p.copy()
                    for _ in range(int(rng.integers(0, k + 1))):
                        occ[rng.integers(0, len(occ))] = (
                            dna[rng.integers(0, 4)]
                            if alpha_kind == "dna"
                            else rng.integers(0, 256)
                        )
                    j = int(rng.integers(0, n - len(occ)))
                    corpus[j : j + len(occ)] = occ
        corpus.setflags(write=False)
        pats_b = [bytes(p.tobytes()) for p in pats]

        cfg = ApmConfig(block_windows=8192)
        sc = apm.Scanner(pats_b, k, cfg)
        got = sc.count(corpus).tolist()
        want = count_matches(corpus, pats_b, k)
        status = "ok"
        if got != want:
            status = f"COUNT MISMATCH got={got} want={want}"
            failures += 1

        if status == "ok" and args.find_every and trial % args.find_every == 1:
            pos = sc.find(corpus)
            for pi, p in enumerate(pats_b):
                d = banded_distances(corpus, p, k)
                want_pos = np.nonzero(d <= k)[0]
                if not np.array_equal(
                    np.asarray(pos[pi], dtype=np.int64),
                    want_pos.astype(np.int64),
                ):
                    status = (
                        f"FIND MISMATCH pat{pi}: {len(pos[pi])} positions "
                        f"vs oracle {len(want_pos)}"
                    )
                    failures += 1
                    break

        if status == "ok" and args.batch_every and trial % args.batch_every == 2:
            half = n // 2
            b1, b2 = corpus[:half], corpus[half:]
            bc = sc.count_batch([b1, b2])
            w1 = count_matches(b1, pats_b, k)
            w2 = count_matches(b2, pats_b, k)
            if bc[0].tolist() != w1 or bc[1].tolist() != w2:
                status = (
                    f"BATCH MISMATCH {bc.tolist()} vs {[w1, w2]}"
                )
                failures += 1

        print(
            f"[{trial + 1:3}/{args.trials}] k={k} plens={plens} "
            f"alpha={alpha_kind} n={n} -> {status}",
            file=sys.stderr, flush=True,
        )
        if failures:
            print(f"FUZZ FAILED at trial {trial + 1}: {status}")
            return 1

    dt = time.perf_counter() - t0
    print(f"{args.trials} fuzz trials passed on "
          f"{jax.devices()[0].platform} in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
