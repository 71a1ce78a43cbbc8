#!/usr/bin/env python
"""On-chip conformance matrix: every reference corpus x k, vs the oracle.

Round 1 ran this matrix by hand and recorded it in DESIGN.md §5; this
script IS that matrix, runnable in one command so kernel changes can't
silently regress parity on real hardware:

    PYTHONPATH=/root/repo:/root/.axon_site python bench/conformance_tpu.py

Exits nonzero on ANY mismatch. Runs on whatever the default platform is
(the real TPU under axon; CPU elsewhere — pass --cpu to force CPU).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DNA = "/root/reference/dna"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument(
        "--ks", default="0,1,2,4", help="comma-separated k values"
    )
    ap.add_argument(
        "--no-highk", action="store_true",
        help="skip the synthetic high-k filtration-tier cells",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("APM_COMPILE_CACHE", "/root/repo/.jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import apm
    from apm.utils.oracle import count_matches

    if not os.path.isdir(DNA):
        print("reference dna corpus not available", file=sys.stderr)
        return 2

    corpora = [
        "easy.fa",
        "small_chrY.fa",
        "small_chrY_x100.fa",
        "small_chrY_medium.fa",
        "small_chrY_bigger.fa",
    ]
    pats = [open(os.path.join(DNA, "line_non_existent.fa"), "rb").read()] + [
        open(os.path.join(DNA, f"line_{x}.fa"), "rb").read()
        for x in ("5", "10", "20", "1131", "20783")
    ]
    ks = [int(x) for x in args.ks.split(",")]

    failures = 0
    print(f"platform: {jax.devices()[0].platform}")
    for cname in corpora:
        corpus = apm.read_input_file(os.path.join(DNA, cname))
        for k in ks:
            sc = apm.Scanner(pats, k)
            t0 = time.perf_counter()
            got = sc.count(corpus).tolist()
            dt = time.perf_counter() - t0
            want = count_matches(corpus, pats, k)
            ok = got == want
            failures += 0 if ok else 1
            print(
                json.dumps(
                    {
                        "corpus": cname,
                        "k": k,
                        "ok": ok,
                        "seconds": round(dt, 3),
                        **({} if ok else {"got": got, "want": want}),
                    }
                ),
                flush=True,
            )
    cells = len(corpora) * len(ks)

    # High-k tier cells: the reference's 50-char patterns route to the DP
    # fallback for k > 4, so the exact-piece and banded-piece filtration
    # tiers (k in [5, 16]) need synthetic lengths — one long (exact-tier)
    # and one mid-length (banded-tier) pattern per k, with planted k-error
    # occurrences, vs the oracle.
    if not args.no_highk:
        from apm.ops.filter_kernel import banded_j, tier_of
        from apm.utils.corpus import plant, random_corpus, random_pattern

        for k in (6, 12):
            m_mid = 16 * banded_j(k)
            m_long = 14 * (k + 1)
            assert tier_of(m_mid, k)[1] == 1 and tier_of(m_long, k)[1] == 0
            corpus = random_corpus(2_000_000, seed=900 + k)
            p_mid = random_pattern(m_mid, seed=910 + k)
            p_long = random_pattern(m_long, seed=920 + k)
            plant(corpus, p_mid, [5_000, 900_000, 1_700_000], k=k,
                  seed=930 + k)
            plant(corpus, p_long, [300_000, 1_200_000], k=k, seed=940 + k)
            sc = apm.Scanner([p_mid, p_long], k)
            t0 = time.perf_counter()
            got = sc.count(corpus).tolist()
            dt = time.perf_counter() - t0
            want = count_matches(corpus, [p_mid, p_long], k)
            ok = got == want and min(want) >= 2
            failures += 0 if ok else 1
            cells += 1
            print(
                json.dumps(
                    {
                        "corpus": f"synthetic2mb_tiers_k{k}",
                        "k": k,
                        "ok": ok,
                        "seconds": round(dt, 3),
                        **({} if ok else {"got": got, "want": want}),
                    }
                ),
                flush=True,
            )

    print(f"{cells - failures}/{cells} cells passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
