#!/usr/bin/env python
"""Measured attempt (VERDICT r5 / DESIGN §1c): does partial unroll of
the DP step loop lift the banded/Myers kernels' per-step-overhead floor?

The instruction-mix accounting shows both kernels sit 4-8x under their
pure-ALU bound at small band widths, with the gap shrinking as k grows
— the signature of a fixed per-step cost (text rotate + loop/SMEM
bookkeeping), not of ops/cell. fori_loop(unroll=U) amortizes exactly
that. Runs each workload at APM_DP_UNROLL in {1, 2, 4} (fresh process
per value — the knob is read at import).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python bench/unroll_probe.py
"""

import json
import os
import subprocess
import sys

WORKER = r'''
import time, numpy as np, jax, json
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from apm.models.scanner import Scanner
from apm.utils.config import ApmConfig
from apm.utils.corpus import random_corpus

N = 64 << 20
corpus = random_corpus(N, seed=1)
corpus.setflags(write=False)
out = {}
for name, m, k, impl in (
    ("band_k1_m12", 12, 1, "band"),
    ("band_k2_m16", 16, 2, "band"),
    ("myers_k5_m24", 24, 5, "myers"),
    ("myers_k8_m30", 30, 8, "myers"),
):
    pat = bytes(corpus[5000:5000 + m])
    sc = Scanner([pat], k, ApmConfig(backend="pallas", strategy="single",
                                     engine="dp", dp_impl=impl))
    c0 = sc.count(corpus)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        c = sc.count(corpus)
        ts.append(time.perf_counter() - t0)
        assert np.array_equal(c, c0)
    ts.sort()
    out[name] = {"mbps": round(N / ts[1] / 1e6, 1),
                 "count": int(c0.sum())}
print("RESULT " + json.dumps(out))
'''


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    results = {}
    for u in ("1", "2", "4"):
        env["APM_DP_UNROLL"] = u
        r = subprocess.run(
            [sys.executable, "-c", WORKER], env=env, capture_output=True,
            text=True, timeout=1500,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(f"U={u}: FAILED\n{r.stderr[-500:]}")
            continue
        results[u] = json.loads(line[0][7:])
        print(f"U={u}: " + json.dumps(results[u]))
    if "1" in results:
        for u in ("2", "4"):
            if u in results:
                for name in results["1"]:
                    a = results["1"][name]["mbps"]
                    b = results[u][name]["mbps"]
                    ok = results[u][name]["count"] == results["1"][name]["count"]
                    print(f"{name}: U=1 {a} -> U={u} {b} MB/s "
                          f"(x{b/a:.2f}) exact={ok}")


if __name__ == "__main__":
    main()
