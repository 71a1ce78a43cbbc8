#!/usr/bin/env python
"""Same-session A/B of shift-fold stride for the corr engine at several P.
Raw kernel timings (staged rows resident), 256 MB."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from apm.ops.corr_engine import (
        _group_rows, build_kernel, pick_stride, scan_corr_mxu,
    )

    MB = 256
    wf, halo = 8192, 128
    n_rows = (MB << 20) // wf
    rng = np.random.default_rng(0)
    alph = np.sort(np.frombuffer(b"ACGT\n", dtype=np.uint8))
    rows_np = alph[rng.integers(0, 5, size=(n_rows, wf + halo))]
    rows = jax.device_put(jnp.asarray(rows_np))
    dalph = jnp.asarray(alph)
    bound = jnp.int32(n_rows * wf)
    m = 50
    g_rows = _group_rows(wf + halo, len(alph), n_rows)

    for P in (24, 32, 48):
        pat_raw = alph[rng.integers(0, 5, size=(P, m))]
        plens = [m] * P
        row = f"P={P:4d}:"
        base = None
        for stride in sorted({1, 2, 4, pick_stride(P), 2 * pick_stride(P)}):
            kern, thr = build_kernel(pat_raw, plens, alph, stride=stride)
            dk, dt = jnp.asarray(kern), jnp.asarray(thr)

            def f(st):
                return scan_corr_mxu(
                    rows, dk, dt, dalph, bound, jnp.int32(st),
                    wf=wf, m_max=m, n_rows=n_rows, g_rows=g_rows,
                    stride=stride,
                )

            ts = []
            out = None
            for r in range(4):
                t0 = time.perf_counter()
                out = np.asarray(f(r % 2))
                ts.append(time.perf_counter() - t0)
            t = min(ts[1:])
            if base is None:
                base = out
            ok = "" if np.array_equal(out, base) else "  MISMATCH"
            row += f"  S={stride}:{MB/t/1e3:5.2f}GB/s{ok}"
        print(row)


if __name__ == "__main__":
    main()
