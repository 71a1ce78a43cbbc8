#!/usr/bin/env python
"""Probe: fused Pallas correlation (apm.ops.corr_fused) vs the XLA conv
engine (apm.ops.corr_engine), one v5e chip, 256 MB folded rows.

The fused kernel's rooflines (module docstring): ~63 GB/s MXU at
P=6/B=2, ~6 GB/s at P=64 — vs the measured ~4-9 GB/s encode-bound and
2.3-3.2 GB/s MAC-bound XLA conv ceilings. This probe reports both
engines at P in {1, 6, 16, 64} plus the fused kernel's exactness against
the conv engine (bit-identical counts required).

Run: PYTHONPATH=/root/repo:/root/.axon_site python bench/fused_corr_probe.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print("platform:", jax.devices()[0].platform, flush=True)

    from apm.ops.corr_engine import (
        _group_rows, build_alphabet, build_kernel, n_bitplanes,
        pick_stride, scan_corr_mxu,
    )
    from apm.ops.corr_fused import (
        build_fused_tables, pick_g, scan_corr_fused,
    )

    MB = 256
    wf, halo = 8192, 128
    l128 = (wf + halo) // 128
    n_rows = (MB << 20) // wf
    rng = np.random.default_rng(0)
    alpha4 = np.frombuffer(b"ACGT", dtype=np.uint8)
    rows_np = alpha4[rng.integers(0, 4, size=(n_rows, wf + halo))]
    m_max = 50
    bound_v = n_rows * wf

    def timeit(fn, reps=4):
        outs, ts = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            outs.append(np.asarray(fn(jnp.int32(r))))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:]) if len(ts) > 1 else ts[0], outs[0]

    for P in (1, 6, 16, 64):
        pats = [alpha4[rng.integers(0, 4, size=m_max)] for _ in range(P)]
        pat_raw = np.stack(pats)
        plens = [m_max] * P
        flat = rows_np.reshape(-1)
        for t_i in range(200):
            pos = (t_i * 7919 * 1031) % (len(flat) - m_max)
            flat[pos : pos + m_max] = pat_raw[t_i % P]
        alph_np = build_alphabet([bytes(p) for p in pats])
        C = len(alph_np)
        B = n_bitplanes(C)

        rows = jax.device_put(jnp.asarray(rows_np))
        rows2 = jax.device_put(jnp.asarray(rows_np.reshape(-1, 128)))
        alph = jax.device_put(jnp.asarray(alph_np))
        bound = jnp.int32(bound_v)

        # A: XLA conv engine (with its measured-best shift-fold stride)
        S = pick_stride(P)
        kern, thr = build_kernel(pat_raw, plens, alph_np, stride=S)
        dk, dt = jnp.asarray(kern), jnp.asarray(thr)
        g_rows = _group_rows(wf + halo, C, n_rows)

        t_a, out_a = timeit(
            lambda st: scan_corr_mxu(
                rows, dk, dt, alph, bound, st,
                wf=wf, m_max=m_max, n_rows=n_rows, g_rows=g_rows,
                stride=S,
            )
        )

        # B: fused Pallas
        km, thr2 = build_fused_tables(pat_raw, plens, alph_np)
        p_pad = km.shape[1] // 64
        dk2, dt2 = jnp.asarray(km), jnp.asarray(thr2)
        g = pick_g(n_rows, l128, P)

        try:
            t_b, out_b = timeit(
                lambda st: scan_corr_fused(
                    rows2, dk2, dt2, alph, bound, st,
                    wf=wf, l128=l128, n_rows=n_rows, g=g, p=p_pad,
                    c_alpha=C, b_planes=B,
                )
            )
        except Exception as e:
            print(f"P={P:3d}: fused FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        ok = np.array_equal(out_a, out_b[:P])
        print(
            f"P={P:3d} (S={S:2d}, g={g:2d}): conv "
            f"{MB / t_a / 1e3:5.2f} GB/s ({t_a*1e3:6.1f} ms) | fused "
            f"{MB / t_b / 1e3:5.2f} GB/s ({t_b*1e3:6.1f} ms) | "
            f"x{t_a / t_b:.2f} exact={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
