#!/usr/bin/env python
"""Probe: where does the k=0 correlation engine's time go, and does a
strided shifted-kernel conv (N = P*S output channels) beat the stride-1
conv (N = P)?

Hypothesis: at small P the MXU runs at P/128 column utilization; folding
S shifts of each pattern into the channel axis raises utilization ~S x
for ~(m+S-1)/m x FLOPs.

Run on the real chip:  PYTHONPATH=/root/repo:/root/.axon_site python bench/corr_probe.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    print("platform:", dev.platform)

    # Workload: 256 MB folded rows, reference-like patterns.
    MB = 256
    wf, halo = 8192, 128
    n_rows = (MB << 20) // wf
    rng = np.random.default_rng(0)
    alph_np = np.sort(np.frombuffer(b"ACGT\n", dtype=np.uint8))
    rows_np = alph_np[rng.integers(0, 5, size=(n_rows, wf + halo))]
    m_max, P = 50, 6
    pats = [alph_np[rng.integers(0, 5, size=m_max)] for _ in range(P)]
    pat_raw = np.stack(pats)
    plens = [m_max] * P
    # Plant matches (incl. row-boundary straddlers and near-bound) so
    # exact= below actually validates counting, not just zeros.
    flat = rows_np.reshape(-1)
    for t in range(200):
        pos = (t * 7919 * 1031) % (len(flat) - m_max)
        flat[pos : pos + m_max] = pat_raw[t % P]

    from apm.ops.corr_engine import (
        _group_rows, build_kernel, scan_corr_mxu,
    )

    kern_np, thr_np = build_kernel(pat_raw, plens, alph_np)
    g_rows = _group_rows(wf + halo, len(alph_np), n_rows)
    print(f"rows={n_rows} g_rows={g_rows} P={P} m={m_max}")

    rows = jax.device_put(jnp.asarray(rows_np))
    kern = jax.device_put(jnp.asarray(kern_np))
    thr = jax.device_put(jnp.asarray(thr_np))
    alph = jax.device_put(jnp.asarray(alph_np))
    bound = jnp.int32(n_rows * wf)

    def timeit(fn, reps=4):
        # np.asarray in timed region (block_until_ready unreliable here);
        # vary start between reps to defeat caching.
        outs = []
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            outs.append(np.asarray(fn(jnp.int32(r))))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:]) if len(ts) > 1 else ts[0], outs[0]

    # --- baseline: current engine ---
    def base(start):
        return scan_corr_mxu(
            rows, kern, thr, alph, bound, start,
            wf=wf, m_max=m_max, n_rows=n_rows, g_rows=g_rows,
        )

    t, out0 = timeit(base)
    print(f"baseline stride-1 conv: {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)  counts={out0[:P]}")

    # --- encode-only (VPU cost floor) ---
    @jax.jit
    def encode_only(rows, start):
        def one(rg):
            t8 = (rg[:, :, None] == alph[None, None, :]).astype(jnp.bfloat16)
            return jnp.sum(t8, axis=(1, 2))
        G = n_rows // g_rows
        grouped = rows[: G * g_rows].reshape(G, g_rows, wf + halo)
        return jnp.sum(jax.lax.map(one, grouped)) + start.astype(jnp.bfloat16)

    t, _ = timeit(lambda st: encode_only(rows, st))
    print(f"encode-only:            {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)")

    # --- strided shifted-kernel conv ---
    def build_strided(S):
        wk = m_max + S - 1
        C = len(alph_np)
        ks = np.zeros((wk, C, P * S), np.float32)
        ths = np.zeros((P * S,), np.float32)
        for s in range(S):
            kk = kern_np.astype(np.float32)  # (m_max, C, P)
            ks[s : s + m_max, :, s * P : (s + 1) * P] = kk
            ths[s * P : (s + 1) * P] = thr_np
        return jnp.asarray(ks.astype(jnp.bfloat16)), jnp.asarray(ths), wk

    for S in (4, 8, 16, 32):
        if wf % S:
            continue
        ks, ths, wk = build_strided(S)

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def strided(rows, start, S, wk, ks=ks, ths=ths):
            col = jnp.arange(wf, dtype=jnp.int32)[None, :]
            row_in_g = jnp.arange(g_rows, dtype=jnp.int32)[:, None]

            def one_group(args):
                rg, g = args
                t8 = (rg[:, :, None] == alph[None, None, :]).astype(jnp.bfloat16)
                # need wf/S positions of width wk at stride S:
                # last slice start = wf - S + ... covers up to wf-S+wk-1
                # <= wf + halo - 1 iff wk <= halo + S - 1. halo=128 ok.
                corr = jax.lax.conv_general_dilated(
                    t8, ks, window_strides=(S,), padding="VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.float32,
                )  # (g_rows, ~wf/S, P*S)
                corr = corr[:, : wf // S, :]
                match = corr >= ths[None, None, :]
                # channel (s*P + p) at block jb -> window jb*S + s
                m2 = match.reshape(g_rows, wf // S, S, P)
                m2 = m2.transpose(0, 1, 2, 3).reshape(g_rows, wf, P)
                r_abs = g * g_rows + row_in_g
                limit = jnp.where(
                    r_abs < n_rows,
                    jnp.clip(bound - start - r_abs * wf, 0, wf), 0,
                )
                return jnp.sum(
                    m2 & (col < limit)[:, :, None], axis=(0, 1),
                    dtype=jnp.int32,
                )

            G = -(-n_rows // g_rows)
            pad = G * g_rows - n_rows
            rr = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
            grouped = rr.reshape(G, g_rows, wf + halo)
            parts = jax.lax.map(
                one_group, (grouped, jnp.arange(G, dtype=jnp.int32))
            )
            return jnp.sum(parts, axis=0, dtype=jnp.int32)

        try:
            t, out = timeit(lambda st, S=S, wk=wk: strided(rows, st, S, wk))
        except Exception as e:
            print(f"S={S}: FAILED {type(e).__name__}: {e}")
            continue
        ok = np.array_equal(out, out0)
        print(f"S={S:3d} (N={P*S:4d}, wk={wk}): {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)  exact={ok}")

    # --- im2col matmul: flat one-hot (L*C minor), unfold via shifted
    # reshapes, one dot_general. K = ceil(wk/S)*S*C, N = P*S. ---
    C = len(alph_np)
    for S in (16, 32):
        wk = m_max + S - 1
        nb = -(-wk // S)  # shifted-reshape copies
        K = nb * S * C
        N = P * S
        # kernel matrix (K, N): window j*S+s, pattern p -> column s*P+p;
        # flat K index = (byte offset within window block) * C + channel.
        km = np.zeros((K, N), np.float32)
        for s in range(S):
            for pi in range(P):
                for i in range(m_max):
                    b = alph_np.searchsorted(pat_raw[pi, i])
                    km[(s + i) * C + b, s * P + pi] = 1.0
        kmat = jnp.asarray(km.astype(jnp.bfloat16))
        ths2 = jnp.asarray(np.tile(thr_np, S).astype(np.float32))

        @functools.partial(jax.jit, static_argnums=(2,))
        def im2col(rows, start, S, kmat=kmat, ths2=ths2, nb=nb):
            col = jnp.arange(wf, dtype=jnp.int32)[None, :]
            row_in_g = jnp.arange(g_rows, dtype=jnp.int32)[:, None]

            def one_group(args):
                rg, g = args  # (g_rows, L)
                # flat one-hot (g_rows, L*C) bf16, minor dim large
                oh = (rg[:, :, None] == alph[None, None, :]).astype(
                    jnp.bfloat16
                ).reshape(g_rows, -1)
                # unfold: nb shifted stride-(S*C) views, concat on K axis
                ys = [
                    jax.lax.dynamic_slice_in_dim(
                        oh, b * S * C, wf * C, axis=1
                    ).reshape(g_rows, wf // S, S * C)
                    for b in range(nb)
                ]
                x = jnp.concatenate(ys, axis=2)  # (g_rows, wf/S, K)
                corr = jax.lax.dot_general(
                    x, kmat,
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (g_rows, wf/S, N)
                match = corr >= ths2[None, None, :]
                m2 = match.reshape(g_rows, wf // S, S, P).reshape(
                    g_rows, wf, P
                )
                r_abs = g * g_rows + row_in_g
                limit = jnp.where(
                    r_abs < n_rows,
                    jnp.clip(bound - start - r_abs * wf, 0, wf), 0,
                )
                return jnp.sum(
                    m2 & (col < limit)[:, :, None], axis=(0, 1),
                    dtype=jnp.int32,
                )

            G = -(-n_rows // g_rows)
            pad = G * g_rows - n_rows
            rr = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
            grouped = rr.reshape(G, g_rows, wf + halo)
            parts = jax.lax.map(
                one_group, (grouped, jnp.arange(G, dtype=jnp.int32))
            )
            return jnp.sum(parts, axis=0, dtype=jnp.int32)

        try:
            t, out = timeit(lambda st, S=S: im2col(rows, st, S))
        except Exception as e:
            print(f"im2col S={S}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        ok = np.array_equal(out, out0)
        print(f"im2col S={S:3d} (K={K}, N={N}): {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)  exact={ok}")

    # --- NCW strided conv: one-hot laid out (rows, C, L) so the minor
    # dim is L (128-tileable), not C=5. ---
    for S in (16, 32):
        ks, ths, wk = build_strided(S)
        ks_oiw = jnp.transpose(ks, (2, 1, 0))  # (N, C, wk) for "OIW"

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def ncw(rows, start, S, wk, ks_oiw=ks_oiw, ths=ths):
            col = jnp.arange(wf, dtype=jnp.int32)[None, :]
            row_in_g = jnp.arange(g_rows, dtype=jnp.int32)[:, None]

            def one_group(args):
                rg, g = args
                t8 = (rg[:, None, :] == alph[None, :, None]).astype(
                    jnp.bfloat16
                )  # (g_rows, C, L)
                corr = jax.lax.conv_general_dilated(
                    t8, ks_oiw, window_strides=(S,), padding="VALID",
                    dimension_numbers=("NCW", "OIW", "NCW"),
                    preferred_element_type=jnp.float32,
                )  # (g_rows, N, wf/S)
                corr = corr[:, :, : wf // S]
                match = corr >= ths[None, :, None]  # (g_rows, N, wf/S)
                # channel s*P+p at block jb -> window jb*S+s
                m2 = match.reshape(g_rows, S, P, wf // S)
                m2 = m2.transpose(0, 3, 1, 2).reshape(g_rows, wf, P)
                r_abs = g * g_rows + row_in_g
                limit = jnp.where(
                    r_abs < n_rows,
                    jnp.clip(bound - start - r_abs * wf, 0, wf), 0,
                )
                return jnp.sum(
                    m2 & (col < limit)[:, :, None], axis=(0, 1),
                    dtype=jnp.int32,
                )

            G = -(-n_rows // g_rows)
            pad = G * g_rows - n_rows
            rr = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
            grouped = rr.reshape(G, g_rows, wf + halo)
            parts = jax.lax.map(
                one_group, (grouped, jnp.arange(G, dtype=jnp.int32))
            )
            return jnp.sum(parts, axis=0, dtype=jnp.int32)

        try:
            t, out = timeit(lambda st, S=S, wk=wk: ncw(rows, st, S, wk))
        except Exception as e:
            print(f"ncw S={S}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        ok = np.array_equal(out, out0)
        print(f"ncw    S={S:3d} (N={P*S:4d}, wk={wk}): {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)  exact={ok}")

    # --- bf16 accumulation (exact while m_max <= 256): halve corr HBM ---
    for S in (8, 16, 32):
        ks, ths, wk = build_strided(S)
        ths16 = ths.astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnums=(2, 3))
        def sb16(rows, start, S, wk, ks=ks, ths16=ths16):
            col = jnp.arange(wf, dtype=jnp.int32)[None, :]
            row_in_g = jnp.arange(g_rows, dtype=jnp.int32)[:, None]

            def one_group(args):
                rg, g = args
                t8 = (rg[:, :, None] == alph[None, None, :]).astype(
                    jnp.bfloat16
                )
                corr = jax.lax.conv_general_dilated(
                    t8, ks, window_strides=(S,), padding="VALID",
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    preferred_element_type=jnp.bfloat16,
                )
                corr = corr[:, : wf // S, :]
                match = corr >= ths16[None, None, :]
                m2 = match.reshape(g_rows, wf // S, S, P).reshape(
                    g_rows, wf, P
                )
                r_abs = g * g_rows + row_in_g
                limit = jnp.where(
                    r_abs < n_rows,
                    jnp.clip(bound - start - r_abs * wf, 0, wf), 0,
                )
                return jnp.sum(
                    m2 & (col < limit)[:, :, None], axis=(0, 1),
                    dtype=jnp.int32,
                )

            G = -(-n_rows // g_rows)
            pad = G * g_rows - n_rows
            rr = jnp.pad(rows, ((0, pad), (0, 0))) if pad else rows
            grouped = rr.reshape(G, g_rows, wf + halo)
            parts = jax.lax.map(
                one_group, (grouped, jnp.arange(G, dtype=jnp.int32))
            )
            return jnp.sum(parts, axis=0, dtype=jnp.int32)

        try:
            t, out = timeit(lambda st, S=S, wk=wk: sb16(rows, st, S, wk))
        except Exception as e:
            print(f"sb16 S={S}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        ok = np.array_equal(out, out0)
        print(f"bf16acc S={S:3d} (N={P*S:4d}, wk={wk}): {MB / t / 1e3:.2f} GB/s  ({t*1e3:.1f} ms)  exact={ok}")


if __name__ == "__main__":
    main()
