#!/usr/bin/env python
"""A/B probe: ±1 bit-plane correlation (round 5) vs the r2-r4 one-hot.

Hypothesis (DESIGN §8): the k = 0 test is all-or-nothing, so C one-hot
channels can be replaced by B = ceil(log2 C) ±1 code-bit planes with the
threshold moved to B*m — halving (DNA C=4 -> B=2) both the MXU MACs
(binding at P = 64, VERDICT r4 ask #2) and the encode output elements
(binding at P <= 24, VERDICT r4 ask #1).

Measures, one v5e chip, 256 MB folded rows:
  - encode-only floors: one-hot (C channels) vs bit-plane (B channels);
  - end-to-end scan at (P=6, S=16), (P=6, S=1), (P=64, S=1), C=4 and
    C=5 alphabets — one-hot A-side re-implemented locally, B-side is
    the live engine; counts must be bit-identical.

Run: PYTHONPATH=/root/repo:/root/.axon_site python bench/bitplane_ab.py
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
    print("platform:", dev.platform, flush=True)

    from apm.ops.corr_engine import (
        _group_rows, build_kernel, n_bitplanes, pick_stride, scan_corr_mxu,
    )

    MB = 256
    wf, halo = 8192, 128
    n_rows = (MB << 20) // wf
    rng = np.random.default_rng(0)
    corpus_alpha = np.sort(np.frombuffer(b"ACGT\n", dtype=np.uint8))
    rows_np = corpus_alpha[rng.integers(0, 5, size=(n_rows, wf + halo))]
    m_max = 50

    def timeit(fn, reps=4):
        outs, ts = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            outs.append(np.asarray(fn(jnp.int32(r))))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:]) if len(ts) > 1 else ts[0], outs[0]

    def build_onehot_kernel(pat_raw, plens, alphabet, stride=1):
        """The r2-r4 one-hot kernel (A side of the A/B)."""
        P = pat_raw.shape[0]
        C = len(alphabet)
        kern = np.zeros((m_max, C, P), dtype=np.float32)
        thr = np.zeros((P,), dtype=np.float32)
        for pi in range(P):
            m = plens[pi]
            thr[pi] = m if m > 0 else np.float32(2**30)
            for i in range(m):
                ci = int(np.searchsorted(alphabet, pat_raw[pi, i]))
                kern[i, ci, pi] = 1.0
        if stride > 1:
            wk, C_, n0 = kern.shape
            ks = np.zeros((wk + stride - 1, C_, n0 * stride), np.float32)
            for s in range(stride):
                ks[s : s + wk, :, s * n0 : (s + 1) * n0] = kern
            kern, thr = ks, np.tile(thr, stride)
        return jnp.asarray(kern.astype(jnp.bfloat16)), jnp.asarray(thr)

    rows = jax.device_put(jnp.asarray(rows_np))
    bound = jnp.int32(n_rows * wf)

    for alpha_bytes, aname in ((b"ACGT", "C=4"), (b"ACGT\n", "C=5")):
        pat_alpha = np.sort(np.frombuffer(alpha_bytes, dtype=np.uint8))
        C = len(pat_alpha)
        B = n_bitplanes(C)
        alph = jax.device_put(jnp.asarray(pat_alpha))

        # -- encode-only floors (VPU cost of each encode) ---------------
        g_rows = _group_rows(wf + halo, C, n_rows)

        @jax.jit
        def enc_onehot(rows, start):
            def one(rg):
                t8 = (rg[:, :, None] == alph[None, None, :]).astype(
                    jnp.bfloat16
                )
                return jnp.sum(t8, axis=(1, 2))
            G = n_rows // g_rows
            grouped = rows[: G * g_rows].reshape(G, g_rows, wf + halo)
            return jnp.sum(jax.lax.map(one, grouped)) + start.astype(
                jnp.bfloat16
            )

        @jax.jit
        def enc_planes(rows, start):
            from apm.ops.corr_engine import _encode_planes

            def one(rg):
                return jnp.sum(
                    _encode_planes(rg, alph, B), axis=(1, 2)
                )
            G = n_rows // g_rows
            grouped = rows[: G * g_rows].reshape(G, g_rows, wf + halo)
            return jnp.sum(jax.lax.map(one, grouped)) + start.astype(
                jnp.bfloat16
            )

        @jax.jit
        def enc_planes_or(rows, start):
            # alt construction: planes as ORs of the eq columns (no rank
            # sum / shifts) — same output values.
            def one(rg):
                eq = rg[:, :, None] == alph[None, None, :]
                valid = jnp.any(eq, axis=-1)
                planes = []
                for b in range(B):
                    sel = [c for c in range(C) if (c >> b) & 1]
                    pos = eq[..., sel[0]]
                    for c in sel[1:]:
                        pos = pos | eq[..., c]
                    planes.append(
                        jnp.where(
                            pos,
                            jnp.bfloat16(1.0),
                            jnp.where(
                                valid, jnp.bfloat16(-1.0), jnp.bfloat16(0.0)
                            ),
                        )
                    )
                t8 = jnp.stack(planes, axis=-1)
                return jnp.sum(t8, axis=(1, 2))
            G = n_rows // g_rows
            grouped = rows[: G * g_rows].reshape(G, g_rows, wf + halo)
            return jnp.sum(jax.lax.map(one, grouped)) + start.astype(
                jnp.bfloat16
            )

        t, _ = timeit(lambda st: enc_onehot(rows, st))
        print(f"[{aname}] encode-only one-hot  (C={C}): "
              f"{MB / t / 1e3:.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
        t, _ = timeit(lambda st: enc_planes(rows, st))
        print(f"[{aname}] encode-only bitplane (B={B}): "
              f"{MB / t / 1e3:.2f} GB/s ({t*1e3:.1f} ms)", flush=True)
        t, _ = timeit(lambda st: enc_planes_or(rows, st))
        print(f"[{aname}] encode-only bitplaneOR (B={B}): "
              f"{MB / t / 1e3:.2f} GB/s ({t*1e3:.1f} ms)", flush=True)

        # -- end-to-end A/B ---------------------------------------------
        for P, force_S in ((6, None), (6, 1), (64, 1)):
            pats = [
                pat_alpha[rng.integers(0, C, size=m_max)] for _ in range(P)
            ]
            pat_raw = np.stack(pats)
            plens = [m_max] * P
            flat = rows_np.reshape(-1)
            for t_i in range(200):
                pos = (t_i * 7919 * 1031) % (len(flat) - m_max)
                flat[pos : pos + m_max] = pat_raw[t_i % P]
            rows_l = jax.device_put(jnp.asarray(rows_np))
            S = force_S if force_S is not None else pick_stride(P)

            # A: one-hot conv (local re-impl of the r4 engine)
            k_oh, t_oh = build_onehot_kernel(pat_raw, plens, pat_alpha, S)

            @functools.partial(jax.jit, static_argnums=(4,))
            def onehot_scan(rows_a, k_oh, t_oh, start, S):
                col = jnp.arange(wf, dtype=jnp.int32)[None, :]
                row_in_g = jnp.arange(g_rows, dtype=jnp.int32)[:, None]

                def one_group(args):
                    rg, g = args
                    t8 = (rg[:, :, None] == alph[None, None, :]).astype(
                        jnp.bfloat16
                    )
                    corr = jax.lax.conv_general_dilated(
                        t8, k_oh, window_strides=(S,), padding="VALID",
                        dimension_numbers=("NWC", "WIO", "NWC"),
                        preferred_element_type=jnp.float32,
                    )
                    match = corr[:, : wf // S, :] >= t_oh[None, None, :]
                    if S > 1:
                        match = match.reshape(
                            g_rows, wf // S, S, -1
                        ).reshape(g_rows, wf, -1)
                    r_abs = g * g_rows + row_in_g
                    limit = jnp.where(
                        r_abs < n_rows,
                        jnp.clip(bound - start - r_abs * wf, 0, wf), 0,
                    )
                    return jnp.sum(
                        match & (col < limit)[:, :, None],
                        axis=(0, 1), dtype=jnp.int32,
                    )

                G = -(-n_rows // g_rows)
                pad = G * g_rows - n_rows
                rr = (
                    jnp.pad(rows_a, ((0, pad), (0, 0))) if pad else rows_a
                )
                grouped = rr.reshape(G, g_rows, wf + halo)
                parts = jax.lax.map(
                    one_group, (grouped, jnp.arange(G, dtype=jnp.int32))
                )
                return jnp.sum(parts, axis=0, dtype=jnp.int32)

            try:
                t_a, out_a = timeit(
                    lambda st, S=S: onehot_scan(rows_l, k_oh, t_oh, st, S)
                )
            except Exception as e:
                print(f"[{aname}] P={P} S={S} one-hot FAILED: {e!r}"[:200])
                continue

            # B: the live bit-plane engine
            k_bp, t_bp = build_kernel(pat_raw, plens, pat_alpha, stride=S)
            dk, dt = jnp.asarray(k_bp), jnp.asarray(t_bp)

            def bp_scan(start, rows_l=rows_l, dk=dk, dt=dt, S=S):
                return scan_corr_mxu(
                    rows_l, dk, dt, alph, bound, start,
                    wf=wf, m_max=m_max, n_rows=n_rows, g_rows=g_rows,
                    stride=S,
                )

            t_b, out_b = timeit(bp_scan)
            ok = np.array_equal(out_a, out_b)
            print(
                f"[{aname}] P={P:3d} S={S:3d}: one-hot "
                f"{MB / t_a / 1e3:.2f} GB/s ({t_a*1e3:.1f} ms) | bitplane "
                f"{MB / t_b / 1e3:.2f} GB/s ({t_b*1e3:.1f} ms) | "
                f"x{t_a / t_b:.2f} exact={ok}",
                flush=True,
            )


if __name__ == "__main__":
    main()
