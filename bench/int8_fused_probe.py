#!/usr/bin/env python
"""Probe: int8 MXU operands for the fused correlation at wide P.

At P >= 32 the fused kernel is MXU-bound (59% of its 6.0 GB/s bf16
roof at P = 64, DESIGN §9). v5e's int8 MXU path is 2x bf16 peak and the
±1/0 planes fit int8 exactly, so an int8 variant has a 12 GB/s roof —
IF Mosaic lowers `jnp.dot(i8, i8, preferred_element_type=i32)` onto the
int8 MXU mode and the i32→i8 plane conversion doesn't eat the gain
(the XLA-conv int8 attempt lost to layout juggling, DESIGN §8).

Run: PYTHONPATH=/root/repo:/root/.axon_site python bench/int8_fused_probe.py
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("platform:", jax.devices()[0].platform, flush=True)

    from apm.ops.corr_engine import build_alphabet, n_bitplanes
    from apm.ops.corr_fused import (
        S_FUSED, build_fused_tables, pick_g, scan_corr_fused,
    )

    MB = 256
    wf, halo = 8192, 128
    l128 = (wf + halo) // 128
    n_rows = (MB << 20) // wf
    rng = np.random.default_rng(0)
    alpha4 = np.frombuffer(b"ACGT", np.uint8)
    rows_np = alpha4[rng.integers(0, 4, size=(n_rows, wf + halo))]
    m_max = 50

    def timeit(fn, reps=4):
        outs, ts = [], []
        for r in range(reps):
            t0 = time.perf_counter()
            outs.append(np.asarray(fn(jnp.int32(r))))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:]), outs[0]

    for P in (32, 64):
        pats = [alpha4[rng.integers(0, 4, size=m_max)] for _ in range(P)]
        pat_raw = np.stack(pats)
        flat = rows_np.reshape(-1)
        for t_i in range(200):
            pos = (t_i * 7919 * 1031) % (len(flat) - m_max)
            flat[pos : pos + m_max] = pat_raw[t_i % P]
        alph_np = build_alphabet([bytes(p) for p in pats])
        C = len(alph_np)
        B = n_bitplanes(C)
        km_bf, thr_f = build_fused_tables(pat_raw, [m_max] * P, alph_np)
        p_pad = km_bf.shape[1] // S_FUSED
        sp = S_FUSED * p_pad
        g = pick_g(n_rows, l128, p_pad)
        rows2 = jax.device_put(jnp.asarray(rows_np.reshape(-1, 128)))
        alph = jax.device_put(jnp.asarray(alph_np))
        bound = jnp.int32(n_rows * wf)

        # baseline: shipped bf16 fused kernel
        t_a, out_a = timeit(
            lambda st: scan_corr_fused(
                rows2, jnp.asarray(km_bf), jnp.asarray(thr_f), alph,
                bound, st, wf=wf, l128=l128, n_rows=n_rows, g=g,
                p=p_pad, c_alpha=C, b_planes=B,
            )
        )

        # int8 variant (standalone kernel copy)
        km_i8 = np.asarray(km_bf, dtype=np.float32).astype(np.int8)
        thr_i = thr_f.astype(np.int32)
        block = g * l128
        nch = sp if sp <= 1536 else 1024

        def kern(meta_ref, alph_ref, text_ref, km_ref, thr_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            m_rows = block
            tx = text_ref[:].astype(jnp.int32)
            r1 = pltpu.roll(tx, shift=64, axis=1)
            r2 = pltpu.roll(r1, shift=m_rows - 1, axis=0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 128), 1)
            txs = jnp.where(lane < 64, r1, r2)

            def planes_of(t32):
                eqs = [t32 == alph_ref[0, c] for c in range(C)]
                valid = eqs[0]
                for e in eqs[1:]:
                    valid = jnp.logical_or(valid, e)
                neg = jnp.where(valid, jnp.int32(-1), jnp.int32(0))
                out = []
                for b in range(B):
                    sel = [c for c in range(C) if (c >> b) & 1]
                    pos = eqs[sel[0]]
                    for c in sel[1:]:
                        pos = jnp.logical_or(pos, eqs[c])
                    out.append(
                        jnp.where(pos, jnp.int32(1), neg).astype(jnp.int8)
                    )
                return out

            bound_v = meta_ref[0, 0]
            start = meta_ref[0, 1]
            rho1 = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
            u1 = rho1 % l128
            r_abs = i * g + rho1 // l128
            limit1 = jnp.where(
                r_abs < n_rows,
                jnp.clip(bound_v - start - r_abs * wf, 0, wf),
                0,
            )
            base1 = u1 * 128
            phases = ((0, planes_of(tx)), (1, planes_of(txs)))
            cnts = []
            for c0 in range(0, sp, nch):
                nc = min(nch, sp - c0)
                thrc = thr_ref[0:1, c0 : c0 + nc]
                s_col = (
                    c0
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (m_rows, nc), 1
                    )
                ) // p_pad
                cnt = None
                for phase, pls in phases:
                    acc = jnp.dot(
                        pls[0],
                        km_ref[0:128, c0 : c0 + nc],
                        preferred_element_type=jnp.int32,
                    )
                    for b in range(1, B):
                        acc = acc + jnp.dot(
                            pls[b],
                            km_ref[b * 128 : (b + 1) * 128, c0 : c0 + nc],
                            preferred_element_type=jnp.int32,
                        )
                    j = base1 + s_col + phase * 64
                    match = jnp.logical_and(acc >= thrc, j < limit1)
                    c = jnp.sum(
                        match.astype(jnp.int32), axis=0, keepdims=True
                    )
                    cnt = c if cnt is None else cnt + c
                cnts.append(cnt)
            total = (
                cnts[0] if len(cnts) == 1 else jnp.concatenate(cnts, axis=1)
            )
            out_ref[:] += total

        @functools.partial(jax.jit)
        def run_i8(rows2, km, thr, alph2, meta):
            r2v = rows2.shape[0]
            pad = (-r2v) % block
            rr = jnp.pad(rows2, ((0, pad), (0, 0))) if pad else rows2
            grid = rr.shape[0] // block
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0, grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((block, 128), lambda i: (i, 0)),
                    pl.BlockSpec((B * 128, sp), lambda i: (0, 0)),
                    pl.BlockSpec((1, sp), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, sp), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            )
            out = pl.pallas_call(
                kern, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((1, sp), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                ),
            )(meta, alph2, rr, km, thr)
            return jnp.sum(out.reshape(S_FUSED, p_pad), axis=0)

        dk8 = jnp.asarray(km_i8)
        dt8 = jnp.asarray(thr_i)
        alph2 = jnp.asarray(alph_np[None, :].astype(np.int32))

        def f8(st):
            meta = jnp.stack([bound, st]).reshape(1, 2)
            return run_i8(rows2, dk8, dt8, alph2, meta)

        try:
            t_b, out_b = timeit(f8)
        except Exception as e:
            print(f"P={P}: int8 FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        ok = np.array_equal(out_a, out_b)
        print(
            f"P={P:3d} (g={g}): bf16 {MB / t_a / 1e3:5.2f} GB/s "
            f"({t_a*1e3:6.1f} ms) | int8 {MB / t_b / 1e3:5.2f} GB/s "
            f"({t_b*1e3:6.1f} ms) | x{t_a / t_b:.2f} exact={ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
