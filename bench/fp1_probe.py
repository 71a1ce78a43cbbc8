#!/usr/bin/env python
"""Probe: where does the k >= 1 conv-phase-1 pipeline's time go?

VERDICT r2 weak #1: k=1 end-to-end runs ~1.0-1.5 GB/s while the k=0 corr
engine (same one-hot + conv structure) reaches 2.3-4.9 GB/s and the
encode-only floor is ~8.4 GB/s. This decomposes one 256 MB chunk's cost:

  1. end-to-end Scanner.count (k=1, auto)       — what the user sees
  2. filter_verify_chunk_conv (fused program)   — phase 1 + epilogue
  3. scan_pieces_conv alone (phase 1)           — the conv + rowmap
  4. phase-1 conv WITHOUT rowmap/owner fold     — just conv+threshold+sum
  5. scan_corr_mxu k=0 on the same patterns     — the structural twin
  6. encode-only                                — VPU floor
  7. host-side costs (fingerprint hash, tail)   — non-device overhead

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python bench/fp1_probe.py
"""

import time

import numpy as np


def timeit(fn, reps=4):
    """min-of-(reps-1) wall times, first rep discarded (warm dispatch);
    fn takes a varying int so consecutive reps can't be served from any
    cache. np.asarray in the timed region (block_until_ready is
    unreliable over the tunnel)."""
    ts, outs = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        outs.append(np.asarray(fn(r)))
        ts.append(time.perf_counter() - t0)
    return (min(ts[1:]) if len(ts) > 1 else ts[0]), outs[-1]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import apm
    from apm.models.pipeline import make_plan
    from apm.ops.common import fold_corpus
    from apm.ops.corr_engine import (
        _group_rows, build_kernel, build_piece_kernel, pick_stride,
        scan_corr_mxu, scan_pieces_conv,
    )
    from apm.ops.fused import filter_verify_chunk_conv
    from apm.utils.corpus import plant

    print("platform:", jax.devices()[0].platform)

    MB = 256
    dna = "/root/reference/dna"
    pats = [open(f"{dna}/line_non_existent.fa", "rb").read()] + [
        open(f"{dna}/line_20783.fa", "rb").read()
    ] * 5
    k = 1
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGT\n", dtype=np.uint8)
    buf = alpha[rng.integers(0, 5, size=MB << 20)]
    plant(buf, np.frombuffer(pats[1], np.uint8),
          list(range(5000, (MB - 4) << 20, 1 << 20)), k=1, seed=7)

    sc = apm.Scanner(pats, k=k)
    n = len(buf)
    plan = make_plan(sc, n, "pallas")
    print(f"plan: wf={plan.wf} halo={plan.halo} fp1_conv={plan.fp1_conv} "
          f"plens_filter={plan.plens_filter}")
    assert plan.fp1_conv

    # --- 1. end-to-end ---
    t, out = timeit(lambda r: sc.count(buf), reps=4)
    print(f"1. end-to-end count():     {MB/t/1e3:6.2f} GB/s ({t*1e3:7.1f} ms) "
          f"counts={out[:2]}")

    # Staged rows (one chunk), device-resident.
    wf, halo = plan.wf, plan.halo
    dev_bound = plan.dev_bound
    n_rows = -(-dev_bound // wf)
    n_rows += (-n_rows) % 8
    drows = jax.device_put(jnp.asarray(fold_corpus(buf, 0, n_rows, wf, halo)))
    dbound = jnp.int32(dev_bound)
    alph_np = sc._corr_alphabet()
    dalph = jnp.asarray(alph_np)
    dpat = jnp.asarray(sc._pat)
    C = len(alph_np)
    g_rows = _group_rows(wf + halo, C, n_rows)
    print(f"rows={n_rows} g_rows={g_rows} groups={-(-n_rows // g_rows)}")

    pk_np, pt_np, ow_np, s0 = sc._fp1_kernel(plan.plens_filter)
    dpk, dpt, dow = map(jnp.asarray, (pk_np, pt_np, ow_np))
    print(f"piece kernel: w_kern={pk_np.shape[0]} N*S={pk_np.shape[2]} "
          f"stride={s0}")

    # --- 2. fused phase1+phase2 program ---
    def fused(r):
        packed, _ = filter_verify_chunk_conv(
            drows, dpk, dpt, dow, dalph, dpat, dbound, jnp.int32(r),
            k=k, m_max=sc.m_max, wf=wf, halo=halo,
            plens=plan.plens_filter, w_kern=pk_np.shape[0],
            n_rows=n_rows, g_rows=g_rows, fp1_stride=s0,
            alphabet=sc._dp_alphabet(),
        )
        return packed
    t, _ = timeit(fused)
    print(f"2. fused conv p1+p2:       {MB/t/1e3:6.2f} GB/s ({t*1e3:7.1f} ms)")

    # --- 3. phase 1 alone ---
    def p1(r):
        fcnt, rm = scan_pieces_conv(
            drows, dpk, dpt, dow, dalph, dbound, jnp.int32(r),
            wf=wf, w_kern=pk_np.shape[0], n_rows=n_rows, g_rows=g_rows,
            stride=s0,
        )
        return fcnt
    t, fc = timeit(p1)
    print(f"3. scan_pieces_conv:       {MB/t/1e3:6.2f} GB/s ({t*1e3:7.1f} ms) "
          f"fcnt={fc[:2]}")

    # --- 3b. phase 1 at other strides ---
    for S in (1, 4, 8, 16):
        if S == s0:
            continue
        pkS, ptS, owS = build_piece_kernel(
            sc._pat_raw, plan.plens_filter, k, alph_np, stride=S)
        dpkS, dptS, dowS = map(jnp.asarray, (pkS, ptS, owS))

        def p1S(r, dpkS=dpkS, dptS=dptS, dowS=dowS, S=S, wk=pkS.shape[0]):
            fcnt, rm = scan_pieces_conv(
                drows, dpkS, dptS, dowS, dalph, dbound, jnp.int32(r),
                wf=wf, w_kern=wk, n_rows=n_rows, g_rows=g_rows, stride=S,
            )
            return fcnt
        t, _ = timeit(p1S)
        print(f"3b. p1 stride={S:<2}:          {MB/t/1e3:6.2f} GB/s "
              f"({t*1e3:7.1f} ms)")

    # --- 4. conv + threshold + plain sum (no rowmap, no owner fold) ---
    import functools

    @functools.partial(jax.jit, static_argnames=("S", "wk"))
    def conv_only(rows, start, S, wk, kern, thr):
        def one(args):
            rg, g = args
            if S > 1:
                rg = jnp.pad(rg, ((0, 0), (0, S - 1)))
            t8 = (rg[:, :, None] == dalph[None, None, :]).astype(jnp.bfloat16)
            corr = jax.lax.conv_general_dilated(
                t8, kern, window_strides=(S,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
            )
            hit = corr >= thr[None, None, :]
            return jnp.sum(hit, axis=(0, 1), dtype=jnp.int32)
        G = -(-rows.shape[0] // g_rows)
        pad = G * g_rows - rows.shape[0]
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        grouped = rows.reshape(G, g_rows, wf + halo)
        parts = jax.lax.map(one, (grouped, jnp.arange(G, dtype=jnp.int32)))
        return jnp.sum(parts, axis=0) + start

    t, _ = timeit(lambda r: conv_only(drows, jnp.int32(r), S=s0,
                                      wk=pk_np.shape[0], kern=dpk, thr=dpt))
    print(f"4. conv+thr+sum only:      {MB/t/1e3:6.2f} GB/s ({t*1e3:7.1f} ms)")

    # --- 5. k=0 corr on the same pattern set (structural twin) ---
    plens0 = sc._plens_static
    S0 = pick_stride(sc._pat_raw.shape[0])
    k0_kern, k0_thr = build_kernel(sc._pat_raw, plens0, alph_np, stride=S0)
    dk0, dt0 = jnp.asarray(k0_kern), jnp.asarray(k0_thr)

    def corr0(r):
        return scan_corr_mxu(
            drows, dk0, dt0, dalph, dbound, jnp.int32(r),
            wf=wf, m_max=sc.m_max, n_rows=n_rows, g_rows=g_rows, stride=S0,
        )
    t, _ = timeit(corr0)
    print(f"5. scan_corr_mxu k=0 S={S0:<2}: {MB/t/1e3:6.2f} GB/s "
          f"({t*1e3:7.1f} ms)")

    # --- 6. encode-only floor ---
    @jax.jit
    def encode_only(rows, start):
        def one(rg):
            t8 = (rg[:, :, None] == dalph[None, None, :]).astype(jnp.bfloat16)
            return jnp.sum(t8, axis=(1, 2))
        G = -(-rows.shape[0] // g_rows)
        pad = G * g_rows - rows.shape[0]
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        grouped = rows.reshape(G, g_rows, wf + halo)
        return jnp.sum(jax.lax.map(one, grouped)) + start.astype(jnp.bfloat16)

    t, _ = timeit(lambda r: encode_only(drows, jnp.int32(r)))
    print(f"6. encode-only floor:      {MB/t/1e3:6.2f} GB/s ({t*1e3:7.1f} ms)")

    # --- 7. host-side overheads ---
    t0 = time.perf_counter()
    sc._fingerprint(buf)
    t_fp = time.perf_counter() - t0
    t0 = time.perf_counter()
    sc.tail_counts(buf, dev_bound)
    t_tail = time.perf_counter() - t0
    t0 = time.perf_counter()
    fold_corpus(buf, 0, n_rows, wf, halo)
    t_fold = time.perf_counter() - t0
    print(f"7. host: fingerprint={t_fp*1e3:.1f} ms  tail={t_tail*1e3:.1f} ms  "
          f"fold(stage)={t_fold*1e3:.1f} ms")

    # --- 8. staged-row cache hit + fetch round trip ---
    fp = sc._fingerprint(buf)
    t0 = time.perf_counter()
    sc._staged_rows(buf, fp, 0, 32768, wf, halo)
    t_hit = time.perf_counter() - t0
    h = jnp.int32(1) + jnp.int32(2)
    t0 = time.perf_counter()
    np.asarray(h)
    t_rt = time.perf_counter() - t0
    print(f"8. cache-hit stage={t_hit*1e3:.1f} ms  tiny-fetch RT="
          f"{t_rt*1e3:.1f} ms")


if __name__ == "__main__":
    main()
