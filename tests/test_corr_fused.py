"""Conformance for the fused Pallas correlation (apm.ops.corr_fused).

The fused kernel must match the XLA conv engine (itself oracle-
conformance-tested in test_corr.py) bit-for-bit on counts — including
window-bound clipping, group padding, the column-chunked wide-P path,
mixed pattern lengths, and NUL-bearing binary alphabets (the staging
padding aliasing case the n_rows mask exists for).
"""

import numpy as np
import pytest

import apm
from apm import ApmConfig


def _rows_of(corpus, wf, halo, n_rows):
    rows = np.zeros((n_rows, wf + halo), np.uint8)
    for r in range(n_rows):
        seg = corpus[r * wf : r * wf + wf + halo]
        rows[r, : len(seg)] = seg
    return rows


def _both(rows, pats, plens, bound, start, wf, halo, n_rows, g_rows=7):
    import jax.numpy as jnp

    from apm.ops.corr_engine import (
        build_alphabet, build_kernel, n_bitplanes, scan_corr_mxu,
    )
    from apm.ops.corr_fused import (
        S_FUSED, build_fused_tables, scan_corr_fused,
    )

    m_max = max(plens)
    pat_raw = np.zeros((len(pats), m_max), np.uint8)
    for i, p in enumerate(pats):
        pat_raw[i, : len(p)] = np.frombuffer(p, np.uint8)
    alph = build_alphabet(pats)
    kern, thr = build_kernel(pat_raw, plens, alph)
    ref = np.asarray(
        scan_corr_mxu(
            jnp.asarray(rows), jnp.asarray(kern), jnp.asarray(thr),
            jnp.asarray(alph), jnp.asarray(bound, jnp.int32),
            jnp.asarray(start, jnp.int32),
            wf=wf, m_max=m_max, n_rows=n_rows, g_rows=g_rows,
        )
    )
    km, thr2 = build_fused_tables(pat_raw, plens, alph)
    got = np.asarray(
        scan_corr_fused(
            jnp.asarray(rows), jnp.asarray(km), jnp.asarray(thr2),
            jnp.asarray(alph), jnp.asarray(bound, jnp.int32),
            jnp.asarray(start, jnp.int32),
            wf=wf, l128=(wf + halo) // 128, n_rows=n_rows, g=8,
            p=km.shape[1] // S_FUSED, c_alpha=len(alph),
            b_planes=n_bitplanes(len(alph)), interpret=True,
        )
    )
    return ref, got[: len(pats)]


def _corpus(n, seed, alphabet=b"ACGT"):
    rng = np.random.default_rng(seed)
    a = np.frombuffer(alphabet, np.uint8)
    return a[rng.integers(0, len(a), size=n)]


def test_fused_matches_conv_basic():
    wf, halo, n_rows = 512, 128, 21
    corpus = _corpus(n_rows * wf + 200, 5)
    pats = [b"ACGTACGTACGTAC", bytes(corpus[3000:3050]), b"TTTTT"]
    for t in range(30):
        pos = (t * 7717) % (len(corpus) - 50)
        pat = pats[t % 3]
        corpus[pos : pos + len(pat)] = np.frombuffer(pat, np.uint8)
    plens = [len(p) for p in pats]
    bound = len(corpus) - max(plens) + 1
    rows = _rows_of(corpus, wf, halo, n_rows)
    ref, got = _both(rows, pats, plens, bound, 0, wf, halo, n_rows)
    assert ref.sum() > 0
    assert got.tolist() == ref.tolist()


def test_fused_wide_p_chunked_and_padded():
    # 27 patterns -> 64*27 = 1728 > _SINGLE_MAX: column chunking + the
    # odd-P padding slot.
    wf, halo, n_rows = 512, 128, 9
    corpus = _corpus(n_rows * wf + 100, 6)
    pats = [bytes(_corpus(33, 100 + i)) for i in range(27)]
    for i, p in enumerate(pats):
        pos = 100 + i * 97
        corpus[pos : pos + 33] = np.frombuffer(p, np.uint8)
    plens = [33] * 27
    bound = len(corpus) - 33 + 1
    rows = _rows_of(corpus, wf, halo, n_rows)
    ref, got = _both(rows, pats, plens, bound, 0, wf, halo, n_rows)
    assert ref.sum() >= 27
    assert got.tolist() == ref.tolist()


def test_fused_bound_clip_and_start():
    wf, halo, n_rows = 512, 128, 13
    corpus = _corpus(n_rows * wf + 100, 7)
    pats = [bytes(corpus[100:140])]
    plens = [40]
    rows = _rows_of(corpus, wf, halo, n_rows)
    start = 4 * wf
    bound = start + 7 * wf - 333  # mid-row clip
    ref, got = _both(
        rows[4:], pats, plens, bound, start, wf, halo, n_rows - 4
    )
    assert got.tolist() == ref.tolist()


def test_fused_nul_alphabet_padding_mask():
    # NUL is IN the alphabet: zero-filled staging padding rows would
    # alias real symbols; the n_rows mask must keep them silent.
    wf, halo, n_rows = 512, 128, 5
    rng = np.random.default_rng(8)
    a = np.frombuffer(b"\x00\x01", np.uint8)
    corpus = a[rng.integers(0, 2, size=n_rows * wf - 64)]  # short tail
    pats = [b"\x00" * 12, bytes(corpus[64:96])]
    plens = [len(p) for p in pats]
    bound = len(corpus) - max(plens) + 1
    rows = _rows_of(corpus, wf, halo, n_rows)
    ref, got = _both(rows, pats, plens, bound, 0, wf, halo, n_rows)
    assert ref.sum() > 0  # all-NUL runs occur at this density
    assert got.tolist() == ref.tolist()


def test_scanner_corr_impl_dispatch_and_conformance():
    from apm.utils.oracle import count_matches

    corpus = _corpus(200_000, 9)
    pats = [bytes(corpus[500:550]), bytes(corpus[70_000:70_032]), b"ACGT" * 13]
    expected = count_matches(corpus, pats, 0)
    outs = {}
    for impl in ("conv", "fused", "auto"):
        sc = apm.Scanner(
            pats, 0,
            ApmConfig(backend="pallas", interpret=True, corr_impl=impl,
                      engine="corr"),
        )
        outs[impl] = sc.count(corpus).tolist()
    assert outs["conv"] == expected
    assert outs["fused"] == expected
    assert outs["auto"] == expected


def test_corr_impl_fused_raises_when_ineligible():
    # m_max = 120 > M_MAX_FUSED (97): 'fused' must refuse, 'auto' must
    # fall back to the conv engine with identical counts.
    from apm.utils.oracle import count_matches

    corpus = _corpus(100_000, 10)
    pats = [bytes(corpus[1000:1120])]
    expected = count_matches(corpus, pats, 0)
    sc = apm.Scanner(
        pats, 0,
        ApmConfig(backend="pallas", interpret=True, corr_impl="fused",
                  engine="corr"),
    )
    with pytest.raises(ValueError):
        sc.count(corpus)
    sc_auto = apm.Scanner(
        pats, 0,
        ApmConfig(backend="pallas", interpret=True, corr_impl="auto",
                  engine="corr"),
    )
    assert sc_auto.count(corpus).tolist() == expected


def test_fused_phase1_e2e_k1_k2():
    """k >= 1 e2e counts through the fused piece scan must equal the
    conv-phase-1 counts and the oracle, incl. boundary-straddling
    plants."""
    from apm.utils.corpus import plant
    from apm.utils.oracle import count_matches

    corpus = _corpus(300_000, 11)
    pats = [bytes(corpus[900:950]), bytes(corpus[123_456:123_506])]
    for kk in (1, 2):
        c = corpus.copy()
        plant(c, np.frombuffer(pats[0], np.uint8),
              [5000, 65_536 * 2 - 25, 150_000, 299_000], k=kk, seed=3)
        expected = count_matches(c, pats, kk)
        outs = {}
        for impl in ("conv", "fused"):
            sc = apm.Scanner(
                pats, kk,
                ApmConfig(backend="pallas", interpret=True,
                          corr_impl=impl),
            )
            outs[impl] = sc.count(c).tolist()
        assert outs["conv"] == expected, kk
        assert outs["fused"] == expected, kk


def test_fused_phase1_rowmap_superset():
    """scan_pieces_fused's rowmap must cover every row scan_pieces_conv
    flags for OWNED windows (candidacy soundness; the fused map may be
    a superset on halo-tail positions)."""
    import jax.numpy as jnp

    from apm.ops.corr_engine import (
        build_alphabet, build_piece_kernel, n_bitplanes, scan_pieces_conv,
    )
    from apm.ops.corr_fused import (
        S_FUSED, build_fused_piece_tables, scan_pieces_fused,
    )

    k = 1
    wf, halo, n_rows = 512, 128, 11
    corpus = _corpus(n_rows * wf + 90, 12)
    pats = [bytes(corpus[5000:5040]), bytes(corpus[3000:3050])]
    plens = tuple(len(p) for p in pats)
    m_max = max(plens)
    bound = len(corpus) - m_max + 1
    rows = _rows_of(corpus, wf, halo, n_rows)
    pat_raw = np.zeros((len(pats), m_max), np.uint8)
    for i, p in enumerate(pats):
        pat_raw[i, : len(p)] = np.frombuffer(p, np.uint8)
    alph = build_alphabet(pats)

    ck, ct, co = build_piece_kernel(pat_raw, plens, k, alph)
    fc_c, rm_c = scan_pieces_conv(
        jnp.asarray(rows), jnp.asarray(ck), jnp.asarray(ct),
        jnp.asarray(co), jnp.asarray(alph),
        jnp.asarray(bound, jnp.int32), jnp.asarray(0, jnp.int32),
        wf=wf, w_kern=ck.shape[0], n_rows=n_rows, g_rows=5,
    )
    km, thr, ow64 = build_fused_piece_tables(pat_raw, plens, k, alph)
    fc_f, rm_f = scan_pieces_fused(
        jnp.asarray(rows), jnp.asarray(km), jnp.asarray(thr),
        jnp.asarray(ow64), jnp.asarray(alph),
        jnp.asarray(bound, jnp.int32), jnp.asarray(0, jnp.int32),
        wf=wf, l128=(wf + halo) // 128, n_rows=n_rows, g=8,
        n_slots=km.shape[1] // S_FUSED, p_pat=ow64.shape[1],
        c_alpha=len(alph), b_planes=n_bitplanes(len(alph)),
        interpret=True,
    )
    rm_c, rm_f = np.asarray(rm_c), np.asarray(rm_f)
    fc_c, fc_f = np.asarray(fc_c), np.asarray(fc_f)
    assert fc_c.sum() > 0 and fc_f.sum() > 0
    # zero-iff-zero per pattern, and fused rows cover conv rows
    assert ((fc_c > 0) == (fc_f > 0)).all()
    assert np.all(rm_f[rm_c > 0] > 0)


def test_fused_int8_wide_p():
    # P >= _INT8_MIN_SLOTS: int8 MXU operands (2x-peak mode) — counts
    # must stay bit-identical to the conv engine.
    from apm.ops.corr_fused import _INT8_MIN_SLOTS, build_fused_tables

    wf, halo, n_rows = 512, 128, 9
    corpus = _corpus(n_rows * wf + 100, 15)
    P = _INT8_MIN_SLOTS + 1
    pats = [bytes(_corpus(20, 300 + i)) for i in range(P)]
    for i, p in enumerate(pats):
        pos = 50 + i * 131
        corpus[pos : pos + 20] = np.frombuffer(p, np.uint8)
    plens = [20] * P
    bound = len(corpus) - 20 + 1
    rows = _rows_of(corpus, wf, halo, n_rows)
    pat_raw = np.stack([np.frombuffer(p, np.uint8) for p in pats])
    from apm.ops.corr_engine import build_alphabet

    km, thr = build_fused_tables(
        pat_raw, plens, build_alphabet(pats)
    )
    assert km.dtype == np.int8 and thr.dtype == np.int32
    ref, got = _both(rows, pats, plens, bound, 0, wf, halo, n_rows)
    assert ref.sum() >= P
    assert got.tolist() == ref.tolist()


def test_fused_s32_midlength_patterns():
    """m in (66, 97] routes the S = 32 four-phase layout; counts must
    match the conv engine and the oracle end to end."""
    from apm.ops.corr_fused import pick_s
    from apm.utils.oracle import count_matches

    assert pick_s(80) == 32 and pick_s(65) == 64 and pick_s(97) == 32
    corpus = _corpus(200_000, 16)
    pats = [bytes(corpus[500:580]), bytes(corpus[70_000:70_097])]
    for i, p in enumerate(pats):  # extra planted copies
        for pos in (12_345 + i * 7, 150_001 + i * 13):
            corpus[pos : pos + len(p)] = np.frombuffer(p, np.uint8)
    expected = count_matches(corpus, pats, 0)
    outs = {}
    for impl in ("conv", "fused"):
        sc = apm.Scanner(
            pats, 0,
            ApmConfig(backend="pallas", interpret=True, corr_impl=impl,
                      engine="corr"),
        )
        outs[impl] = sc.count(corpus).tolist()
    assert outs["conv"] == expected
    assert outs["fused"] == expected
    assert sum(expected) >= 2  # plants overlap; non-trivial is enough


def test_fp1_default_routing_is_conv(monkeypatch):
    """auto must route phase 1 to the XLA piece conv (the fused piece
    scan measured 0.83x at k=4 — DESIGN §8); corr_impl='fused' pins the
    Pallas path. Guard the routing with a tripwire monkeypatch."""
    import apm.ops.fused as fused_mod

    corpus = _corpus(120_000, 20)
    pats = [bytes(corpus[500:550]), bytes(corpus[60_000:60_050])]

    calls = {"fused": 0}
    real = fused_mod.filter_verify_chunk_fused

    def spy(*a, **kw):
        calls["fused"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(fused_mod, "filter_verify_chunk_fused", spy)
    # scanner imports the symbol lazily from the module, so the spy is
    # what _fp1_call resolves.
    sc = apm.Scanner(
        pats, 4, ApmConfig(backend="pallas", interpret=True)
    )
    sc.count(corpus)
    assert calls["fused"] == 0  # auto -> conv phase 1

    sc2 = apm.Scanner(
        pats, 4,
        ApmConfig(backend="pallas", interpret=True, corr_impl="fused"),
    )
    sc2.count(corpus)
    assert calls["fused"] > 0  # pinned -> Pallas piece scan
