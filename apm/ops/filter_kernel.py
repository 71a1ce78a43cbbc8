"""Pallas pigeonhole-filtration kernel: exact-piece candidate scan.

The classic filtration theorem (Navarro's taxonomy; used by nrgrep/agrep):
split a pattern of length ``m`` into ``k + 1`` contiguous pieces — any
equal-length window within edit distance ``k`` must contain at least one
piece *exactly*, at an offset shifted from the piece's home position by at
most ``k`` (each unit of shift costs one indel). Phase 1 therefore runs a
cheap exact-match AND-chain per piece (2 VPU ops per DP step instead of the
banded kernel's ~20) and ORs the shifted piece hits into a candidate mask;
phase 2 (in apm.models.scanner) verifies the rare candidates with the NumPy
oracle, one staging row (wf windows) at a time. For ``k = 0`` the single
"piece" is the whole pattern and the candidate mask IS the answer — no
verification.

The reference has no analog of this; its kernels always run the full
O(m^2) DP per window (``src/utils.c:76-99``).

Kernel layout mirrors apm.ops.pallas_kernel: corpus staged as overlapping
``(R, wf + halo)`` uint8 rows, window ``j`` at row ``j // wf`` lane
``j % wf``, one ``(FOLD, wf + halo)`` block per grid step. Two int32 text
tiles roll one lane per step: ``text`` (piece 0 reads it at lane = window
position) and ``text_k`` = text pre-rotated by ``k`` (pieces >= 1 read it,
storing their hit mask at lane = position + k so the negative shifts of the
OR-combine become non-negative static slices; ``halo >= m + 2k`` keeps the
rotation's wrapped lanes out of every read). Piece boundaries are static
(pattern lengths are trace-time constants), so the step loop is segmented
exactly like the banded kernel and piece-mask capture costs nothing.

Outputs are deliberately tiny (the device sits behind whatever link the
host has): accumulated per-pattern totals plus a per-(staging row, pattern)
candidate count map for targeted verification. The row map stays on device
unless a pattern's total is nonzero — zero-candidate scans never pay the
transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 8  # fold-8 int32 layout, same as the banded kernel


def pieces_of(m: int, k: int):
    """Static piece table: [(offset, length)] — k+1 contiguous pieces."""
    l = m // (k + 1)
    return [(i * l, l if i < k else m - k * l) for i in range(k + 1)]


def shift_range(o: int, li: int, m: int, k: int):
    """Allowed occurrence shifts for the piece at [o, o+li) (see module doc)."""
    return (-min(o, k), min(k, m - o - li))


def filter_eligible(m: int, k: int) -> bool:
    """Filtration applies when pieces are long enough to be selective and
    to keep the pre-rotated text reads off the wrapped lanes.

    The phase-1 AND-chain cost is ~independent of k (each pattern char is
    processed once; only the shift-OR grows, by 2k+1 ops per piece), so
    what bounds k is *selectivity*: a random window triggers a piece with
    probability ~ (k+1)(2k+1) / alphabet^piece_len, and a staging row
    (wf ~ 8k windows) must stay cold for verification to pay. piece_len
    >= 8 keeps DNA rows cold through k = 4 (round-1 measured); k in
    [5, 8] needs piece_len >= 14 ((9)(17)/4^14 ~ 6e-7 per window). The
    density fallback still protects pathological corpora either way.
    """
    if k == 0:
        return m >= 1
    if 1 <= k <= 4:
        return m // (k + 1) >= max(k, 8)
    return 5 <= k <= 8 and m // (k + 1) >= 14


def partition_plens(plens: tuple, k: int, engine: str):
    """Split a static length tuple into (fmask, filtration, banded-DP)."""
    use = engine in ("auto", "filter")
    fmask = tuple(use and m > 0 and filter_eligible(m, k) for m in plens)
    plens_filter = tuple(m if f else 0 for m, f in zip(plens, fmask))
    plens_dp = tuple(0 if f else m for m, f in zip(plens, fmask))
    return fmask, plens_filter, plens_dp


def _filter_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start]
    pchar_ref,  # SMEM (P, m_max) int32 — pattern chars (no k padding)
    corpus_ref,  # VMEM (FOLD, wf + halo) uint8
    out_ref,  # VMEM (P * FOLD, 1) int32 — accumulated candidate counts
    rowmap_ref,  # VMEM (FOLD, P) int32 — this block's per-row counts
    *,
    k: int,
    m_max: int,
    wf: int,
    plens: tuple,
):
    i = pl.program_id(0)
    p = len(plens)
    w = FOLD * wf
    L = wf + 2 * k

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowmap_ref[:] = jnp.zeros_like(rowmap_ref)  # covers padding patterns

    active = sorted({m for m in plens if m > 0})
    if not active:
        return

    text0 = corpus_ref[:].astype(jnp.int32)  # (FOLD, wpf)
    tk0 = pltpu.roll(text0, shift=k, axis=1) if k > 0 else text0

    bound = meta_ref[0, 0]
    start = meta_ref[0, 1]
    win = (
        jax.lax.broadcasted_iota(jnp.int32, (FOLD, wf), 0) * wf
        + jax.lax.broadcasted_iota(jnp.int32, (FOLD, wf), 1)
        + (i * w + start)
    )
    valid = win < bound  # (FOLD, wf)

    # int32 0/1 masks: Mosaic cannot legalize i1 vectors in loop carries
    ones = jnp.ones((FOLD, L), jnp.int32)

    piece_tab = {pi: pieces_of(m, k) for pi, m in enumerate(plens) if m > 0}

    def piece_at(pi, x):
        for idx, (o, li) in enumerate(piece_tab[pi]):
            if o < x <= o + li:
                return idx
        return None

    def fold_piece(cand, e, pi, piece_idx):
        m = plens[pi]
        o, li = piece_tab[pi][piece_idx]
        s_lo, s_hi = shift_range(o, li, m, k)
        delta = 0 if piece_idx == 0 else k  # e lane = pos + delta
        for s in range(s_lo, s_hi + 1):
            off = s + delta
            sl = e[:, off : off + wf]
            cand = sl if cand is None else (cand | sl)
        return cand

    # Segment boundaries: all static piece end positions.
    bounds = sorted({o + li for tab in piece_tab.values() for (o, li) in tab})

    cands = {pi: None for pi in piece_tab}
    e_cur = {pi: ones for pi in piece_tab}
    text, tk = text0, tk0
    lo = 1
    for b in bounds:
        live = [pi for pi, m in enumerate(plens) if m > 0 and m >= lo]
        carry_e = tuple(e_cur[pi] for pi in live)
        seg_piece = {pi: piece_at(pi, lo) for pi in live}

        def body(x, carry):
            text, tk, es = carry
            txL = text[:, :L]
            tkL = tk[:, :L]
            new_es = []
            for j, pi in enumerate(live):
                src = txL if seg_piece[pi] == 0 else tkL
                new_es.append(
                    jnp.where(src == pchar_ref[pi, x - 1], es[j], 0)
                )
            text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
            tk = pltpu.roll(tk, shift=tk.shape[1] - 1, axis=1)
            return text, tk, tuple(new_es)

        text, tk, carry_e = jax.lax.fori_loop(
            lo, b + 1, body, (text, tk, carry_e), unroll=False
        )
        for j, pi in enumerate(live):
            e_cur[pi] = carry_e[j]
            o, li = piece_tab[pi][seg_piece[pi]]
            if o + li == b:
                cands[pi] = fold_piece(cands[pi], e_cur[pi], pi, seg_piece[pi])
                e_cur[pi] = ones
        lo = b + 1

    for pi, m in enumerate(plens):
        if m == 0:
            continue
        cv = cands[pi] & valid.astype(jnp.int32)
        rows = jnp.sum(cv, axis=1, keepdims=True)  # (FOLD, 1)
        rowmap_ref[:, pi : pi + 1] = rows
        out_ref[pl.ds(pi * FOLD, FOLD), :] += rows


@functools.partial(
    jax.jit,
    static_argnames=("k", "m_max", "wf", "halo", "plens", "interpret"),
)
def scan_filter_pallas(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat: jax.Array,  # (P, m_max) uint8 — raw pattern table (no k padding)
    bound: jax.Array,  # () int32
    start: jax.Array,  # () int32
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    interpret: bool = False,
):
    """Phase-1 filtration scan.

    Returns ``(counts, rowmap)``: per-pattern candidate counts ``(P,)``
    int32 (for k = 0 these are exact match counts) and the per-staging-row
    candidate map ``(R, P)`` int32 for targeted verification (row ``r``
    covers windows ``[start + r*wf, start + (r+1)*wf)``).
    """
    p = pat.shape[0]
    r_rows, wpf = corpus_rows.shape
    assert wpf == wf + halo
    assert halo >= m_max + 2 * k, (halo, m_max, k)
    assert r_rows % FOLD == 0 and r_rows > 0
    assert len(plens) == p
    for m in plens:
        assert m == 0 or filter_eligible(m, k), (m, k)
    nblk = r_rows // FOLD

    pchar = pat.astype(jnp.int32)
    meta = jnp.stack(
        [bound.astype(jnp.int32).reshape(()), start.astype(jnp.int32).reshape(())]
    ).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern chars
            pl.BlockSpec((FOLD, wpf), lambda i: (i, 0)),  # corpus rows
        ],
        out_specs=(
            pl.BlockSpec((p * FOLD, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FOLD, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )

    counts, rowmap = pl.pallas_call(
        functools.partial(_filter_kernel, k=k, m_max=m_max, wf=wf, plens=plens),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((p * FOLD, 1), jnp.int32),
            jax.ShapeDtypeStruct((r_rows, p), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(meta, pchar, corpus_rows)
    return jnp.sum(counts.reshape(p, FOLD), axis=1), rowmap
