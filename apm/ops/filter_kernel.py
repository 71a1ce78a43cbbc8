"""Pallas pigeonhole-filtration kernel: piece-based candidate scan.

The filtration theorem (Navarro's taxonomy; used by nrgrep/agrep): split a
pattern of length ``m`` into ``j`` contiguous pieces — any equal-length
window within edit distance ``k`` induces a partition of the window into
``j`` aligned substrings whose edit distances sum to <= ``k``, so some
piece matches its aligned substring with at most ``floor(k / j)`` errors.
Two tiers instantiate this:

* **exact tier** (``j = k + 1`` pieces, ``kp = 0`` errors each): a cheap
  exact-match mismatch-count chain per piece (~2 VPU ops per DP step
  instead of the banded kernel's ~5 per band cell x ``2k+1`` cells);
* **banded tier** (``j = k//2 + 1`` pieces, ``kp = 1`` error each): a
  width-3 pinned-start banded DP per piece (~12 ops per step) — covers
  mid-length patterns at k >= 5 whose ``k+1``-way split would make pieces
  too short to be selective.

Both tiers are the same machinery: a piece at offset ``o``, length ``li``
carries ``2*kp + 1`` DP band lanes ``D[t + d][t]`` (pattern-local row,
text column, ``|d| <= kp``) pinned at start position = lane; its verdict
is ``min over end drift d`` of ``D[li][li + d] <= kp``, captured at steps
``o + li - kp .. o + li + kp``. ``kp = 0`` degenerates to the mismatch
counter and a single capture. Piece hits are OR-folded into the candidate
mask over the allowed occurrence shifts; because windows have length
exactly ``m`` (``sequential.c:131`` semantics), the FIRST piece's aligned
substring starts at the window start (shift 0 only) and the LAST piece's
ends at the window end (shift ``|s| <= kp``) — both endpoints are pinned,
which prunes most of the shift-OR and its false positives. Middle pieces
drift by up to ``min(o, k)`` left / ``min(k, m - o - li + kp)`` right.

Phase 2 (apm.ops.fused / apm.models.pipeline) verifies the rare candidate
rows with the banded DP kernel. For ``k = 0`` the single "piece" is the
whole pattern and the candidate mask IS the answer — no verification.

The reference has no analog of this; its kernels always run the full
O(m^2) DP per window (``src/utils.c:76-99``).

Kernel layout mirrors apm.ops.pallas_kernel: corpus staged as overlapping
``(R, wf + halo)`` uint8 rows, window ``j`` at row ``j // wf`` lane
``j % wf``, one ``(FOLD, wf + halo)`` block per grid step. Two int32 text
tiles roll one lane per step: ``text`` (piece 0 reads it at lane = window
position) and ``text_k`` = text pre-rotated by ``k`` (pieces >= 1 read it,
storing their hit mask at lane = position + k so the negative shifts of the
OR-combine become non-negative static slices; ``halo >= m + 2k`` keeps the
rotation's wrapped lanes out of every *used* lane — lanes below ``k - o``
are wrapped garbage but excluded by the shift clamp ``s >= -o``). Piece
boundaries are static (pattern lengths are trace-time constants), so the
step loop is segmented at the union of capture steps; single-step segments
inline without a loop.

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
INF = 1 << 20  # additive-safe infinity for out-of-band piece-DP cells
K_MAX = 16  # filtration eligibility cap (both tiers)

# Minimum piece length per tier: the phase-1 cost is ~independent of k
# (each pattern char is processed once), so what bounds eligibility is
# *selectivity* — a staging row (wf ~ 8k windows) must stay cold for
# targeted verification to pay. On 4-letter text an exact piece of length
# l fires per start with prob 4^-l; a kp=1 banded piece with prob
# ~8l / 4^l; each is further multiplied by the number of shift slices
# (O(j k) worst case). l >= 14 keeps kp=1 rows cold through k = 8;
# k in [9, 16] multiplies the slice count, so it needs l >= 16. The
# density fallback still protects pathological corpora either way.
EXACT_LMIN_HIGH = 14  # exact tier, k >= 5
BANDED_LMIN = {5: 14, 6: 14, 7: 14, 8: 14}  # else 16 for k in [9, 16]


def pieces_of_j(m: int, j: int):
    """Static piece table: [(offset, length)] — j contiguous pieces."""
    l = m // j
    return [(i * l, l if i < j - 1 else m - (j - 1) * l) for i in range(j)]


def pieces_of(m: int, k: int):
    """Exact-tier piece table (k + 1 pieces). Kept for the public API."""
    return pieces_of_j(m, k + 1)


def banded_j(k: int) -> int:
    """Piece count of the banded tier: the fewest pieces with k//j == 1
    (fewest = longest pieces = most selective; cost is j-independent)."""
    return k // 2 + 1


def tier_of(m: int, k: int):
    """Filtration plan for one pattern: ``(j, kp)`` or None (banded DP).

    Exact pieces are preferred (cheaper and more selective); the banded
    tier extends coverage to mid-length patterns at k in [5, 16].
    """
    if m < 1:
        return None
    if k == 0:
        return (1, 0)
    if k <= 4:
        return (k + 1, 0) if m // (k + 1) >= max(k, 8) else None
    if k <= K_MAX:
        if m // (k + 1) >= EXACT_LMIN_HIGH:
            return (k + 1, 0)
        j = banded_j(k)
        if m // j >= BANDED_LMIN.get(k, 16):
            return (j, 1)
    return None


def filter_eligible(m: int, k: int) -> bool:
    """True when some filtration tier applies to an (m, k) pattern."""
    return tier_of(m, k) is not None


def shift_range(o: int, li: int, m: int, k: int):
    """Geometric occurrence shifts for a *middle* piece at [o, o+li)."""
    return (-min(o, k), min(k, m - o - li))


def piece_shift_range(idx: int, j: int, o: int, li: int, m: int, k: int, kp: int):
    """Allowed occurrence shifts for piece ``idx`` of ``j`` (see module doc).

    The equal-length-window alignment pins the first piece's start at the
    window start and the last piece's end at the window end; middle pieces
    drift by the errors spent before/after them (<= k), clamped to fit.
    """
    if idx == 0:
        return (0, 0)
    if idx == j - 1:
        return (-min(o, kp), min(kp, m - o - li + kp))
    return (-min(o, k), min(k, m - o - li + kp))


def partition_plens(plens: tuple, k: int, engine: str):
    """Split a static length tuple into (fmask, filtration, banded-DP)."""
    use = engine in ("auto", "filter")
    fmask = tuple(use and m > 0 and filter_eligible(m, k) for m in plens)
    plens_filter = tuple(m if f else 0 for m, f in zip(plens, fmask))
    plens_dp = tuple(0 if f else m for m, f in zip(plens, fmask))
    return fmask, plens_filter, plens_dp


def _filter_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start]
    pchar_ref,  # SMEM (P, m_max + 3*pad) int32 — pattern chars, 256-padded
    corpus_ref,  # VMEM (FOLD, wf + halo) uint8
    out_ref,  # VMEM (P * FOLD, 1) int32 — accumulated candidate counts
    rowmap_ref,  # VMEM (FOLD, P) int32 — this block's per-row counts
    *,
    k: int,
    m_max: int,
    wf: int,
    plens: tuple,
    pad: int,  # front sentinel columns = max piece kp; back gets 2*pad
):
    i = pl.program_id(0)
    p = len(plens)
    w = FOLD * wf
    L = wf + 2 * k

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowmap_ref[:] = jnp.zeros_like(rowmap_ref)  # covers padding patterns

    # Static per-pattern piece plans.
    plan = {}
    for pi, m in enumerate(plens):
        if m > 0:
            j, kp = tier_of(m, k)
            plan[pi] = (pieces_of_j(m, j), j, kp)
    if not plan:
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

    def init_band(kp):
        # D[d][0] = d for d >= 0 (start-pinned boundary), INF below band.
        return tuple(
            jnp.full((FOLD, L), jnp.int32(di - kp) if di >= kp else INF, jnp.int32)
            for di in range(2 * kp + 1)
        )

    def dp_step(band, src, pi, x, kp, static_x):
        """Advance one piece's pinned-start band by one DP step.

        ``band[di]`` holds D[t + d][t] (d = di - kp) for the piece-local
        step t; the compared pattern char for cell d at global step x is
        pchar[x - 1 + d] (piece-independent). kp = 0 degenerates to the
        mismatch counter ``band[0] + (src != pc)`` — no min ops at all.
        int32 0/1 costs: Mosaic cannot legalize i1 vectors in loop carries.
        """
        new, prev = [], None
        for di in range(2 * kp + 1):
            d = di - kp
            idx = x - 1 + d + pad
            pc = (
                pchar_ref[pi, idx]
                if static_x is None
                else pchar_ref[pi, int(idx)]
            )
            c = (src != pc).astype(jnp.int32)
            val = band[di] + c  # substitution / mismatch accumulate
            if d < kp:
                val = jnp.minimum(val, band[di + 1] + 1)  # deletion
            if prev is not None:
                val = jnp.minimum(val, prev + 1)  # insertion
            new.append(val)
            prev = val
        return tuple(new)

    # Segment bounds: union of all capture steps o+li-kp .. o+li+kp.
    caps = {}  # step -> list of (pi, pidx, d_cap)
    for pi, (tab, j, kp) in plan.items():
        for pidx, (o, li) in enumerate(tab):
            for d in range(-kp, kp + 1):
                caps.setdefault(o + li - d, []).append((pi, pidx, d))
    bounds = sorted(caps)

    def live_at(lo, hi):
        """Pieces whose step interval [o+1, o+li+kp] covers [lo, hi].

        The bound set contains every piece's end (its d=0 capture), so a
        piece interval can never PARTIALLY overlap a segment — asserted,
        because a partial overlap would silently skip DP steps.
        """
        out = []
        for pi, (tab, j, kp) in plan.items():
            for pidx, (o, li) in enumerate(tab):
                if o + 1 <= lo and hi <= o + li + kp:
                    out.append((pi, pidx))
                else:
                    assert o + 1 > hi or o + li + kp < lo, (
                        (pi, pidx, o, li, kp, lo, hi)
                    )
        return out

    states = {}  # (pi, pidx) -> band tuple
    mincap = {}  # (pi, pidx) -> running min of captured end-drift cells
    cands = {pi: None for pi in plan}

    text, tk = text0, tk0
    lo = 1
    for b in bounds:
        # Start any piece whose first step falls in [lo, b] (piece spans
        # whole segments by construction of the bound set).
        for pi, (tab, j, kp) in plan.items():
            for pidx, (o, li) in enumerate(tab):
                if lo <= o + 1 <= b and (pi, pidx) not in states:
                    states[(pi, pidx)] = init_band(kp)

        live = live_at(lo, b)
        kps = {key: plan[key[0]][2] for key in live}

        if b == lo:
            # Single-step segment: inline, static step index.
            txL = text[:, :L]
            tkL = tk[:, :L]
            for key in live:
                pi, pidx = key
                src = txL if pidx == 0 else tkL
                states[key] = dp_step(states[key], src, pi, lo, kps[key], lo)
            text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
            tk = pltpu.roll(tk, shift=tk.shape[1] - 1, axis=1)
        else:
            carry_states = tuple(states[key] for key in live)

            def body(x, carry, live=live, kps=kps):
                text, tk, st = carry
                txL = text[:, :L]
                tkL = tk[:, :L]
                new_st = tuple(
                    dp_step(
                        st[ji],
                        txL if key[1] == 0 else tkL,
                        key[0],
                        x,
                        kps[key],
                        None,
                    )
                    for ji, key in enumerate(live)
                )
                text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
                tk = pltpu.roll(tk, shift=tk.shape[1] - 1, axis=1)
                return text, tk, new_st

            text, tk, carry_states = jax.lax.fori_loop(
                lo, b + 1, body, (text, tk, carry_states), unroll=False
            )
            for ji, key in enumerate(live):
                states[key] = carry_states[ji]

        # Captures scheduled at step b (trace-time bindings — free).
        for pi, pidx, d in caps[b]:
            tab, j, kp = plan[pi]
            key = (pi, pidx)
            cell = states[key][d + kp]  # D[li][li - d] at step b = o+li-d
            prev = mincap.get(key)
            mincap[key] = cell if prev is None else jnp.minimum(prev, cell)
            o, li = tab[pidx]
            if b == o + li + kp:  # final capture: fold the piece verdict
                hit = (mincap.pop(key) <= kp).astype(jnp.int32)
                del states[key]
                m = plens[pi]
                s_lo, s_hi = piece_shift_range(pidx, j, o, li, m, k, kp)
                delta = 0 if pidx == 0 else k
                acc = cands[pi]
                for s in range(s_lo, s_hi + 1):
                    off = s + delta
                    sl = hit[:, off : off + wf]
                    acc = sl if acc is None else (acc | sl)
                cands[pi] = acc
        lo = b + 1

    for pi in plan:
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
    pad = 0
    for m in plens:
        assert m == 0 or filter_eligible(m, k), (m, k)
        if m > 0:
            pad = max(pad, tier_of(m, k)[1])
    nblk = r_rows // FOLD

    if pad:
        # Sentinel-padded char table: out-of-piece compares hit 256, which
        # no widened text byte equals (those cells are dominated anyway).
        # Front needs ``pad`` columns (idx = x-1+d+pad >= o-kp+pad >= 0);
        # the back needs ``2*pad``: the final capture step of the LAST
        # piece reads idx up to m-1+2kp+pad, one past a pad-wide back
        # sentinel when m = m_max (the read lane is dominated, but it must
        # still be in bounds).
        pchar = jnp.full((p, m_max + 3 * pad), 256, jnp.int32)
        pchar = jax.lax.dynamic_update_slice(
            pchar, pat.astype(jnp.int32), (0, pad)
        )
    else:
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
        functools.partial(
            _filter_kernel, k=k, m_max=m_max, wf=wf, plens=plens, pad=pad
        ),
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
