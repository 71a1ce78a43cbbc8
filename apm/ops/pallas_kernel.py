"""Pallas TPU kernel: banded Levenshtein sliding-window scan with fused counting.

This is the hot path of the framework — the TPU-native re-design of the
reference's two compute kernels (CPU single-column square DP,
``src/utils.c:76-99``, and the CUDA grid-stride window kernel,
``src/patterns_over_ranks.cu:19-73``). Instead of one DP matrix per window per
thread, the whole ``(P patterns, W windows)`` batch advances its DP wavefront
in lockstep as VPU vector ops on VMEM tiles.

Layout (the part that makes it fast — everything is strictly 2D vectors,
which is what Mosaic lays out best):

* a block of ``W`` windows is **folded onto sublanes**: window ``j`` lives at
  row ``s = j // wf``, lane ``j % wf``; all DP state is shaped
  ``(P * FOLD, wf)`` with row ``r = p * FOLD + s`` — every vreg fully dense;
* the corpus is staged host-side into overlapping rows ``row r = bytes
  [r*wf, r*wf + wf + halo)`` (uint8 in HBM); the Pallas pipeline fetches one
  ``(FOLD, wf + halo)`` block per grid step (automatic double buffering);
  the kernel widens it to int32 and replicates it across the ``P`` pattern
  groups once per block, then rolls it one lane per DP step;
* DP cells are **unclamped** int32 with an additive-safe INF for
  out-of-band/boundary cells (values grow at most +1 per step, so no
  overflow and no per-op clamp — the true banded value is exact inside the
  band, which is all the ``dist <= k`` verdict needs);
* the first ``k`` DP steps (the only ones that can touch the ``D[x][0] = x``
  boundary column) are unrolled in Python with the boundary resolved at
  trace time, so the steady-state loop carries no boundary selects;
* EOF-truncated windows (``size = min(m, n - j) < m``, ``sequential.c:131``)
  are **not** handled here: the scanner owns windows ``j <= n - m_max`` on
  device and counts the <= ``m_max - 1`` tail windows with the NumPy oracle,
  so the in-kernel capture is one ``plen == x`` select per step;
* per-pattern hit counts are reduced in-kernel and accumulated into a
  ``(P * FOLD, 1)`` VMEM tile across grid steps — no per-window output ever
  touches HBM.

Semantics: per-pattern count of window starts ``j`` in ``[start, bound)``
with banded Levenshtein distance (band ``|d| <= k``) <= k, identical to
``sequential.c:104-144`` for untruncated windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FOLD = 8  # window-axis fold onto sublanes (8 rows = int32 sublane tile)
INF = 1 << 20  # additive-safe infinity for out-of-band cells

# --- bit-parallel (Myers/Hyyro) banded DP mode -----------------------------
# The classic band pays ~5 VPU ops per diagonal per step (2k+1 diagonals);
# the bit-parallel mode packs the whole band into one int32 bit vector per
# window lane and pays a ~constant ~(2C + 25) ops per step (C = pattern-set
# alphabet size), so it wins once the band is wide enough. Auto crossover
# at k >= MYERS_KMIN_AUTO; k <= 14 keeps band width 2k+1 <= 29 bits clear of
# the int32 sign bit (the D0 carry chain may touch bit 2k+1).
MYERS_KMIN_AUTO = 3
MYERS_KMAX = 14
MYERS_CMAX = 8  # alphabet channels; PM costs 2 ops per channel per pattern
MYERS_SMEM_MAX = 64 * 1024  # PEQ table budget (bytes) in scalar memory


def _myers_mode(
    k: int, alphabet: tuple, dp_dtype: str, dp_impl: str, p: int, m_max: int
) -> bool:
    """Static dispatch: run the bit-parallel band instead of the classic
    diagonal band?  ``dp_impl``: "auto" (measured crossover), "band"
    (never), "myers" (whenever representable)."""
    if dp_impl == "band" or not alphabet or dp_dtype != "int32":
        return False
    if not (1 <= k <= MYERS_KMAX) or len(alphabet) > MYERS_CMAX:
        return False
    if k >= m_max:  # static phase reads PEQ row k; band path handles this
        return False
    if p * m_max * len(alphabet) * 4 > MYERS_SMEM_MAX:
        return False
    return True if dp_impl == "myers" else k >= MYERS_KMIN_AUTO


def resolve_dp_mode(
    k: int, alphabet: tuple, dp_dtype: str, dp_impl: str, p: int, m_max: int
) -> tuple:
    """Collapse the jit cache key when the bit-parallel mode is off.

    ``alphabet`` is a static jit arg on every scan entry point, but the
    classic band never reads it — without this normalization, pattern
    sets with identical length multisets but different bytes would each
    pay a fresh TPU compile (10 s–8 min on remote-compile testbeds) for
    a byte-identical kernel. Resolving :func:`_myers_mode` OUTSIDE the
    jit and passing ``((), "band")`` whenever the mode is off restores
    the plens-only cache key; when the mode is on, ``(alphabet,
    "myers")`` collapses ``dp_impl="auto"`` and ``"myers"`` onto one
    entry as well.
    """
    if _myers_mode(k, alphabet, dp_dtype, dp_impl, p, m_max):
        return tuple(alphabet), "myers"
    return (), "band"


def _build_peq(pat: jax.Array, k: int, m_max: int, alphabet: tuple):
    """Match-bit table for the bit-parallel band: ``peq[pi*m_max + X, c]``
    bit ``b`` set iff ``pat[pi, X + b] == alphabet[c]`` (``pat`` is the
    k-padded table, so X indexes DP steps: the moving band at step x reads
    row ``x - 1``; the static boundary phase reads row ``k``).  (P*m_max, C)
    int32, placed in SMEM and read as per-pattern scalars."""
    B = 2 * k + 1
    p = pat.shape[0]
    p32 = pat.astype(jnp.int32)  # (P, m_max + 2k)
    wins = jnp.stack(
        [p32[:, X : X + B] for X in range(m_max)], axis=1
    )  # (P, m_max, B)
    alph = jnp.asarray(alphabet, jnp.int32)
    eq = wins[..., None] == alph  # (P, m_max, B, C)
    bits = eq.astype(jnp.int32) << jnp.arange(B, dtype=jnp.int32).reshape(
        1, 1, B, 1
    )
    return jnp.sum(bits, axis=2).reshape(p * m_max, len(alphabet))


def _myers_phases(
    peq_ref, text0, *, k, m_max, wf, plens, fold, alphabet
):
    """Bit-parallel banded-DP phases (the Myers-mode replacement for the
    classic diagonal band in :func:`_scan_kernel_unrolled`).

    Per (pattern, window-lane): the band's 2k+1 cells live as vertical
    delta bit vectors ``VP``/``VN`` (bit b = R[b] - R[b-1] in band
    coordinates) plus the center (main-diagonal) value ``ccen``; each DP
    step is Hyyro's block update (~15 bit ops) instead of 2k+1 per-diagonal
    min-chains.  Three phases:

    1. *static* (x = 1..min(k, m)): the band covers pattern rows 1..2k+1
       with the exact ``D[0][x] = x`` boundary encoded by a constant
       horizontal carry-in of +1 (standard Myers distance boundary) — the
       initial column D[y][0] = y is the constant all-ones VP;
    2. *conversion* at x = k: the static band re-indexes onto the moving
       (diagonal) band with one shift — the two bit conventions coincide;
    3. *moving* (x = k+1..m): the band shifts down one row per step
       (``VP >> 1``) with a fake top delta of +1; out-of-band cells act as
       ``>= k+1`` surrogates, which preserves the ``<= k`` verdict exactly
       (computed == true whenever true <= k; fuzz-verified against the
       square-DP oracle over 50k random (pattern, window, k) triples).

    ``ccen`` advances by ``1 - bit_center(D0)`` where ``D0 = Xh | VN`` is
    the diagonal-equality vector; captures at x = plens[pi] are trace-time
    (static lengths), as in the classic path.
    """
    B = 2 * k + 1
    maskB = (1 << B) - 1
    topbit = 1 << (B - 1)
    active = sorted({m for m in plens if m > 0})
    m_top = active[-1]
    fullc = lambda v: jnp.full((fold, wf), v, jnp.int32)

    state = {
        pi: (fullc(maskB), fullc(0), fullc(0))
        for pi, m in enumerate(plens)
        if m > 0
    }
    res = {}

    def pm(masks, pi, row):
        # PM = OR_c (text == alphabet[c]) ? PEQ[pi, row, c] : 0
        acc = None
        for ci in range(len(alphabet)):
            wv = peq_ref[pi * m_max + row, ci]
            term = jnp.where(masks[ci], wv, 0)
            acc = term if acc is None else acc | term
        return acc

    def bit_step(st, Eq, cbit):
        VP, VN, cc = st
        Xv = Eq | VN
        Xh = (((Eq & VP) + VP) ^ VP) | Eq
        Ph = VN | (~(Xh | VP) & maskB)
        Mh = VP & Xh
        Ph = ((Ph << 1) & maskB) | 1  # horizontal carry-in = +1
        Mh = (Mh << 1) & maskB
        nVP = Mh | (~(Xv | Ph) & maskB)
        nVN = Ph & Xv
        cc = cc + (1 - (((Xh | VN) >> cbit) & 1))
        return (nVP, nVN, cc)

    def alpha_masks(text):
        txd = text[:, :wf]
        return [txd == a for a in alphabet]

    # Phase 1: static band, x = 1..min(k, m_top); center row x <-> bit x-1.
    text = text0
    x_top = min(k, m_top)
    for x in range(1, x_top + 1):
        masks = alpha_masks(text)
        for pi, m in enumerate(plens):
            if m > 0 and x <= m:
                state[pi] = bit_step(state[pi], pm(masks, pi, k), x - 1)
                if x == m:
                    res[pi] = state[pi][2]
        text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)

    # Phase 2 entry: re-index survivors onto the moving band (bit b-1 -> b;
    # bit 0 is the below-band fake, discarded by the first diagonal shift).
    for pi, m in enumerate(plens):
        if m > x_top:
            VP, VN, cc = state[pi]
            state[pi] = (((VP << 1) | 1) & maskB, (VN << 1) & maskB, cc)

    # Phase 3: moving band, segmented at distinct pattern lengths.
    seg_bounds = [m for m in active if m > x_top]
    lo = x_top + 1
    for seg_end in seg_bounds:
        live = [pi for pi, m in enumerate(plens) if m >= lo and m > 0]
        carry = tuple(state[pi] for pi in live)

        def body(x, c, live=live):
            text, st = c
            masks = alpha_masks(text)
            out = []
            for j, pi in enumerate(live):
                VP, VN, cc = st[j]
                shifted = ((VP >> 1) | topbit, VN >> 1, cc)
                out.append(bit_step(shifted, pm(masks, pi, x - 1), k))
            text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
            return text, tuple(out)

        text, carry = jax.lax.fori_loop(
            lo, seg_end + 1, body, (text, carry), unroll=DP_UNROLL
        )
        for j, pi in enumerate(live):
            state[pi] = carry[j]
            if plens[pi] == seg_end:
                res[pi] = carry[j][2]
        lo = seg_end + 1
    return res


def _scan_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start]
    corpus_ref,  # VMEM (FOLD, wf + halo) uint8 — this block's text rows
    pband_ref,  # VMEM (m_max, P*FOLD, 2k+1) int32 — expanded pattern chars
    plen_ref,  # VMEM (P*FOLD, 1) int32 — expanded pattern lengths
    out_ref,  # VMEM (P*FOLD, 1) int32 — per-row match counts (accumulated)
    *,
    k: int,
    m_max: int,
    wf: int,  # windows per fold row (lane width); W = FOLD * wf
    p: int,  # number of pattern rows (before FOLD expansion)
):
    i = pl.program_id(0)
    rows = p * FOLD
    bw = 2 * k + 1
    w = FOLD * wf

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Widen to int32 and replicate across the P pattern groups (row-major
    # r = p*FOLD + s, matching the host-side pband/plen expansion).
    text1 = corpus_ref[:].astype(jnp.int32)  # (FOLD, wpf)
    text0 = jnp.concatenate([text1] * p, axis=0)  # (P*FOLD, wpf)

    bound = meta_ref[0, 0]
    start = meta_ref[0, 1]
    # win[r, j'] = global index of window (s = r % FOLD, lane j')
    sub_id = jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 0) % FOLD
    win = (
        sub_id * wf
        + jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 1)
        + (i * w + start)
    )
    valid = win < bound  # (P*FOLD, wf)
    plen2 = plen_ref[:]  # (P*FOLD, 1)

    # band[k+d] = D[x][x+d]; row x=0: D[0][y] = y for y in [0, k], INF outside.
    band0 = tuple(
        jnp.full((rows, wf), jnp.int32(d) if d >= 0 else INF, jnp.int32)
        for d in range(-k, k + 1)
    )
    res0 = jnp.full((rows, wf), INF, dtype=jnp.int32)

    def step(x, text, band, res, static_x: bool):
        """One DP step; ``static_x`` prunes boundary work at trace time."""
        tx = text[:, :wf]  # (P*FOLD, wf) — text byte at DP step x
        px = pband_ref[x - 1]  # (P*FOLD, bw)
        new = []
        prev = None
        for di in range(bw):
            d = di - k
            if static_x and x + d == 0:
                # boundary column D[x][0] = x — exact, no data dependence
                val = jnp.full((rows, wf), jnp.int32(x), jnp.int32)
            elif static_x and x + d < 0:
                val = jnp.full((rows, wf), INF, jnp.int32)
            else:
                c = (px[:, di : di + 1] != tx).astype(jnp.int32)
                val = band[di] + c  # substitution
                if d < k:
                    val = jnp.minimum(val, band[di + 1] + 1)  # deletion
                if prev is not None:
                    val = jnp.minimum(val, prev + 1)  # insertion
            new.append(val)
            prev = val
        res = jnp.where(plen2 == x, new[k], res)  # capture D[m][m]
        text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
        return text, tuple(new), res

    text, band, res = text0, band0, res0
    for x in range(1, min(k, m_max) + 1):  # boundary steps, unrolled
        text, band, res = step(x, text, band, res, static_x=True)

    if m_max > k:

        def body(x, carry):
            text, band, res = carry
            return step(x, text, band, res, static_x=False)

        text, band, res = jax.lax.fori_loop(
            k + 1, m_max + 1, body, (text, band, res), unroll=DP_UNROLL
        )

    hits = jnp.logical_and(res <= k, valid)
    out_ref[:] += jnp.sum(hits.astype(jnp.int32), axis=1, keepdims=True)


def _band_phases(
    pchar_ref, text0, *, k, m_max, wf, plens, fold, dtype
):
    """Classic diagonal-band DP phases (pattern-unrolled, length-segmented).

    The pattern loop is a Python loop (pattern chars are SMEM scalars
    broadcast into the compares — no replicated text, no VMEM pattern
    table, padding rows cost nothing). The DP-step loop is segmented at the
    distinct pattern lengths: within a segment a single ``fori_loop``
    advances every still-active pattern's band; at each segment boundary the
    finished patterns' ``D[m][m]`` is captured as a trace-time binding (zero
    select ops) and those patterns drop out of the carry. The first
    ``min(k, m_max)`` steps are Python-unrolled so the ``D[x][0] = x``
    boundary column resolves statically. Only the small ``(fold, wf+halo)``
    text tile rolls one lane per step — it stays int32 (Mosaic's lane
    rotation is 32-bit only) and is narrowed to ``dtype`` once per step,
    shared by every pattern's compare.

    Narrow DP dtypes double/quadruple VPU element throughput: ``fold`` must
    match the dtype's sublane tile (8/16/32) so every vreg stays dense.
    int8 cells re-enable clamping at ``cap = k + 1`` (which preserves the
    ``<= k`` verdict exactly — min-plus clamping commutes) to stay in
    range; wider dtypes use an additive-safe INF and need no per-op clamp.

    Returns the per-pattern ``D[m][m]`` capture dict.
    """
    clamp = dtype == jnp.int8
    cap = k + 1
    if dtype == jnp.int32:
        inf_val = INF
    elif dtype == jnp.int16:
        inf_val = 16000  # + m_max growth stays far below int16 max
    else:
        inf_val = cap  # clamped domain: cap already means "> k"
    active = sorted({m for m in plens if m > 0})
    m_top = active[-1]

    full = lambda v: jnp.full((fold, wf), v, dtype)
    one = jnp.asarray(1, dtype)

    def dp_step(band, txd, pi, x, static_x):
        """Advance pattern pi's band by one DP step (x traced or static)."""
        new = []
        prev = None
        for di in range(2 * k + 1):
            d = di - k
            if static_x is not None and static_x + d == 0:
                val = full(static_x)  # boundary column D[x][0] = x
            elif static_x is not None and static_x + d < 0:
                val = None
            else:
                pc = pchar_ref[pi, x - 1 + d + k].astype(dtype)
                c = (txd != pc).astype(dtype)
                val = None
                if band[di] is not None:
                    val = band[di] + c  # substitution
                if d < k and band[di + 1] is not None:
                    dele = band[di + 1] + one
                    val = dele if val is None else jnp.minimum(val, dele)
                if prev is not None:
                    ins = prev + one
                    val = ins if val is None else jnp.minimum(val, ins)
                if clamp and val is not None:
                    val = jnp.minimum(val, jnp.asarray(cap, dtype))
            new.append(val)
            prev = val
        return new

    def narrow(text):
        tx = text[:, :wf]
        return tx if dtype == jnp.int32 else tx.astype(dtype)

    # Per-pattern band state, indexed by pattern slot. Row x=0: D[0][y] = y.
    bands = {
        pi: [
            full(di - k) if 0 <= di - k <= m else None
            for di in range(2 * k + 1)
        ]
        for pi, m in enumerate(plens)
        if m > 0
    }
    res = {}
    text = text0

    # Phase 1: boundary steps, Python-unrolled (x <= k).
    x_static_top = min(k, m_top)
    for x in range(1, x_static_top + 1):
        txd = narrow(text)
        for pi, m in enumerate(plens):
            if m > 0 and x <= m:
                bands[pi] = dp_step(bands[pi], txd, pi, x, x)
                if x == m:
                    res[pi] = bands[pi][k]
        text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)

    # Phase 2: steady state, segmented at distinct pattern lengths.
    seg_bounds = [m for m in active if m > x_static_top]
    lo = x_static_top + 1
    for seg_end in seg_bounds:
        live = [
            pi for pi, m in enumerate(plens) if m >= lo and m > 0
        ]
        # Materialize any remaining None cells (unreachable garbage lanes
        # feed only higher garbage lanes — see module docstring).
        carry_bands = tuple(
            tuple(b if b is not None else full(inf_val) for b in bands[pi])
            for pi in live
        )

        def body(x, carry):
            text, cb = carry
            txd = narrow(text)
            new_cb = tuple(
                tuple(dp_step(list(cb[j]), txd, pi, x, None))
                for j, pi in enumerate(live)
            )
            text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
            return text, new_cb

        text, carry_bands = jax.lax.fori_loop(
            lo, seg_end + 1, body, (text, carry_bands), unroll=DP_UNROLL
        )
        for j, pi in enumerate(live):
            bands[pi] = list(carry_bands[j])
            if plens[pi] == seg_end:
                res[pi] = bands[pi][k]  # capture D[m][m] — free
        lo = seg_end + 1
    return res


def _scan_kernel_unrolled(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start];
    # batch mode: (nblk, 2), PER-BLOCK [bound, start]
    ptab_ref,  # SMEM pattern table: band mode (P, m_max + 2k) int32 chars;
    # Myers mode (P * m_max, C) int32 PEQ match-bit words
    corpus_ref,  # VMEM (fold, wf + halo) uint8 — this block's text rows
    out_ref,  # VMEM (P * fold, 1) int32 — per-row match counts (batch
    # mode: this BLOCK's counts — each block owns its own output slot)
    mask_ref=None,  # VMEM (P * fold, wf) int32 — per-WINDOW verdicts for
    # this block (present only in mask mode; each block owns its own slot)
    *,
    k: int,
    m_max: int,
    wf: int,
    plens: tuple,  # static per-pattern lengths (0 = padding row, skipped)
    fold: int,  # window-axis fold onto sublanes (8/16/32 for i32/i16/i8)
    dtype,  # DP cell dtype: jnp.int32 / jnp.int16 / jnp.int8
    batch: bool = False,  # per-block meta + per-block outputs
    alphabet: tuple = (),  # non-empty => bit-parallel (Myers) band phases
):
    """Shared kernel plumbing (window ownership, count/mask accumulation)
    around either :func:`_band_phases` (classic diagonal band) or
    :func:`_myers_phases` (bit-parallel band, dispatched when ``alphabet``
    is set — see :func:`_myers_mode`). Both return the same per-pattern
    ``D[m][m]`` captures; the ``<= k`` verdict, ownership masking, and
    output layout are identical."""
    i = pl.program_id(0)
    w = fold * wf
    active = sorted({m for m in plens if m > 0})
    if mask_ref is not None:
        mask_ref[:] = jnp.zeros_like(mask_ref)  # covers padding patterns
    if not active:
        out_ref[:] = jnp.zeros_like(out_ref)
        return

    if batch:
        # Each block owns its own output slot; zero it unconditionally.
        out_ref[:] = jnp.zeros_like(out_ref)
        bound = meta_ref[i, 0]
        start = meta_ref[i, 1]  # absolute virtual index of this block
        base = start
    else:

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        bound = meta_ref[0, 0]
        start = meta_ref[0, 1]
        base = i * w + start

    text0 = corpus_ref[:].astype(jnp.int32)  # (fold, wpf)

    win = (
        jax.lax.broadcasted_iota(jnp.int32, (fold, wf), 0) * wf
        + jax.lax.broadcasted_iota(jnp.int32, (fold, wf), 1)
        + base
    )
    valid = win < bound  # (fold, wf)

    if alphabet:
        res = _myers_phases(
            ptab_ref, text0,
            k=k, m_max=m_max, wf=wf, plens=plens, fold=fold,
            alphabet=alphabet,
        )
    else:
        res = _band_phases(
            ptab_ref, text0,
            k=k, m_max=m_max, wf=wf, plens=plens, fold=fold, dtype=dtype,
        )

    for pi, m in enumerate(plens):
        if m == 0:
            continue
        hits = jnp.logical_and(res[pi] <= k, valid)
        out_ref[pl.ds(pi * fold, fold), :] += jnp.sum(
            hits.astype(jnp.int32), axis=1, keepdims=True
        )
        if mask_ref is not None:
            mask_ref[pl.ds(pi * fold, fold), :] = hits.astype(jnp.int32)


# DP step-loop partial unroll (fori_loop unroll factor). The
# instruction-mix accounting (DESIGN §1c) shows the banded/Myers kernels
# are floored by PER-STEP fixed cost (text rotate + loop/SMEM
# bookkeeping) at small band widths, not by ops/cell — partial unroll
# amortizes exactly that term. Overridable for probes via APM_DP_UNROLL;
# full unrolling stays rejected (compile time explodes past 9 min).
import os as _os

DP_UNROLL = max(1, int(_os.environ.get("APM_DP_UNROLL", "1")))

_DTYPE_FOLD = {"int32": 8, "int16": 16, "int8": 32}


def _ptab_for(pat, *, k, m_max, dp_dtype, dp_impl, alphabet):
    """Resolve the kernel's SMEM pattern table for the selected DP mode:
    ``(PEQ match-bit words, alphabet)`` in Myers mode, ``(pattern chars,
    ())`` in classic band mode."""
    if _myers_mode(k, alphabet, dp_dtype, dp_impl, pat.shape[0], m_max):
        return _build_peq(pat, k, m_max, alphabet), tuple(alphabet)
    return pat.astype(jnp.int32), ()


def scan_folded_pallas_unrolled(
    corpus_rows, pat, bound, start, *,
    k, m_max, wf, halo, plens, dp_dtype="int32", interpret=False,
    alphabet=(), dp_impl="auto",
):
    """Length-segmented scan. Same contract as :func:`scan_folded_pallas`
    but pattern lengths are static (one compile per length multiset) and
    the DP cell dtype is selectable (narrower = denser vregs = faster;
    ``fold`` = rows per block follows the dtype's sublane tile).

    Thin non-jit shim: resolves the DP mode (:func:`resolve_dp_mode`) so
    the jit cache key stays plens-only whenever Myers mode is off."""
    alphabet, dp_impl = resolve_dp_mode(
        k, alphabet, dp_dtype, dp_impl, pat.shape[0], m_max
    )
    return _scan_folded_pallas_unrolled(
        corpus_rows, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, dp_dtype=dp_dtype,
        interpret=interpret, alphabet=alphabet, dp_impl=dp_impl,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "dp_dtype", "interpret",
        "alphabet", "dp_impl",
    ),
)
def _scan_folded_pallas_unrolled(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window-index bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0, byte 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,  # static per-pattern lengths
    dp_dtype: str = "int32",  # DP cell dtype: int32 / int16 / int8
    interpret: bool = False,
    alphabet: tuple = (),  # static distinct pattern bytes (Myers mode key)
    dp_impl: str = "auto",  # "auto" / "band" / "myers" (see _myers_mode)
) -> jax.Array:
    p = pat.shape[0]
    fold = _DTYPE_FOLD[dp_dtype]
    dtype = jnp.dtype(dp_dtype).type
    r_rows, wpf = corpus_rows.shape
    assert wpf == wf + halo, (wpf, wf, halo)
    assert halo >= m_max - 1, (halo, m_max)
    assert r_rows % fold == 0 and r_rows > 0, (r_rows, fold)
    assert len(plens) == p
    nblk = r_rows // fold
    bw = 2 * k + 1

    pchar, kern_alphabet = _ptab_for(
        pat, k=k, m_max=m_max, dp_dtype=dp_dtype, dp_impl=dp_impl,
        alphabet=alphabet,
    )
    meta = jnp.stack(
        [bound.astype(jnp.int32).reshape(()), start.astype(jnp.int32).reshape(())]
    ).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern chars
            pl.BlockSpec((fold, wpf), lambda i: (i, 0)),  # corpus rows
        ],
        out_specs=pl.BlockSpec(
            (p * fold, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    counts = pl.pallas_call(
        functools.partial(
            _scan_kernel_unrolled,
            k=k,
            m_max=m_max,
            wf=wf,
            plens=plens,
            fold=fold,
            dtype=dtype,
            alphabet=kern_alphabet,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p * fold, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=nblk * m_max * bw * p * fold * wf * 5,
            bytes_accessed=r_rows * wpf + nblk * p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, pchar, corpus_rows)
    return jnp.sum(counts.reshape(p, fold), axis=1)


def scan_folded_pallas_batch(
    corpus_rows, pat, meta, *,
    k, m_max, wf, halo, plens, dp_dtype="int32", interpret=False,
    alphabet=(), dp_impl="auto",
):
    """Non-jit shim for :func:`_scan_folded_pallas_batch` — resolves the
    DP mode outside the jit (see :func:`resolve_dp_mode`)."""
    alphabet, dp_impl = resolve_dp_mode(
        k, alphabet, dp_dtype, dp_impl, pat.shape[0], m_max
    )
    return _scan_folded_pallas_batch(
        corpus_rows, pat, meta,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, dp_dtype=dp_dtype,
        interpret=interpret, alphabet=alphabet, dp_impl=dp_impl,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "dp_dtype", "interpret",
        "alphabet", "dp_impl",
    ),
)
def _scan_folded_pallas_batch(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded rows, many corpora
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    meta: jax.Array,  # (R // fold, 2) int32 — PER-BLOCK [bound, start]
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    dp_dtype: str = "int32",
    interpret: bool = False,
    alphabet: tuple = (),  # static distinct pattern bytes (Myers mode key)
    dp_impl: str = "auto",
) -> jax.Array:
    """Batched scan: many independent corpora in ONE kernel call.

    Serving workloads scan many small corpora; per-call dispatch latency
    (~30-40 ms over a tunneled link) floors their throughput. Here each
    corpus occupies a contiguous run of blocks in a shared *virtual window
    space*: block ``b`` scans windows ``[meta[b,1], meta[b,1] + w)`` and
    masks them against the owning corpus's bound ``meta[b,0]`` — so one
    grid sweep serves the whole batch, and the per-BLOCK count output
    ``(nblk, P)`` lets the host split totals back per corpus. Padding
    blocks carry ``bound = 0`` (every window invalid, zero counts).
    """
    p = pat.shape[0]
    fold = _DTYPE_FOLD[dp_dtype]
    dtype = jnp.dtype(dp_dtype).type
    r_rows, wpf = corpus_rows.shape
    assert wpf == wf + halo, (wpf, wf, halo)
    assert halo >= m_max - 1, (halo, m_max)
    assert r_rows % fold == 0 and r_rows > 0, (r_rows, fold)
    assert len(plens) == p
    nblk = r_rows // fold
    assert meta.shape == (nblk, 2), (meta.shape, nblk)
    bw = 2 * k + 1

    pchar, kern_alphabet = _ptab_for(
        pat, k=k, m_max=m_max, dp_dtype=dp_dtype, dp_impl=dp_impl,
        alphabet=alphabet,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-block meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern chars
            pl.BlockSpec((fold, wpf), lambda i: (i, 0)),  # corpus rows
        ],
        out_specs=pl.BlockSpec(
            (p * fold, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )

    counts = pl.pallas_call(
        functools.partial(
            _scan_kernel_unrolled,
            k=k,
            m_max=m_max,
            wf=wf,
            plens=plens,
            fold=fold,
            dtype=dtype,
            batch=True,
            alphabet=kern_alphabet,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblk * p * fold, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=nblk * m_max * bw * p * fold * wf * 5,
            bytes_accessed=r_rows * wpf + nblk * p * fold * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta.astype(jnp.int32), pchar, corpus_rows)
    # (nblk, P): per-block per-pattern counts
    return jnp.sum(counts.reshape(nblk, p, fold), axis=2)


def scan_folded_pallas_mask(
    corpus_rows, pat, bound, start, *,
    k, m_max, wf, halo, plens, dp_dtype="int32", interpret=False,
    alphabet=(), dp_impl="auto",
):
    """Non-jit shim for :func:`_scan_folded_pallas_mask` — resolves the
    DP mode outside the jit (see :func:`resolve_dp_mode`)."""
    alphabet, dp_impl = resolve_dp_mode(
        k, alphabet, dp_dtype, dp_impl, pat.shape[0], m_max
    )
    return _scan_folded_pallas_mask(
        corpus_rows, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, dp_dtype=dp_dtype,
        interpret=interpret, alphabet=alphabet, dp_impl=dp_impl,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "dp_dtype", "interpret",
        "alphabet", "dp_impl",
    ),
)
def _scan_folded_pallas_mask(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — window-index bound (exclusive)
    start: jax.Array,  # () int32 — window index of row 0, byte 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    dp_dtype: str = "int32",
    interpret: bool = False,
    alphabet: tuple = (),  # static distinct pattern bytes (Myers mode key)
    dp_impl: str = "auto",
):
    """:func:`scan_folded_pallas_unrolled` that also returns the per-WINDOW
    verdict mask — ``(counts (P,), mask (R, P, wf) int8)`` with
    ``mask[r, pi, j'] = 1`` iff window ``start + r*wf + j'`` matches pattern
    ``pi`` (and is ``< bound``). Powers :meth:`Scanner.find`'s device-side
    position extraction: the mask is written per block straight from the DP
    verdicts the counting kernel already computes, so positions cost one
    extra VMEM store per pattern per block plus a small int8 fetch — no
    host-side DP at all. Meant for modest row counts (gathered hot rows);
    the mask is R*P*wf bytes.
    """
    p = pat.shape[0]
    fold = _DTYPE_FOLD[dp_dtype]
    dtype = jnp.dtype(dp_dtype).type
    r_rows, wpf = corpus_rows.shape
    assert wpf == wf + halo, (wpf, wf, halo)
    assert halo >= m_max - 1, (halo, m_max)
    assert r_rows % fold == 0 and r_rows > 0, (r_rows, fold)
    assert len(plens) == p
    nblk = r_rows // fold
    bw = 2 * k + 1

    pchar, kern_alphabet = _ptab_for(
        pat, k=k, m_max=m_max, dp_dtype=dp_dtype, dp_impl=dp_impl,
        alphabet=alphabet,
    )
    meta = jnp.stack(
        [bound.astype(jnp.int32).reshape(()), start.astype(jnp.int32).reshape(())]
    ).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pattern chars
            pl.BlockSpec((fold, wpf), lambda i: (i, 0)),  # corpus rows
        ],
        out_specs=(
            pl.BlockSpec(
                (p * fold, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (p * fold, wf), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
    )

    counts, mask = pl.pallas_call(
        functools.partial(
            _scan_kernel_unrolled,
            k=k,
            m_max=m_max,
            wf=wf,
            plens=plens,
            fold=fold,
            dtype=dtype,
            alphabet=kern_alphabet,
        ),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((p * fold, 1), jnp.int32),
            jax.ShapeDtypeStruct((nblk * p * fold, wf), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=nblk * m_max * bw * p * fold * wf * 5,
            bytes_accessed=r_rows * wpf + nblk * p * fold * wf * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, pchar, corpus_rows)
    # (nblk, P, fold, wf) -> (R, P, wf); int8 shrinks the host fetch 4x.
    mask = jnp.transpose(
        mask.reshape(nblk, p, fold, wf), (0, 2, 1, 3)
    ).reshape(r_rows, p, wf).astype(jnp.int8)
    return jnp.sum(counts.reshape(p, fold), axis=1), mask


@functools.partial(
    jax.jit, static_argnames=("k", "m_max", "wf", "halo", "interpret")
)
def scan_folded_pallas(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    plen: jax.Array,  # (P,) int32
    bound: jax.Array,  # () int32 — global window-index bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0, byte 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-pattern counts of matching windows in [start, bound). (P,) int32.

    ``corpus_rows`` row ``r`` must hold corpus bytes
    ``[start + r*wf, start + r*wf + wf + halo)`` (zero-padded past EOF), with
    ``halo >= m_max - 1`` and the row count ``R`` a multiple of ``FOLD``.
    """
    p = pat.shape[0]
    r_rows, wpf = corpus_rows.shape
    assert wpf == wf + halo, (wpf, wf, halo)
    assert halo >= m_max - 1, (halo, m_max)
    assert r_rows % FOLD == 0 and r_rows > 0, r_rows
    nblk = r_rows // FOLD
    bw = 2 * k + 1

    # Per-DP-step pattern band chars pband[x-1] = pat[:, x-1 : x-1+bw],
    # expanded to one row per (pattern, fold) pair and widened to int32
    # (Mosaic packs int8 4/sublane, which forbids the per-step leading-dim
    # slice this kernel does; the table is tiny).
    pband = jnp.stack([pat[:, x : x + bw] for x in range(m_max)])
    pband = jnp.repeat(pband, FOLD, axis=1).astype(jnp.int32)
    plen_exp = jnp.repeat(plen.astype(jnp.int32), FOLD).reshape(p * FOLD, 1)
    meta = jnp.stack(
        [bound.astype(jnp.int32).reshape(()), start.astype(jnp.int32).reshape(())]
    ).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec((FOLD, wpf), lambda i: (i, 0)),  # corpus rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pband
            pl.BlockSpec(memory_space=pltpu.VMEM),  # plen
        ],
        out_specs=pl.BlockSpec(
            (p * FOLD, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )

    counts = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, m_max=m_max, wf=wf, p=p),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p * FOLD, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=nblk * m_max * bw * p * FOLD * wf * 5,
            bytes_accessed=r_rows * wpf + nblk * p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, corpus_rows, pband, plen_exp)
    # Sum the FOLD sub-rows of each pattern back together.
    return jnp.sum(counts.reshape(p, FOLD), axis=1)
