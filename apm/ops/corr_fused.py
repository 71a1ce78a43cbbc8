"""Fused Pallas correlation scan: encode + MXU matmul + count in VMEM.

The XLA conv path (``apm.ops.corr_engine``) is bound by its text encode:
XLA materializes the ``(rows, L, C)`` channel-minor encode through
relayouts that cost ~90 effective VPU ops per element (DESIGN.md §9's
``ENC_OPS_PER_ELEM`` calibration), capping the k = 0 fast path at the
~9 GB/s "encode roof" the round-4 VERDICT asked to raise. This module
is the Mosaic-native answer: one Pallas kernel that widens the staged
text, builds the ±1 bit-plane encode directly in MXU-friendly
``(sublanes, 128)`` tiles (no channel-minor layout ever exists), runs
the correlation as plain ``jnp.dot`` tiles, and reduces matches to
counts — nothing but the uint8 text ever crosses HBM.

Layout ("phase-split im2col", the whole trick):

* Stride the correlation by S = 64 and shift-fold S window phases into
  the output columns (the §8 shift-fold pushed to its limit). Window
  ``j = u*128 + phase*64 + s`` (``s < 64``) needs text
  ``[j, j + m)`` — for ``m <= 65`` every tap of every window of an
  EVEN block (phase 0) lies inside the single aligned 128-byte chunk
  ``text[u*128 : u*128 + 128)``. So the im2col LHS for phase 0 is the
  encoded text *itself*, viewed as ``(rows*L/128, 128)`` — the classic
  unfold materialization that XLA's im2col loses to (measured 1.4-2.4
  GB/s, DESIGN §8) simply vanishes.
* Phase 1 (odd blocks, offset +64) reads the same view shifted by 64
  lanes — built with two 32-bit ``pltpu.roll``s and one select on the
  *int32 text* (Mosaic rotates are 32-bit-only), then encoded like
  phase 0.
* The kernel matrix ``KM[b][i', s*P + p] = ±(code bit b of
  pattern[p][i' - s])`` is (128, 64P) per plane: K exactly one MXU
  tile, N = 64 P columns. ``corr = sum_b LHS_b @ KM_b`` accumulates in
  f32 (exact: ±1 terms, |corr| <= B*m < 2^24).
* Per-column thresholds ``B * m_p`` and the per-row ownership limit
  (``j < clip(bound - start - r*wf, 0, wf)``, same contract as
  ``scan_corr_mxu``) gate the count; a sublane reduction accumulates
  ``(1, 64P)`` int32 partial counts across the grid.

MAC cost: ``128 * B * P`` per corpus byte (K-tile padding 128/(m+63)),
i.e. a ~63 GB/s bf16 MXU roof at P = 6/B = 2 and ~6 GB/s at P = 64 —
doubled again at wide P by int8 operands (``_INT8_MIN_SLOTS``; the
±1/0 planes are exact in int8, measured 2.2x at P = 64) — vs the
~9 GB/s encode-bound and 27-37%-of-MXU conv ceilings it replaces
(VERDICT r4 asks #1 and #2). The VPU side is ~30 written ops/byte
(2 encodes + epilogue; ~270 effective after Mosaic overheads — the
calibrated ``FUSED_OPS_PER_BYTE`` roofline term) — far below XLA's
calibrated encode cost either way.

Eligibility: ``m_max <= M_MAX_FUSED = 97`` (S = 32 four-phase split
covers m in (66, 97]; one K-tile per phase either way); longer
patterns keep the XLA conv path. The reference has no analog —
its k = 0 path runs the full O(m^2) DP per window (``src/utils.c:76-99``,
``src/database_over_ranks.cu:26-29``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .corr_engine import n_bitplanes

# Phase-split im2col constants. The COUNT kernel picks its phase stride
# from the pattern length: S = 64 (two phases per 128-lane chunk) for
# m <= 65, S = 32 (four phases) for m in (66, 97] — the requirement is
# m + S - 1 <= 128 so every tap of a phase block stays in one aligned
# K-tile. The PIECE kernel stays at S = 64 (its position-coverage proof
# needs drift < S, which only holds for m <= 65 — see below).
S_FUSED = 64
M_MAX_FUSED = 97  # count kernel: m + 32 - 1 <= 128
M_MAX_PIECES = 65  # piece kernel: drift bound < 64 (coverage proof)


def pick_s(m_max: int) -> int:
    """Phase stride for the count kernel: the widest S with
    m + S - 1 <= 128 among {64, 32}."""
    return 64 if m_max <= 65 else 32


def fused_eligible(m_max: int, wf: int, halo: int) -> bool:
    """COUNT-kernel gate: one-K-tile layout needs m <= 97 (S = 32
    phases), lane-tiled staging rows, and a >= 128-byte halo (the last
    window block's later phases read past ``wf``)."""
    return (
        0 < m_max <= M_MAX_FUSED
        and wf % 128 == 0
        and halo % 128 == 0
        and halo >= 128
    )


def fused_pieces_ok(m_max: int, wf: int, halo: int) -> bool:
    """PIECE-kernel gate: the row-any coverage proof (module comment at
    scan_pieces_fused) bounds the drifted piece start by wf + 61 only
    for m <= 65; longer patterns keep the XLA piece conv."""
    return fused_eligible(m_max, wf, halo) and m_max <= M_MAX_PIECES


def build_fused_tables(pat_raw: np.ndarray, plens, alphabet: np.ndarray):
    """±1 phase-folded kernel ``(B*128, s_ph*P)`` (bf16, or int8 at
    >= _INT8_MIN_SLOTS) + ``(1, s_ph*P)`` thresholds (``B * m_p``;
    unreachable sentinel for padding slots), ``s_ph = pick_s(m_max)``.
    Column ``s*P + p`` scores window phase-offset ``s`` of pattern
    ``p``."""
    P, m_max = pat_raw.shape
    assert m_max <= M_MAX_FUSED, m_max
    s_ph = pick_s(m_max)
    B = n_bitplanes(len(alphabet))
    # Pad the pattern slot count so chunk offsets/widths stay multiples
    # of 128 lanes when the column axis is chunked (s_ph*P >
    # _SINGLE_MAX): 128/s_ph slots per 128 lanes. Padding slots get the
    # unreachable sentinel threshold, so they count nothing.
    align = 128 // s_ph
    p_pad = P
    if s_ph * P > _SINGLE_MAX and P % align:
        p_pad = P + align - P % align
    km = np.zeros((B, 128, s_ph * p_pad), dtype=np.float32)
    thr = np.full((1, s_ph * p_pad), np.float32(2**30), dtype=np.float32)
    for pi in range(P):
        m = plens[pi]
        for s in range(s_ph):
            col = s * p_pad + pi
            thr[0, col] = B * m if m > 0 else np.float32(2**30)
            for i in range(min(m, m_max)):
                ci = int(np.searchsorted(alphabet, pat_raw[pi, i]))
                for b in range(B):
                    km[b, s + i, col] = 1.0 if (ci >> b) & 1 else -1.0
    # 2D kernel value (Mosaic keeps values 2D): planes stacked on rows.
    km2 = km.reshape(B * 128, s_ph * p_pad)
    if p_pad >= _INT8_MIN_SLOTS:  # MXU-bound regime: int8 operands
        return km2.astype(jnp.int8), thr.astype(np.int32)
    return km2.astype(jnp.bfloat16), thr


def pick_g(n_rows: int, l128: int, P: int) -> int:
    """Staging rows per grid step. The text block's sublane dim
    ``g*l128`` must be a multiple of 8 and ``l128`` is odd, so ``g`` is
    a multiple of 8; the f32 corr tile is bounded by column chunking
    (``_N_CHUNK``), not by ``g``. Re-tuned on chip after the round-5
    epilogue changes (256 MB, m = 50): g = 32 edges 16/24 at both P = 6
    (8.65 vs 8.31/8.06 GB/s) and P = 64 int8 (4.86 vs 4.80/4.77) —
    enough rows to amortize the per-step rolls/encode while the chunked
    epilogue keeps the working set inside VMEM."""
    del l128, P
    del n_rows  # callers pad partial blocks
    return 32


# Column-chunk width for the matmul/epilogue when 64P exceeds it: bounds
# the live f32 corr tile to (g*l128, _N_CHUNK) ~= 2 MB. Chunk offsets
# and widths stay multiples of 128 (Mosaic lane-slice alignment) because
# build_fused_tables pads P to even whenever 64P > _SINGLE_MAX.
_N_CHUNK = 1024
_SINGLE_MAX = 1536

# int8 MXU operands once the contraction binds (v5e int8 is 2x bf16
# peak; the ±1/0 planes are exact in int8 and the i32-select -> i8
# convert costs less than the MACs it halves). Measured on chip
# (bench/int8_fused_probe.py, 256 MB, same session, counts
# bit-identical): P=32 2.95 -> 5.19 GB/s (x1.76), P=64 1.80 -> 3.93
# (x2.19). Below ~32 slots the kernel is overhead-bound (DESIGN §9)
# and int8 buys nothing, so bf16 keeps the small-P path.
_INT8_MIN_SLOTS = 32


def _fused_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start]
    alph_ref,  # SMEM (1, C) int32 — sorted pattern alphabet
    scol_ref,  # VMEM (1, s_ph*P) int32 — column -> phase-slot offsets
    # (precomputed: the in-kernel iota + div-by-P cost a measured 16%)
    text_ref,  # VMEM (G*L128, 128) uint8 — this block's staged text view
    km_ref,  # VMEM (B*128, 64P) bf16 — phase-folded ±1 kernel (2D: plane
    # b occupies rows [b*128, (b+1)*128))
    thr_ref,  # VMEM (1, 64P) f32 — per-column thresholds
    out_ref,  # VMEM (1, 64P) int32 — accumulated per-column counts
    *,
    wf: int,
    l128: int,  # staging-row width in 128-lane chunks (= (wf+halo)/128)
    g: int,  # staging rows per grid step
    n_rows: int,  # rows carrying real windows (grid may cover padding)
    c_alpha: int,  # alphabet size (static)
    b_planes: int,  # ±1 planes (static)
    p: int,  # pattern columns per phase slot
    s_ph: int,  # phase stride (64 or 32; 128//s_ph phases)
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    m_rows = g * l128
    sp = s_ph * p
    tx = text_ref[:].astype(jnp.int32)  # (M, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 128), 1)

    def shifted(shift):
        # Text advanced ``shift`` bytes with cross-row carry: y[r, l] =
        # tx[r, l+shift] (l < 128-shift) else tx[r+1, l+shift-128].
        # Both rolls are int32 (Mosaic's rotate constraint); the final
        # sublane's wrapped garbage feeds only the halo chunk's
        # outputs, which the ownership mask kills (j >= wf >= limit).
        if shift == 0:
            return tx
        ra = pltpu.roll(tx, shift=128 - shift, axis=1)
        rb = pltpu.roll(ra, shift=m_rows - 1, axis=0)
        return jnp.where(lane < 128 - shift, ra, rb)

    i8 = km_ref.dtype == jnp.int8
    acc_t = jnp.int32 if i8 else jnp.float32

    def planes_of(t32):
        # Selects stay in the i32/f32 domain: the i1 masks from int32
        # compares carry (8, 128) tiling, and mixing them into
        # (16, 128)/(32, 128)-tiled narrow selects is an invalid Mosaic
        # relayout — the wide select + one convert is the supported
        # path. int8 operands feed the 2x-peak MXU mode at wide P
        # (_INT8_MIN_SLOTS).
        eqs = [t32 == alph_ref[0, c] for c in range(c_alpha)]
        valid = eqs[0]
        for e in eqs[1:]:
            valid = jnp.logical_or(valid, e)
        if i8:
            neg = jnp.where(valid, jnp.int32(-1), jnp.int32(0))
            one, dt = jnp.int32(1), jnp.int8
        else:
            neg = jnp.where(valid, jnp.float32(-1.0), jnp.float32(0.0))
            one, dt = jnp.float32(1.0), jnp.bfloat16
        out = []
        for b in range(b_planes):
            sel = [c for c in range(c_alpha) if (c >> b) & 1]
            if sel:
                pos = eqs[sel[0]]
                for c in sel[1:]:
                    pos = jnp.logical_or(pos, eqs[c])
            else:  # every code has bit b clear (only if c_alpha == 1)
                pos = jnp.zeros_like(valid)
            out.append(jnp.where(pos, one, neg).astype(dt))
        return out

    bound = meta_ref[0, 0]
    start = meta_ref[0, 1]
    # Per-row (sublane) ownership pieces, broadcast against column tiles.
    rho1 = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
    u1 = rho1 % l128
    r_abs = i * g + rho1 // l128
    limit1 = jnp.where(
        r_abs < n_rows,
        jnp.clip(bound - start - r_abs * wf, 0, wf),
        0,
    )
    base1 = u1 * 128  # window base of this text chunk

    phases = [
        (ph, planes_of(shifted(ph * s_ph))) for ph in range(128 // s_ph)
    ]
    nch = sp if sp <= _SINGLE_MAX else _N_CHUNK
    cnts = []
    for c0 in range(0, sp, nch):
        nc = min(nch, sp - c0)
        thrc = thr_ref[0:1, c0 : c0 + nc]
        s_col = scol_ref[0:1, c0 : c0 + nc]
        cnt = None
        for phase, pls in phases:
            acc = jnp.dot(
                pls[0],
                km_ref[0:128, c0 : c0 + nc],
                preferred_element_type=acc_t,
            )
            for b in range(1, b_planes):
                acc = acc + jnp.dot(
                    pls[b],
                    km_ref[b * 128 : (b + 1) * 128, c0 : c0 + nc],
                    preferred_element_type=acc_t,
                )
            # j = base1 + s_col + phase*s_ph < limit1, folded so the
            # per-element add disappears (rhs is a per-row scalar).
            rhs = limit1 - base1 - phase * s_ph
            match = jnp.logical_and(acc >= thrc, s_col < rhs)
            c = jnp.sum(match.astype(jnp.int32), axis=0, keepdims=True)
            cnt = c if cnt is None else cnt + c
        cnts.append(cnt)
    total = cnts[0] if len(cnts) == 1 else jnp.concatenate(cnts, axis=1)
    out_ref[:] += total


@functools.partial(
    jax.jit,
    static_argnames=(
        "wf", "l128", "n_rows", "g", "p", "c_alpha", "b_planes",
        "s_ph", "interpret", "p_out",
    ),
)
def scan_corr_fused(
    rows: jax.Array,  # (R, wf + halo) uint8 — folded staged corpus rows
    km: jax.Array,  # (B*128, 64P) bf16 — build_fused_tables
    thr: jax.Array,  # (1, 64P) f32
    alph: jax.Array,  # (C,) uint8 — sorted pattern alphabet
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    wf: int,
    l128: int,
    n_rows: int,
    g: int,
    p: int,
    c_alpha: int,
    b_planes: int,
    s_ph: int = S_FUSED,
    interpret: bool = False,
    p_out: int = 0,
):
    """(max(P, p_out),) int32 exact-match counts for this chunk's
    device-owned windows — same call contract as
    ``apm.ops.corr_engine.scan_corr_mxu`` (row ``r`` owns
    ``[start + r*wf, start + (r+1)*wf) ∩ [0, bound)``; rows past
    ``n_rows`` own nothing), same conformance target (the oracle).

    The ``(R, wf + halo)`` staging buffer is viewed as
    ``(R*(wf+halo)/128, 128)`` inside the jit — a row-major-compatible
    reshape XLA lowers to a bitcast, so no relayout runs on device.
    """
    assert km.shape[1] == s_ph * p, (km.shape, p, s_ph)
    rows2 = rows.reshape(-1, 128) if rows.ndim == 2 and rows.shape[1] != 128 else rows
    r2 = rows2.shape[0]
    block = g * l128
    pad = (-r2) % block
    if pad:
        rows2 = jnp.pad(rows2, ((0, pad), (0, 0)))
        r2 += pad
    grid = r2 // block
    meta = jnp.stack(
        [bound.astype(jnp.int32), start.astype(jnp.int32)]
    ).reshape(1, 2)
    alph2 = alph.astype(jnp.int32).reshape(1, -1)
    # Column -> phase-slot offsets, baked as an executable constant (the
    # in-kernel iota + div-by-P recomputation cost a measured 16%).
    scol = (jnp.arange(s_ph * p, dtype=jnp.int32) // p).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alphabet
            pl.BlockSpec((1, s_ph * p), lambda i: (0, 0)),  # scol
            pl.BlockSpec((block, 128), lambda i: (i, 0)),  # text view
            pl.BlockSpec((b_planes * 128, s_ph * p), lambda i: (0, 0)),
            pl.BlockSpec((1, s_ph * p), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, s_ph * p), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            wf=wf, l128=l128, g=g, n_rows=n_rows,
            c_alpha=c_alpha, b_planes=b_planes, p=p, s_ph=s_ph,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, s_ph * p), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            # (128/s_ph) phases x B planes x (block,128)@(128,s_ph*P)/step
            flops=grid * (128 // s_ph) * b_planes * block * 128
            * s_ph * p * 2,
            bytes_accessed=r2 * 128,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, alph2, scol, rows2, km, thr)

    counts = jnp.sum(out.reshape(s_ph, p), axis=0, dtype=jnp.int32)
    if p_out > p:
        counts = jnp.pad(counts, (0, p_out - p))
    return counts


# ---------------------------------------------------------------------------
# Fused conv phase 1 for pigeonhole filtration (k >= 1): same phase-split
# im2col layout, piece columns instead of pattern columns, and a per-
# staging-row candidacy epilogue instead of a count reduction.
#
# Position coverage: row-any candidacy must see piece hits at every
# stride-1 position up to wf - 1 + (m_p - l_last) + k (the furthest
# drifted piece start of an owned window — corr_engine's halo proof).
# For fused-eligible patterns (m <= 65, exact tier => k <= 4 and piece
# length l >= max(k, 8)): m - l_last + k <= (m - l) + k <= 57 + 4 = 61
# < 64, so the two phases' union [0, wf + 64) covers every needed
# position; phase-1 positions of the last 128-chunk (which would read
# the sublane-roll's wrapped garbage) start at >= wf + halo - 64 >=
# wf + 64 and are masked out by the same j < wf + 64 bound.


def build_fused_piece_tables(
    pat_raw: np.ndarray, plens, k: int, alphabet: np.ndarray
):
    """±1 phase-folded PIECE tables for the fused phase 1:
    ``(km (B*128, 64*Np) bf16, thr (1, 64*Np) f32, owner64 (64*Np, P)
    f32)`` where Np is the (possibly even-padded) piece-slot count and
    ``owner64[s*Np + n, p]`` maps piece hits straight onto patterns —
    the owner fold happens inside the kernel's chunked matmul."""
    from .filter_kernel import pieces_of_j, tier_of

    P, m_max = pat_raw.shape
    # The PIECE coverage proof (module comment above) needs the whole
    # pattern <= 65 — NOT the count kernel's 97 (fused_pieces_ok gate).
    assert max(plens) <= M_MAX_PIECES, plens
    B = n_bitplanes(len(alphabet))
    pieces = []  # (pattern index, offset, length)
    for pi in range(P):
        m = plens[pi]
        if m == 0:
            continue
        j, kp = tier_of(m, k)
        assert kp == 0, "fused phase 1 is exact-tier only"
        for off, length in pieces_of_j(m, j):
            assert length <= M_MAX_PIECES
            pieces.append((pi, off, length))
    n = len(pieces)
    n_pad = n + (n % 2 if S_FUSED * n > _SINGLE_MAX else 0)
    km = np.zeros((B, 128, S_FUSED * n_pad), dtype=np.float32)
    thr = np.full(
        (1, S_FUSED * n_pad), np.float32(2**30), dtype=np.float32
    )
    owner64 = np.zeros((S_FUSED * n_pad, P), dtype=np.float32)
    for ni, (pi, off, length) in enumerate(pieces):
        for s in range(S_FUSED):
            col = s * n_pad + ni
            thr[0, col] = B * length
            owner64[col, pi] = 1.0
            for i in range(length):
                ci = int(np.searchsorted(alphabet, pat_raw[pi, off + i]))
                for b in range(B):
                    km[b, s + i, col] = 1.0 if (ci >> b) & 1 else -1.0
    km2 = km.reshape(B * 128, S_FUSED * n_pad)
    if n_pad >= _INT8_MIN_SLOTS:  # MXU-bound regime: int8 operands
        return km2.astype(jnp.int8), thr.astype(np.int32), owner64
    return km2.astype(jnp.bfloat16), thr, owner64


def _fused_pieces_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [window bound (global), global start]
    alph_ref,  # SMEM (1, C) int32 — sorted pattern alphabet
    scol_ref,  # VMEM (1, 64*Np) int32 — column -> phase-slot offsets
    text_ref,  # VMEM (G*L128, 128) uint8 — this block's staged text view
    km_ref,  # VMEM (B*128, 64*Np) bf16 — phase-folded piece kernel
    thr_ref,  # VMEM (1, 64*Np) f32 — per-column thresholds
    own_ref,  # VMEM (64*Np, P) f32 — phase-folded piece -> pattern map
    out_ref,  # VMEM (G*L128, P) f32 — per-128-chunk piece-hit counts
    *,
    wf: int,
    l128: int,
    g: int,
    n_rows: int,
    c_alpha: int,
    b_planes: int,
    n_slots: int,  # piece slots per phase (Np)
    p_pat: int,  # pattern columns of the owner map
):
    i = pl.program_id(0)
    m_rows = g * l128
    sp = S_FUSED * n_slots
    tx = text_ref[:].astype(jnp.int32)

    r1 = pltpu.roll(tx, shift=64, axis=1)
    r2 = pltpu.roll(r1, shift=m_rows - 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 128), 1)
    txs = jnp.where(lane < 64, r1, r2)

    i8 = km_ref.dtype == jnp.int8  # wide piece sets: 2x-peak MXU mode
    acc_t = jnp.int32 if i8 else jnp.float32

    def planes_of(t32):
        eqs = [t32 == alph_ref[0, c] for c in range(c_alpha)]
        valid = eqs[0]
        for e in eqs[1:]:
            valid = jnp.logical_or(valid, e)
        if i8:
            neg = jnp.where(valid, jnp.int32(-1), jnp.int32(0))
            one, dt = jnp.int32(1), jnp.int8
        else:
            neg = jnp.where(valid, jnp.float32(-1.0), jnp.float32(0.0))
            one, dt = jnp.float32(1.0), jnp.bfloat16
        out = []
        for b in range(b_planes):
            sel = [c for c in range(c_alpha) if (c >> b) & 1]
            if sel:
                pos = eqs[sel[0]]
                for c in sel[1:]:
                    pos = jnp.logical_or(pos, eqs[c])
            else:
                pos = jnp.zeros_like(valid)
            out.append(jnp.where(pos, one, neg).astype(dt))
        return out

    bound = meta_ref[0, 0]
    start = meta_ref[0, 1]
    rho1 = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
    u1 = rho1 % l128
    r_abs = i * g + rho1 // l128
    # Row-any candidacy: a live staging row is one owning >= 1 valid
    # window (same gate as scan_pieces_conv); the position bound is the
    # coverage bound j < wf + 64, NOT the ownership limit.
    live = jnp.logical_and(r_abs < n_rows, start + r_abs * wf < bound)
    base1 = u1 * 128
    jmax = wf + S_FUSED

    total = jnp.zeros((m_rows, p_pat), jnp.float32)
    nch = sp if sp <= _SINGLE_MAX else _N_CHUNK
    for phase, t32 in ((0, tx), (1, txs)):
        pls = planes_of(t32)
        for c0 in range(0, sp, nch):
            nc = min(nch, sp - c0)
            acc = jnp.dot(
                pls[0],
                km_ref[0:128, c0 : c0 + nc],
                preferred_element_type=acc_t,
            )
            for b in range(1, b_planes):
                acc = acc + jnp.dot(
                    pls[b],
                    km_ref[b * 128 : (b + 1) * 128, c0 : c0 + nc],
                    preferred_element_type=acc_t,
                )
            s_col = scol_ref[0:1, c0 : c0 + nc]
            rhs = jnp.where(live, jmax - base1 - phase * 64, jnp.int32(0))
            hit = jnp.logical_and(
                acc >= thr_ref[0:1, c0 : c0 + nc],
                s_col < rhs,
            )
            hitf = jnp.where(hit, jnp.float32(1.0), jnp.float32(0.0))
            total = total + jnp.dot(
                hitf,
                own_ref[c0 : c0 + nc, :],
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = total


@functools.partial(
    jax.jit,
    static_argnames=(
        "wf", "l128", "n_rows", "g", "n_slots", "p_pat", "c_alpha",
        "b_planes", "interpret",
    ),
)
def scan_pieces_fused(
    rows: jax.Array,  # (R, wf + halo) uint8 — folded staged corpus rows
    km: jax.Array,  # (B*128, 64*Np) bf16 — build_fused_piece_tables
    thr: jax.Array,  # (1, 64*Np) f32
    owner64: jax.Array,  # (64*Np, P) f32
    alph: jax.Array,  # (C,) uint8 — sorted pattern alphabet
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    wf: int,
    l128: int,
    n_rows: int,
    g: int,
    n_slots: int,
    p_pat: int,
    c_alpha: int,
    b_planes: int,
    interpret: bool = False,
):
    """Fused phase 1: ``(fcnt (P,) int32, rowmap (R, P) int32)`` — the
    ``scan_pieces_conv`` contract (fcnt is a conservative candidate
    proxy, 0 iff no candidates; rowmap flags rows with any piece hit;
    non-live rows never go hot). Hit totals may differ from the conv's
    (each engine counts a different sound superset of positions);
    everything downstream consumes only hot/cold and fcnt == 0."""
    assert km.shape[1] == S_FUSED * n_slots, (km.shape, n_slots)
    rows2 = (
        rows.reshape(-1, 128)
        if rows.ndim == 2 and rows.shape[1] != 128
        else rows
    )
    r2 = rows2.shape[0]
    block = g * l128
    pad = (-r2) % block
    if pad:
        rows2 = jnp.pad(rows2, ((0, pad), (0, 0)))
        r2 += pad
    grid = r2 // block
    meta = jnp.stack(
        [bound.astype(jnp.int32), start.astype(jnp.int32)]
    ).reshape(1, 2)
    alph2 = alph.astype(jnp.int32).reshape(1, -1)
    scol = (
        jnp.arange(S_FUSED * n_slots, dtype=jnp.int32) // n_slots
    ).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alphabet
            pl.BlockSpec((1, S_FUSED * n_slots), lambda i: (0, 0)),
            pl.BlockSpec((block, 128), lambda i: (i, 0)),  # text view
            pl.BlockSpec(
                (b_planes * 128, S_FUSED * n_slots), lambda i: (0, 0)
            ),
            pl.BlockSpec((1, S_FUSED * n_slots), lambda i: (0, 0)),
            pl.BlockSpec((S_FUSED * n_slots, p_pat), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (block, p_pat), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    per_rho = pl.pallas_call(
        functools.partial(
            _fused_pieces_kernel,
            wf=wf, l128=l128, g=g, n_rows=n_rows,
            c_alpha=c_alpha, b_planes=b_planes, n_slots=n_slots,
            p_pat=p_pat,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r2, p_pat), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=grid * 2 * b_planes * block * 128 * S_FUSED * n_slots * 2,
            bytes_accessed=r2 * 128,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, alph2, scol, rows2, km, thr, owner64)

    r_real = rows.shape[0] if rows.shape[1] != 128 else rows.shape[0] // l128
    rowpat = jnp.sum(
        per_rho[: r_real * l128].reshape(r_real, l128, p_pat), axis=1
    )
    fcnt = jnp.sum(rowpat, axis=0).astype(jnp.int32)
    return fcnt, (rowpat > 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Fused batch scan (Scanner.count_batch's k = 0 corr path): same
# phase-split layout, but window ownership arrives PRE-RESOLVED as a
# per-staging-row limit vector (the caller owns the virtual-window-space
# bookkeeping — the scan_corr_batch contract), and counts come back per
# fold-block instead of per chunk.


def batch_owner(p_pad: int, s_ph: int) -> np.ndarray:
    """Column → pattern fold map for the batch kernel:
    ``owner[s*p_pad + q, q] = 1``. f32 — the in-kernel fold matmul runs
    f32 regardless of the operand dtype."""
    owner = np.zeros((s_ph * p_pad, p_pad), dtype=np.float32)
    for s in range(s_ph):
        for q in range(p_pad):
            owner[s * p_pad + q, q] = 1.0
    return owner


def _fused_batch_kernel(
    alph_ref,  # SMEM (1, C) int32 — sorted pattern alphabet
    scol_ref,  # VMEM (1, s_ph*P) int32 — column -> phase-slot offsets
    text_ref,  # VMEM (G*L128, 128) uint8 — this block's staged text view
    km_ref,  # VMEM (B*128, s_ph*P) bf16/int8 — phase-folded ±1 kernel
    thr_ref,  # VMEM (1, s_ph*P) f32/int32 — per-column thresholds
    own_ref,  # VMEM (s_ph*P, P) f32 — column -> pattern fold map
    lim_ref,  # VMEM (G*L128, 1) int32 — per-128-chunk row limits
    out_ref,  # VMEM (G*L128, P) f32 — per-128-chunk match counts
    *,
    l128: int,
    g: int,
    c_alpha: int,
    b_planes: int,
    p: int,
    s_ph: int,
):
    m_rows = g * l128
    sp = s_ph * p
    tx = text_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 128), 1)

    def shifted(shift):
        if shift == 0:
            return tx
        ra = pltpu.roll(tx, shift=128 - shift, axis=1)
        rb = pltpu.roll(ra, shift=m_rows - 1, axis=0)
        return jnp.where(lane < 128 - shift, ra, rb)

    i8 = km_ref.dtype == jnp.int8
    acc_t = jnp.int32 if i8 else jnp.float32

    def planes_of(t32):
        eqs = [t32 == alph_ref[0, c] for c in range(c_alpha)]
        valid = eqs[0]
        for e in eqs[1:]:
            valid = jnp.logical_or(valid, e)
        if i8:
            neg = jnp.where(valid, jnp.int32(-1), jnp.int32(0))
            one, dt = jnp.int32(1), jnp.int8
        else:
            neg = jnp.where(valid, jnp.float32(-1.0), jnp.float32(0.0))
            one, dt = jnp.float32(1.0), jnp.bfloat16
        out = []
        for b in range(b_planes):
            sel = [c for c in range(c_alpha) if (c >> b) & 1]
            if sel:
                pos = eqs[sel[0]]
                for c in sel[1:]:
                    pos = jnp.logical_or(pos, eqs[c])
            else:
                pos = jnp.zeros_like(valid)
            out.append(jnp.where(pos, one, neg).astype(dt))
        return out

    rho1 = jax.lax.broadcasted_iota(jnp.int32, (m_rows, 1), 0)
    base1 = (rho1 % l128) * 128
    limit1 = lim_ref[:]  # (m_rows, 1) — pre-resolved per staging row

    phases = [
        (ph, planes_of(shifted(ph * s_ph))) for ph in range(128 // s_ph)
    ]
    nch = sp if sp <= _SINGLE_MAX else _N_CHUNK
    total = jnp.zeros((m_rows, p), jnp.float32)
    for c0 in range(0, sp, nch):
        nc = min(nch, sp - c0)
        thrc = thr_ref[0:1, c0 : c0 + nc]
        s_col = scol_ref[0:1, c0 : c0 + nc]
        for phase, pls in phases:
            acc = jnp.dot(
                pls[0],
                km_ref[0:128, c0 : c0 + nc],
                preferred_element_type=acc_t,
            )
            for b in range(1, b_planes):
                acc = acc + jnp.dot(
                    pls[b],
                    km_ref[b * 128 : (b + 1) * 128, c0 : c0 + nc],
                    preferred_element_type=acc_t,
                )
            rhs = limit1 - base1 - phase * s_ph  # per-row scalar fold
            match = jnp.logical_and(acc >= thrc, s_col < rhs)
            hitf = jnp.where(match, jnp.float32(1.0), jnp.float32(0.0))
            total = total + jnp.dot(
                hitf,
                own_ref[c0 : c0 + nc, :],
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = total


@functools.partial(
    jax.jit,
    static_argnames=(
        "wf", "l128", "fold", "g", "p", "c_alpha", "b_planes", "s_ph",
        "interpret", "p_out",
    ),
)
def scan_corr_batch_fused(
    rows: jax.Array,  # (R, wf + halo) uint8 — folded rows, MANY corpora
    km: jax.Array,  # (B*128, s_ph*P) — build_fused_tables
    thr: jax.Array,  # (1, s_ph*P)
    owner: jax.Array,  # (s_ph*P, P) f32 — batch_owner
    alph: jax.Array,  # (C,) uint8 — sorted pattern alphabet
    limits: jax.Array,  # (R,) int32 — valid windows per row (precomputed)
    *,
    wf: int,
    l128: int,
    fold: int,  # rows per batch block (R % fold == 0)
    g: int,
    p: int,
    c_alpha: int,
    b_planes: int,
    s_ph: int = S_FUSED,
    interpret: bool = False,
    p_out: int = 0,
):
    """Batched fused correlation: per-BLOCK counts ``(R//fold,
    max(P, p_out)) int32`` — the ``scan_corr_batch`` contract (window
    ownership pre-resolved as ``limits[r]``; padding rows carry limit
    0), fused-kernel speed (DESIGN §8)."""
    assert km.shape[1] == s_ph * p, (km.shape, p, s_ph)
    r_rows = rows.shape[0]
    assert r_rows % fold == 0, (r_rows, fold)
    rows2 = rows.reshape(-1, 128)
    lim2 = jnp.repeat(limits.astype(jnp.int32), l128).reshape(-1, 1)
    r2 = rows2.shape[0]
    block = g * l128
    pad = (-r2) % block
    if pad:
        rows2 = jnp.pad(rows2, ((0, pad), (0, 0)))
        lim2 = jnp.pad(lim2, ((0, pad), (0, 0)))
        r2 += pad
    grid = r2 // block
    alph2 = alph.astype(jnp.int32).reshape(1, -1)
    scol = (jnp.arange(s_ph * p, dtype=jnp.int32) // p).reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # alphabet
            pl.BlockSpec((1, s_ph * p), lambda i: (0, 0)),  # scol
            pl.BlockSpec((block, 128), lambda i: (i, 0)),  # text view
            pl.BlockSpec((b_planes * 128, s_ph * p), lambda i: (0, 0)),
            pl.BlockSpec((1, s_ph * p), lambda i: (0, 0)),
            pl.BlockSpec((s_ph * p, p), lambda i: (0, 0)),
            pl.BlockSpec((block, 1), lambda i: (i, 0)),  # limits
        ],
        out_specs=pl.BlockSpec(
            (block, p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    per_rho = pl.pallas_call(
        functools.partial(
            _fused_batch_kernel,
            l128=l128, g=g, c_alpha=c_alpha, b_planes=b_planes,
            p=p, s_ph=s_ph,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r2, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=grid * (128 // s_ph) * b_planes * block * 128
            * s_ph * p * 2,
            bytes_accessed=r2 * 128,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alph2, scol, rows2, km, thr, owner, lim2)

    per_row = jnp.sum(
        per_rho[: r_rows * l128].reshape(r_rows, l128, p), axis=1
    )
    counts = jnp.sum(
        per_row.reshape(r_rows // fold, fold, p), axis=1
    ).astype(jnp.int32)
    if p_out > p:
        counts = jnp.pad(counts, ((0, 0), (0, p_out - p)))
    return counts
