"""Fused filtration + on-device candidate verification.

Round 1 ran phase 1 (pigeonhole filtration, apm.ops.filter_kernel) on
device, fetched the per-row candidate map to the host, staged the hot rows
back onto the device, and ran phase 2 (banded DP) in a second call. The
host round trip dominated: phase 1 alone ran ~1.25 GB/s at k = 1 but
end-to-end was ~574 MB/s whenever matches were present.

This module fuses both phases into ONE jitted device program per chunk:

* phase 1 produces the per-staging-row candidate map *on device*;
* a device-side compaction (``nonzero`` + gathered ``take``) selects up to
  ``max_hot`` hot rows straight out of the staged corpus (which is already
  device-resident — no re-staging, no transfer);
* the banded DP kernel verifies the gathered rows, masked to the true hot
  count.

The host receives only four tiny arrays per chunk — candidate totals,
verified totals, the hot-row count, and the (at most one) window-bound-
clipped hot row — so the common cases (zero candidates, sparse matches)
complete without ever synchronizing on a row map. Overflow (more than
``max_hot`` hot rows) and high candidate density are detected from the
hot-row count and handled by the orchestrator (apm.models.pipeline) via
the host-staged path or a banded-DP rescan.

The reference has no analog: its kernels always run the full DP per
window (``src/utils.c:76-99``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .filter_kernel import FOLD, scan_filter_pallas
from .pallas_kernel import resolve_dp_mode, scan_folded_pallas_unrolled

# Hot-row compaction bucket: rows verified on device per chunk. Must be a
# multiple of FOLD (kernel block height). 64 rows x (wf + halo) bytes is
# ~0.5-4 MB of gather output and ~0.2% of a 256 MB chunk's DP work, so the
# always-on verification pass is effectively free.
MAX_HOT = 64

# Clipped-row slots: at most ONE row per chunk can straddle the window
# bound (rows tile the chunk disjointly; rows fully past the bound have
# every window masked and cannot be hot). 8 is pure safety margin.
MAX_CLIP = 8

# Hot-row bucket ceiling for pick_max_hot (rows). The gather output is
# max_hot * (wf + halo) bytes (~8.5 MB at 1024 x 8320) and the nonzero
# compaction is linear in R — both stay noise.
MAX_HOT_CAP = 1024


def pick_max_hot(n_rows: int, wf: int, plens, k: int) -> int:
    """Size the on-device hot-row bucket to the chunk.

    The fused program ALWAYS runs the banded verify over ``max_hot``
    gathered rows (masked to the true hot count), so the bucket is an
    always-on cost: budget it at ~1 op per scanned corpus byte — noise
    next to phase 1's ~100+ ops/byte — and grow it with the chunk. A
    256 MB chunk gets the full 1024 rows (one hot row per 256 KB of
    corpus before overflow), while wide pattern tables, whose per-row
    verify is expensive, stay at the floor. Round-1 sized this bucket at
    a flat 64 rows; a 256 MB chunk with matches every ~1 MB then paid
    the host-staged overflow recovery (a rowmap fetch + re-staging) on
    EVERY scan — ~120 ms of a 202 ms call (bench/fp1_probe.py).
    """
    ops_row = wf * sum(5 * (2 * k + 1) * m for m in plens if m > 0)
    budget_ops = n_rows * wf * 64  # ~64 verify ops per corpus window
    cap = min(n_rows // 20, budget_ops // max(ops_row, 1))
    cap = int(min(MAX_HOT_CAP, max(MAX_HOT, cap), max(n_rows, FOLD)))
    return max(FOLD, (cap // FOLD) * FOLD)


def _dp_mode_shim(inner):
    """Wrap a fused jit entry so ``alphabet``/``dp_impl`` are normalized
    OUTSIDE the jit (``pallas_kernel.resolve_dp_mode``): when Myers mode
    is off the banded kernel never reads the alphabet, and leaving it in
    the static cache key would recompile per pattern-byte-set. ``len(
    plens)`` equals the pattern-table row count the SMEM budget check
    needs."""

    @functools.wraps(inner)
    def shim(*args, **kw):
        kw["alphabet"], kw["dp_impl"] = resolve_dp_mode(
            kw["k"], kw.get("alphabet", ()), kw.get("dp_dtype", "int32"),
            kw.get("dp_impl", "auto"), len(kw["plens"]), kw["m_max"],
        )
        return inner(*args, **kw)

    return shim


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "max_hot", "dp_dtype", "alphabet", "dp_impl",
        "interpret",
    ),
)
def filter_verify_chunk(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat_raw: jax.Array,  # (P, m_max) uint8 — raw pattern table
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    max_hot: int = MAX_HOT,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
):
    """One-call phase 1 + phase 2 for one staged chunk (k >= 1).

    Returns ``(packed, rowmap)``. ``packed`` is ONE int32 vector — a
    device→host fetch costs a full link round trip (~20-30 ms on tunneled
    testbeds), so everything the host needs is packed into a single
    array, layout ``[fcnt (P) | vcnt (P) | n_hot (1) | clip_starts
    (MAX_CLIP)]``:

    * ``fcnt`` — phase-1 candidate totals;
    * ``vcnt`` — exact match counts over the first ``max_hot`` *full* hot
      rows (complete iff ``n_hot <= max_hot``);
    * ``n_hot`` — true number of full hot rows in this chunk;
    * ``clip_starts`` — global window starts of hot rows clipped by
      ``bound`` (−1 padding); verified host-side.

    ``rowmap`` (R, P) int32 is the phase-1 row map, left on device;
    fetched only for overflow recovery.

    Verification runs over the *union* of hot rows with all ``plens``
    patterns: a row hot only for pattern A contributes zero to pattern B,
    because a B-match would imply a B-candidate (pigeonhole) and the row
    would be hot for B too.
    """
    assert k >= 1, "k = 0 candidates are exact; call scan_filter_pallas"
    assert max_hot % FOLD == 0 and max_hot > 0
    fcnt, rowmap = scan_filter_pallas(
        corpus_rows, pat_raw, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
        interpret=interpret,
    )
    return _verify_phase2(
        corpus_rows, fcnt, rowmap, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, max_hot=max_hot,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )


def _verify_phase2(
    corpus_rows, fcnt, rowmap, pat, bound, start, *, k, m_max, wf, halo,
    plens, max_hot, dp_dtype, alphabet, dp_impl, interpret,
):
    """Shared phase 2: gather hot rows from the device-resident staging,
    verify with the banded kernel, pack the host-facing vector (see
    :func:`filter_verify_chunk`)."""
    r_rows = corpus_rows.shape[0]
    hot = jnp.sum(rowmap, axis=1) > 0  # (R,)
    row_start = (
        start.astype(jnp.int32)
        + jnp.arange(r_rows, dtype=jnp.int32) * wf
    )
    full = row_start + wf <= bound
    use = jnp.logical_and(hot, full)
    n_hot = jnp.sum(use.astype(jnp.int32))

    def _verify_with(bucket):
        # The banded verify sweeps all ``bucket`` staged rows regardless
        # of how many are real (static shapes; vbound only masks
        # counting) — so pick the bucket by the actual hot count under
        # lax.cond: zero-candidate chunks skip it entirely (~10-16 ms
        # per 512 MB measured, DESIGN §9(c)), lightly-hot chunks (the
        # planted-match steady state) pay a quarter bucket, and only
        # genuinely dense chunks sweep the full max_hot.
        def f():
            idx = jnp.nonzero(use, size=bucket, fill_value=r_rows)[0]
            stage = jnp.take(
                corpus_rows, idx, axis=0, mode="fill", fill_value=0
            )  # (bucket, wf + halo)
            vbound = jnp.minimum(n_hot, bucket) * wf
            return scan_folded_pallas_unrolled(
                stage, pat, vbound, jnp.int32(0),
                k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
                dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
                interpret=interpret,
            ).astype(jnp.int32)
        return f

    zeros = lambda: jnp.zeros((pat.shape[0],), jnp.int32)
    small = max(FOLD, (max_hot // 4 // FOLD) * FOLD)
    if small < max_hot:
        vcnt = jax.lax.cond(
            n_hot == 0,
            zeros,
            lambda: jax.lax.cond(
                n_hot <= small, _verify_with(small), _verify_with(max_hot)
            ),
        )
    else:
        vcnt = jax.lax.cond(n_hot > 0, _verify_with(max_hot), zeros)

    clip = jnp.logical_and(hot, jnp.logical_not(full))
    clip_idx = jnp.nonzero(clip, size=MAX_CLIP, fill_value=-1)[0]
    clip_starts = jnp.where(
        clip_idx >= 0, start + clip_idx.astype(jnp.int32) * wf, -1
    )
    packed = jnp.concatenate(
        [
            fcnt.astype(jnp.int32),
            vcnt.astype(jnp.int32),
            n_hot.reshape(1),
            clip_starts,
        ]
    )
    return packed, rowmap


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "w_kern", "n_rows", "g_rows",
        "fp1_stride", "max_hot", "dp_dtype", "alphabet", "dp_impl", "interpret",
    ),
)
def filter_verify_chunk_conv(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pkern: jax.Array,  # (w_kern, C, N) bf16 — one-hot piece kernel
    pthr: jax.Array,  # (N,) f32 — piece thresholds
    owner: jax.Array,  # (N, P) f32 — piece -> pattern one-hot
    alph: jax.Array,  # (C,) uint8 — pattern alphabet
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    w_kern: int,
    n_rows: int,
    g_rows: int,
    fp1_stride: int = 1,
    max_hot: int = MAX_HOT,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
):
    """:func:`filter_verify_chunk` with conv phase 1 (k >= 1).

    Phase 1 runs pigeonhole piece matching on the MXU
    (``apm.ops.corr_engine.scan_pieces_conv``) instead of the shift-OR
    filter kernel — same ``(packed, rowmap)`` contract, row maps are a
    conservative superset (row-any candidacy), and phase 2 is shared, so
    counts are identical. Selected by ``ScanPlan.fp1_conv``
    (``fp1_conv_eligible``: all patterns exact-tier with pieces >=
    FP1_LMIN long and the measured conv-ahead crossover).
    """
    from .corr_engine import scan_pieces_conv

    assert k >= 1
    assert max_hot % FOLD == 0 and max_hot > 0
    fcnt, rowmap = scan_pieces_conv(
        corpus_rows, pkern, pthr, owner, alph, bound, start,
        wf=wf, w_kern=w_kern, n_rows=n_rows, g_rows=g_rows,
        stride=fp1_stride,
    )
    return _verify_phase2(
        corpus_rows, fcnt, rowmap, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, max_hot=max_hot,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "l128", "n_rows", "g",
        "n_slots", "p_pat", "c_alpha", "b_planes", "max_hot", "dp_dtype",
        "alphabet", "dp_impl", "interpret",
    ),
)
def filter_verify_chunk_fused(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pkm: jax.Array,  # (B*128, 64*Np) bf16 — fused piece kernel
    pthr: jax.Array,  # (1, 64*Np) f32 — piece thresholds
    powner: jax.Array,  # (64*Np, P) f32 — phase-folded piece -> pattern
    alph: jax.Array,  # (C,) uint8 — pattern alphabet
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    l128: int,
    n_rows: int,
    g: int,
    n_slots: int,
    p_pat: int,
    c_alpha: int,
    b_planes: int,
    max_hot: int = MAX_HOT,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
):
    """:func:`filter_verify_chunk` with the FUSED Pallas phase 1
    (``apm.ops.corr_fused.scan_pieces_fused`` — the phase-split-im2col
    piece scan, DESIGN §8). Same ``(packed, rowmap)`` contract; row maps
    are a conservative superset (row-any candidacy over a sound position
    superset) and phase 2 is shared, so counts are identical. Selected
    when ``ScanPlan.fp1_conv`` holds AND the fused layout is eligible
    (``Scanner._use_fused_corr``: m_max <= 65, 128-aligned staging)."""
    from .corr_fused import scan_pieces_fused

    assert k >= 1
    assert max_hot % FOLD == 0 and max_hot > 0
    fcnt, rowmap = scan_pieces_fused(
        corpus_rows, pkm, pthr, powner, alph, bound, start,
        wf=wf, l128=l128, n_rows=n_rows, g=g, n_slots=n_slots,
        p_pat=p_pat, c_alpha=c_alpha, b_planes=b_planes,
        interpret=interpret,
    )
    return _verify_phase2(
        corpus_rows, fcnt, rowmap, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, max_hot=max_hot,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )


# Overflow batch geometry for count_hot_batch: rows re-verified per
# dispatch, and the compaction ceiling (hot counts beyond OVERFLOW_CAP
# fall back to the orchestrator's host/rescan recovery; the density check
# usually routes such chunks to a full rescan first anyway).
OVERFLOW_BATCH = 512
OVERFLOW_CAP = 4096


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "n_batch", "cap",
        "dp_dtype", "alphabet", "dp_impl", "interpret",
    ),
)
def count_hot_batch(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — device-resident staging
    rowmap: jax.Array,  # (R, P) int32 — phase-1 row map (device-resident)
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    b: jax.Array,  # () int32 — overflow batch index (TRACED: one compile)
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    n_batch: int = OVERFLOW_BATCH,
    cap: int = OVERFLOW_CAP,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
):
    """Device-side overflow recovery: per-pattern counts over FULL hot
    rows ``[b*n_batch, (b+1)*n_batch)`` of one chunk (hot rows in row
    order, same ``hot & full`` criterion as :func:`filter_verify_chunk`).

    When a chunk's hot count exceeds its fused ``max_hot`` bucket, the
    orchestrator re-verifies ALL its full hot rows by dispatching
    ``ceil(min(n_hot, cap)/n_batch)`` of these (batch index is a traced
    scalar — one compile serves any batch) and summing — the staging rows
    AND the row map stay device-resident, replacing round 2's recovery,
    which fetched the (R, P) row map and re-staged every hot row from the
    host (~120 ms of a 202 ms scan at 256 MB with one match per MB,
    bench/fp1_probe.py). Rows past the true hot count gather zero-fill
    and are masked by the window bound.
    """
    assert n_batch % FOLD == 0 and n_batch > 0
    assert cap % n_batch == 0
    r_rows = corpus_rows.shape[0]
    hot = jnp.sum(rowmap, axis=1) > 0  # (R,)
    row_start = (
        start.astype(jnp.int32)
        + jnp.arange(r_rows, dtype=jnp.int32) * wf
    )
    use = jnp.logical_and(hot, row_start + wf <= bound)
    n_hot = jnp.sum(use.astype(jnp.int32))
    idx_all = jnp.nonzero(use, size=cap, fill_value=r_rows)[0].astype(
        jnp.int32
    )
    idx = jax.lax.dynamic_slice(idx_all, (b * n_batch,), (n_batch,))
    stage = jnp.take(corpus_rows, idx, axis=0, mode="fill", fill_value=0)
    vbound = jnp.clip(n_hot - b * n_batch, 0, n_batch) * wf
    return scan_folded_pallas_unrolled(
        stage, pat, vbound, jnp.int32(0),
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )


# Hot rows verified per gather batch in Scanner.find's device position
# path. Larger than MAX_HOT (find is explicitly a position sweep, often
# dense) but bounded so the per-batch bit-packed verdict fetch stays small
# (n_batch * P * wf / 8 bytes — 512 KB/pattern at wf 8192).
FIND_BATCH = 512

# Per-ROW device position cap. Every verdict-mask row gets its first
# POS_CAP hit positions extracted on device (lax.top_k) so the host
# fetches a few KB of positions instead of multi-MB packed masks — on the
# tunneled link the mask FETCH, not the kernel, was the dense-adversarial
# cliff (66 MB/s at m=9/k=2 with every staging row hot but only ~3
# hits/row, VERDICT r3 weak #6). A row holding more hits than the cap is
# incomplete; its batch falls back to the packed mask (computed under a
# lax.cond only in that case), so the contract stays exact for every
# density. Measured on v5e over a 134M-element mask: top_k(32) 73 ms vs
# 1.3 s for nonzero's cumsum lowering, 204 ms for an iterative
# min-extract, 1.7 s for the unconditional bit-pack this replaces.
POS_CAP = 32


def _row_topk_positions(mask: jax.Array, p_real: int, wf: int, c: int):
    """Per-row ``top_k`` compaction of a ``(R, P, wf)`` verdict mask.

    Returns ``(pos, cnt)``: for each mask row, the first ``c`` hit
    positions as ascending flat indices into ``(p_real, wf)`` (-1
    padding), and the exact per-row hit count (a row with ``cnt > c`` is
    incomplete — the caller must fall back to the packed mask for its
    batch). Per pattern the decoded positions ascend within a row and
    across ascending rows — the segment-ascending contract of the mask
    path.
    """
    r = mask.shape[0]
    flat = (mask[:, :p_real, :wf] != 0).reshape(r, -1)
    L = flat.shape[1]
    cc = min(c, L)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, L), 1)
    keys = jnp.where(flat, L - iota, 0)  # descending keys = ascending iota
    v, _ = jax.lax.top_k(keys, cc)
    pos = jnp.where(v > 0, L - v, -1).astype(jnp.int32)
    if cc < c:
        pos = jnp.pad(pos, ((0, 0), (0, c - cc)), constant_values=-1)
    cnt = jnp.sum(flat.astype(jnp.int32), axis=1)
    return pos, cnt


def _bits_if(over: jax.Array, mask: jax.Array, p_real: int) -> jax.Array:
    """Bit-pack ``mask`` only when ``over`` is true at runtime (some row
    exceeded POS_CAP); zeros otherwise. The pack is expensive enough on
    v5e (~13 ns/element: relayout-bound) that paying it on every chunk
    erased the position-compaction win."""
    r, _, wf = mask.shape
    return jax.lax.cond(
        over,
        lambda m: _pack_mask_bits(m, p_real),
        lambda m: jnp.zeros((r, p_real, wf // 32), jnp.uint32),
        mask,
    )


def _pack_mask_bits(mask: jax.Array, p_real: int) -> jax.Array:
    """Bit-pack a ``(R, P, wf) int8`` verdict mask to ``(R, p_real,
    wf // 32) uint32`` — window ``j'`` of row ``r`` is bit ``j' % 32``
    (little-endian) of word ``j' // 32``. The device→host fetch is the
    position path's bottleneck on tunneled links (measured 6+ s for a
    33 MB int8 mask); 1 bit/window plus dropping the pattern-table
    padding rows shrinks it 32x-plus."""
    r, _, wf = mask.shape
    bits = mask[:, :p_real, :].reshape(r, p_real, wf // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    return jnp.sum(bits.astype(jnp.uint32) * weights, axis=-1, dtype=jnp.uint32)


def unpack_mask_bits(packed: "np.ndarray", pi: int, n_rows: int):
    """Host-side inverse of :func:`_pack_mask_bits` for one pattern:
    ``(n_rows, wf) uint8`` 0/1 verdicts."""
    import numpy as np

    sub = np.ascontiguousarray(packed[:n_rows, pi, :])
    return np.unpackbits(
        sub.view(np.uint8), bitorder="little"
    ).reshape(n_rows, sub.shape[1] * 32)


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "p_real", "dp_dtype", "alphabet", "dp_impl",
        "interpret", "pos_cap",
    ),
)
def gather_mask_rows(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — device-resident staging
    idx: jax.Array,  # (n_batch,) int32 — hot row indices (>= R = padding)
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    n_real: jax.Array,  # () int32 — true hot rows in this batch
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    p_real: int,  # real pattern rows (table rows beyond are padding)
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
    pos_cap: int = POS_CAP,
):
    """Gather hot rows out of the device staging and return ``(posmeta,
    bits)``: the per-row device-compacted hit positions ``[cnt (n_batch)
    | pos (n_batch * pos_cap)]`` (see :func:`_row_topk_positions`) and
    the bit-packed per-window verdict mask ``(n_batch, p_real, wf//32)
    uint32`` — which is COMPUTED (and may be fetched) only when some
    row's ``cnt`` exceeds ``pos_cap``; zeros otherwise.

    The gather stays on device (the staging is already resident), the
    banded kernel re-runs only the gathered rows, and the caller maps
    mask coordinates back to global window starts via its own ``idx`` —
    this is :meth:`Scanner.find`'s phase 2 overflow path, all positions
    resolved at device speed instead of a host-side oracle re-scan.
    """
    stage = jnp.take(corpus_rows, idx, axis=0, mode="fill", fill_value=0)
    vbound = n_real.astype(jnp.int32) * wf
    from .pallas_kernel import scan_folded_pallas_mask

    _, mask = scan_folded_pallas_mask(
        stage, pat, vbound, jnp.int32(0),
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )
    pos, cnt = _row_topk_positions(mask, p_real, wf, pos_cap)
    posmeta = jnp.concatenate([cnt, pos.reshape(-1)])
    return posmeta, _bits_if(jnp.any(cnt > pos_cap), mask, p_real)


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "p_real", "n_batch",
        "dp_dtype", "alphabet", "dp_impl", "interpret", "pos_cap",
    ),
)
def find_positions_chunk(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat_raw: jax.Array,  # (P, m_max) uint8 — raw pattern table
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,
    p_real: int,
    n_batch: int = FIND_BATCH,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
    pos_cap: int = POS_CAP,
):
    """One-call position extraction for one staged chunk (``Scanner.find``).

    Phase 1 (pigeonhole filtration), hot-row compaction, and the verdict-
    mask re-verification all run in ONE device program, mirroring
    :func:`filter_verify_chunk`'s latency discipline: the host fetches a
    single small ``meta`` int32 vector — layout ``[fcnt (P) | n_hot (1) |
    idx (n_batch) | cnt (n_batch) | clip_starts (MAX_CLIP)]`` — then the
    per-row device-compacted hit positions ``pos (n_batch, pos_cap)``
    when every row's ``cnt`` fits ``pos_cap`` (the common case: KBs
    instead of MBs over the link), else the bit-packed verdicts
    ``(n_batch, p_real, wf//32) uint32`` (computed only in that case).
    Zero-candidate chunks cost one fetch; sparse and dense matches alike
    resolve positions at device speed. ``rowmap`` stays on device and is
    fetched only when ``n_hot > n_batch`` (overflow → further
    :func:`gather_mask_rows` batches over the remaining hot rows).
    """
    assert n_batch % FOLD == 0 and n_batch > 0
    fcnt, rowmap = scan_filter_pallas(
        corpus_rows, pat_raw, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
        interpret=interpret,
    )
    return _positions_tail(
        corpus_rows, fcnt, rowmap, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, p_real=p_real,
        n_batch=n_batch, dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret, pos_cap=pos_cap,
    )


def _positions_tail(
    corpus_rows, fcnt, rowmap, pat, bound, start, *, k, m_max, wf, halo,
    plens, p_real, n_batch, dp_dtype, alphabet, dp_impl, interpret,
    pos_cap,
):
    """Shared position-extraction tail: compact hot rows out of the
    device-resident staging, re-run the verdict-mask banded kernel over
    them, and pack the host-facing ``(meta, bits, rowmap)`` triple (see
    :func:`find_positions_chunk` for the layout)."""
    from .pallas_kernel import scan_folded_pallas_mask

    r_rows = corpus_rows.shape[0]
    hot = jnp.sum(rowmap, axis=1) > 0  # (R,)
    row_start = (
        start.astype(jnp.int32)
        + jnp.arange(r_rows, dtype=jnp.int32) * wf
    )
    full = row_start + wf <= bound
    use = jnp.logical_and(hot, full)
    n_hot = jnp.sum(use.astype(jnp.int32))

    idx = jnp.nonzero(use, size=n_batch, fill_value=r_rows)[0].astype(
        jnp.int32
    )
    stage = jnp.take(corpus_rows, idx, axis=0, mode="fill", fill_value=0)
    vbound = jnp.minimum(n_hot, n_batch) * wf
    _, mask = scan_folded_pallas_mask(
        stage, pat, vbound, jnp.int32(0),
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
        dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
    )

    clip = jnp.logical_and(hot, jnp.logical_not(full))
    clip_idx = jnp.nonzero(clip, size=MAX_CLIP, fill_value=-1)[0]
    clip_starts = jnp.where(
        clip_idx >= 0, start + clip_idx.astype(jnp.int32) * wf, -1
    )
    pos, cnt = _row_topk_positions(mask, p_real, wf, pos_cap)
    meta = jnp.concatenate(
        [fcnt.astype(jnp.int32), n_hot.reshape(1), idx, cnt, clip_starts]
    )
    bits = _bits_if(jnp.any(cnt > pos_cap), mask, p_real)
    return meta, pos, bits, rowmap


# HBM budget for the dense sweep's per-group mask transient. The mask
# kernel materializes its verdict output as (G, P, wf) int32 in HBM (the
# int8 narrowing happens after the pallas_call), so the group row count is
# derived from THIS budget at the actual (P, wf) — a fixed row count would
# overshoot 4x on wide pattern tables.
SWEEP_MASK_BYTES = 64 << 20


@_dp_mode_shim
@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "m_max", "wf", "halo", "plens", "p_real", "n_batch",
        "dp_dtype", "alphabet", "dp_impl", "interpret", "pos_cap",
    ),
)
def sweep_positions_chunk(
    corpus_rows: jax.Array,  # (R, wf + halo) uint8 — folded corpus rows
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    bound: jax.Array,  # () int32 — global window bound (exclusive)
    start: jax.Array,  # () int32 — global window index of row 0
    *,
    k: int,
    m_max: int,
    wf: int,
    halo: int,
    plens: tuple,  # static lengths; 0 = pattern not swept here
    p_real: int,
    n_batch: int = FIND_BATCH,
    dp_dtype: str = "int32",
    alphabet: tuple = (),  # static distinct pattern bytes (Myers DP key)
    dp_impl: str = "auto",
    interpret: bool = False,
    pos_cap: int = POS_CAP,
):
    """:func:`find_positions_chunk` for filtration-INELIGIBLE patterns.

    Short patterns and high-k sets have no selective pigeonhole pieces, so
    there is no phase 1 — instead the banded verdict-mask kernel sweeps
    every staged row (``lax.map`` over row groups sized from
    :data:`SWEEP_MASK_BYTES` keeps the int32 mask transient bounded),
    reducing each group's mask to per-row hit counts. That synthesized row
    map then feeds the same compaction / re-verification /
    position-compaction tail as the filtration path (the sparse regime's
    contract), PLUS — because every group's exact verdict mask already
    exists inside the sweep — a per-ROW device compaction ``gpos
    (R, pos_cap) int32`` of full-row hit positions, with the per-row
    full-hit counts ``gcnt (R)`` appended to ``meta``. In the dense
    regime (``n_hot > n_batch``) the host fetches ``gpos`` ONCE and
    decodes every position straight out of the sweep — no
    re-verification batches, no multi-round-trip gathers (the r3
    dense-adversarial cliff: 66 MB/s at m=9/k=2 was fetch- and
    batch-bound, VERDICT r3 weak #6); only rows whose hits exceed
    ``pos_cap`` fall back to :func:`gather_mask_rows`.

    Returns ``(meta, pos, gpos, bits, rowmap)`` where ``meta`` is the
    tail layout with ``gcnt (R)`` appended:
    ``[fcnt (P) | n_hot | idx (n_batch) | cnt (n_batch) | clip_starts
    (MAX_CLIP) | gcnt (R)]``.
    """
    from .pallas_kernel import _DTYPE_FOLD, scan_folded_pallas_mask

    assert n_batch % FOLD == 0 and n_batch > 0
    r_rows = corpus_rows.shape[0]
    fold = _DTYPE_FOLD[dp_dtype]
    p_pad = pat.shape[0]
    g_cap = max(fold, SWEEP_MASK_BYTES // max(p_pad * wf * 4, 1))
    # Largest group <= g_cap that tiles the chunk exactly (a fold-multiple
    # always divides: the caller stages fold-multiple rows).
    g = next(
        d
        for d in range(min(g_cap, r_rows), 0, -1)
        if r_rows % d == 0 and d % fold == 0
    )
    n_groups = r_rows // g

    def one_group(g0):
        stage = jax.lax.dynamic_slice_in_dim(corpus_rows, g0 * g, g, axis=0)
        _, mask = scan_folded_pallas_mask(
            stage, pat,
            bound - start - g0 * (g * wf),  # group-local window bound
            jnp.int32(0),
            k=k, m_max=m_max, wf=wf, halo=halo, plens=plens,
            dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret,
        )
        rowcnt = jnp.sum(mask.astype(jnp.int32), axis=2)  # (g, P)
        # Per-row position compaction over FULL rows only (clipped rows
        # resolve host-side, same split as _positions_tail).
        ridx = g0 * g + jnp.arange(g, dtype=jnp.int32)
        full = (start + (ridx + 1) * wf) <= bound
        pos_g, cnt_g = _row_topk_positions(
            jnp.where(full[:, None, None], mask, 0), p_real, wf, pos_cap
        )
        return rowcnt, cnt_g, pos_g

    grp, gcnt, gpos = jax.lax.map(
        one_group, jnp.arange(n_groups, dtype=jnp.int32)
    )
    gcnt = gcnt.reshape(r_rows)
    gpos = gpos.reshape(r_rows, -1)
    rowmap = grp.reshape(r_rows, -1)
    fcnt = jnp.sum(rowmap, axis=0)
    meta, pos, bits, rowmap = _positions_tail(
        corpus_rows, fcnt, rowmap, pat, bound, start,
        k=k, m_max=m_max, wf=wf, halo=halo, plens=plens, p_real=p_real,
        n_batch=n_batch, dp_dtype=dp_dtype, alphabet=alphabet, dp_impl=dp_impl,
        interpret=interpret, pos_cap=pos_cap,
    )
    meta = jnp.concatenate([meta, gcnt.astype(jnp.int32)])
    return meta, pos, gpos, bits, rowmap


def unpack_chunk(packed, p: int):
    """Split a fetched ``packed`` vector back into its four parts."""
    import numpy as np

    packed = np.asarray(packed)
    return (
        packed[:p],
        packed[p : 2 * p],
        int(packed[2 * p]),
        packed[2 * p + 1 : 2 * p + 1 + MAX_CLIP],
    )
