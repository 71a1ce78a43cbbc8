"""Pallas TPU kernel: banded Levenshtein sliding-window scan with fused counting.

This is the hot path of the framework — the TPU-native re-design of the
reference's two compute kernels (CPU single-column square DP,
``src/utils.c:76-99``, and the CUDA grid-stride window kernel,
``src/patterns_over_ranks.cu:19-73``). Instead of one DP matrix per window per
thread, the whole ``(P patterns, W windows)`` batch advances its DP wavefront
in lockstep as VPU vector ops on ``(P, W)`` int32 tiles held in VMEM:

* the corpus stays in HBM as raw uint8; each grid step DMAs one
  ``W + halo``-byte text block into a double-buffered VMEM scratch slot so the
  next block's DMA overlaps this block's compute;
* the DP band ``B[d] = D[x][x+d]`` for ``d in [-k, k]`` is clamped at
  ``cap = k + 1`` (clamping commutes with the min-plus recurrence, so the
  ``dist <= k`` verdict is exact — see ``apm.ops.common.cap_for``);
* the text window for DP step ``x`` is obtained by rolling the block left one
  lane per step (a cheap lane rotation) instead of a dynamic lane slice;
* per-pattern hit counts are reduced in-kernel (``sum over the W lane axis``)
  and accumulated across grid steps into a single ``(P, 1)`` VMEM tile — no
  per-window output ever touches HBM.

Semantics match ``sequential.c`` exactly (window bound ``n - k``, EOF prefix
truncation via ``size = min(m, n - j)`` captured at DP step ``x == size``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import cap_for


def _scan_kernel(
    meta_ref,  # SMEM (1, 2) int32 — [true corpus byte count, global start]
    corpus_ref,  # ANY/HBM (1, n_pad + halo) int32 (widened bytes)
    pband_ref,  # VMEM (m_max, P, 2k+1) int32 — per-step pattern band chars
    plen_ref,  # VMEM (P, 1) int32 — pattern lengths (0 = padding row)
    out_ref,  # VMEM (P, 1) int32 — per-pattern match counts (accumulated)
    tbuf,  # VMEM scratch (2, 1, W + halo) int32 — double-buffered text
    sem,  # DMA semaphores (2,)
    *,
    k: int,
    m_max: int,
    w: int,
):
    i = pl.program_id(0)
    nblk = pl.num_programs(0)
    wp = tbuf.shape[2]  # W + halo
    p = out_ref.shape[0]
    bw = 2 * k + 1
    cap = jnp.int32(cap_for(k))

    def text_dma(slot, blk):
        return pltpu.make_async_copy(
            corpus_ref.at[:, pl.ds(blk * w, wp)],
            tbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        text_dma(0, 0).start()
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(i + 1 < nblk)
    def _():
        text_dma((i + 1) % 2, i + 1).start()

    text_dma(i % 2, i).wait()
    text0 = tbuf[i % 2]  # (1, wp) int32

    n_val = meta_ref[0, 0]
    start = meta_ref[0, 1]
    win = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + i * w + start
    valid = win < jnp.maximum(n_val - k, 0)  # (1, w)
    sizes = jnp.minimum(plen_ref[:], n_val - win)  # (P, w) truncated lengths

    band0 = tuple(
        jnp.full((p, w), jnp.int32(d) if d >= 0 else cap, dtype=jnp.int32)
        for d in range(-k, k + 1)
    )
    res0 = jnp.full((p, w), cap, dtype=jnp.int32)

    def step(x, carry):
        text, band, res = carry
        tx = text[:, :w]  # (1, w) int32 — window byte at DP step x
        px = pband_ref[x - 1]  # (P, bw) pattern chars for offsets d=-k..k
        new = []
        prev = jnp.full((p, w), cap, dtype=jnp.int32)  # insertion chain
        for di in range(bw):
            d = di - k
            c = (px[:, di : di + 1] != tx).astype(jnp.int32)  # (P, w)
            sub = band[di] + c
            dele = (band[di + 1] + 1) if d < k else cap
            val = jnp.minimum(jnp.minimum(sub, dele), prev + 1)
            # boundary column D[x][0] = x (cell y = x + d == 0, only x <= k)
            if d < 0:
                val = jnp.where(x + d == 0, x, val)
            val = jnp.minimum(val, cap)
            new.append(val)
            prev = val
        res = jnp.where(sizes == x, new[k], res)  # capture D[size][size]
        text = pltpu.roll(text, shift=text.shape[1] - 1, axis=1)
        return text, tuple(new), res

    _, _, res = jax.lax.fori_loop(
        1, m_max + 1, step, (text0, band0, res0), unroll=False
    )
    hits = jnp.logical_and(res <= k, valid)
    out_ref[:] += jnp.sum(hits.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("k", "m_max", "w", "halo", "interpret")
)
def scan_corpus_pallas(
    corpus: jax.Array,  # (n_pad + halo,) uint8, n_pad % w == 0, zero-padded
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    plen: jax.Array,  # (P,) int32
    n: jax.Array,  # () int32 — true corpus byte count
    start: jax.Array,  # () int32 — global window index of corpus[0] (sharding)
    *,
    k: int,
    m_max: int,
    w: int,
    halo: int,
    interpret: bool = False,
) -> jax.Array:
    """Per-pattern match counts over the whole corpus. Returns (P,) int32."""
    p = pat.shape[0]
    total = corpus.shape[0]
    n_pad = total - halo
    assert halo >= m_max, (halo, m_max)
    assert n_pad % w == 0 and n_pad > 0, (total, w, halo)
    nblk = n_pad // w
    bw = 2 * k + 1

    # Mosaic int8 sublane packing (4/sublane) forbids the leading-dim slices
    # this kernel needs (double-buffer slot, per-step pattern band row), and
    # lane rotation is 32-bit only — so text and pattern tiles live as int32
    # on device. The widening happens once under jit; the scan is compute-
    # bound (m_max DP steps per byte) so the 4x HBM traffic is immaterial.
    corpus2d = corpus.astype(jnp.int32).reshape(1, total)
    # Per-DP-step pattern band chars: pband[x-1] = pat[:, x-1 : x-1+bw].
    # Tiny ((m_max, P, bw) int32) — avoids dynamic lane slices in the kernel.
    pband = jnp.stack([pat[:, x : x + bw] for x in range(m_max)]).astype(
        jnp.int32
    )
    plen2d = plen.reshape(p, 1).astype(jnp.int32)
    meta = jnp.stack(
        [n.astype(jnp.int32).reshape(()), start.astype(jnp.int32).reshape(())]
    ).reshape(1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n
            pl.BlockSpec(memory_space=pl.ANY),  # corpus (stays in HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pband
            pl.BlockSpec(memory_space=pltpu.VMEM),  # plen
        ],
        out_specs=pl.BlockSpec(
            (p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, w + halo), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    counts = pl.pallas_call(
        functools.partial(_scan_kernel, k=k, m_max=m_max, w=w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=nblk * m_max * bw * p * w * 6,
            bytes_accessed=total + nblk * (w + halo),
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, corpus2d, pband, plen2d)
    return counts[:, 0]
