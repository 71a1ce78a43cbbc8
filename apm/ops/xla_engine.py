"""Portable XLA scan engine (pure jnp, no Pallas).

Implements the clamped banded Levenshtein scan as a ``lax.fori_loop`` over DP
steps with the whole ``(patterns, windows)`` batch advanced in lockstep as
vector ops. Serves three roles:

* the CPU / any-backend fallback (the reference's CPU path analog,
  ``src/utils.c:76-99`` + the OpenMP window loops);
* a second, independently-implemented conformance oracle for the Pallas
  kernel;
* the per-device compute body for the sharded (shard_map) engines.

Semantics (identical to apm.utils.oracle, i.e. to sequential.c):
window starts ``j in [0, n-k)``; per-window truncated length
``size = min(m, n-j)``; match iff clamped banded distance <= k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .common import cap_for


@functools.partial(jax.jit, static_argnames=("k", "m_max"))
def scan_block_xla(
    text: jax.Array,  # (V + m_max,) uint8 — V windows + halo bytes (zero-padded)
    pat: jax.Array,  # (P, m_max + 2k) uint8 — k-padded pattern table
    plen: jax.Array,  # (P,) int32 pattern lengths (0 = padding row)
    start: jax.Array,  # () int32 — absolute window index of text[0]
    n: jax.Array,  # () int32 — total corpus bytes
    *,
    k: int,
    m_max: int,
) -> jax.Array:
    """Per-pattern match counts over the V window starts of this block."""
    v = text.shape[0] - m_max
    p = pat.shape[0]
    cap = jnp.int32(cap_for(k))
    bw = 2 * k + 1

    w = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)  # (1, V) window offsets
    abs_w = start.astype(jnp.int32) + w  # (1, V) absolute window starts
    sizes = jnp.minimum(plen.astype(jnp.int32)[:, None], n.astype(jnp.int32) - abs_w)  # (P, V)
    n_windows = jnp.maximum(n.astype(jnp.int32) - k, 0)
    valid = abs_w < n_windows  # (1, V)

    # band[k+d] = D[x][x+d] clamped at cap; row x=0 init: D[0][y] = y.
    init_rows = [
        jnp.full((p, v), jnp.int32(d) if d >= 0 else cap, dtype=jnp.int32)
        for d in range(-k, k + 1)
    ]
    band0 = jnp.stack(init_rows)  # (2k+1, P, V)
    res0 = jnp.full((p, v), cap, dtype=jnp.int32)

    def step(x, carry):
        band, res = carry
        tx = jax.lax.dynamic_slice(text, (x - 1,), (v,))[None, :]  # (1, V)
        # pattern chars for band offsets d=-k..k: padded column x-1 .. x-1+2k
        px = jax.lax.dynamic_slice(pat, (0, x - 1), (p, bw))  # (P, 2k+1)
        new_rows = []
        prev = jnp.full((p, v), cap, dtype=jnp.int32)  # insertion chain B_x[d-1]
        for di in range(bw):
            d = di - k
            c = (px[:, di : di + 1] != tx).astype(jnp.int32)  # (P, V)
            sub = band[di] + c
            dele = (band[di + 1] if d < k else jnp.full((p, v), cap, jnp.int32)) + 1
            val = jnp.minimum(jnp.minimum(sub, dele), prev + 1)
            # boundary column D[x][0] = x (cell y = x + d == 0, x <= k)
            val = jnp.where(x + d == 0, x.astype(jnp.int32), val)
            val = jnp.minimum(val, cap)
            new_rows.append(val)
            prev = val
        band = jnp.stack(new_rows)
        res = jnp.where(sizes == x, band[k], res)  # capture D[size][size]
        return band, res

    _, res = jax.lax.fori_loop(1, m_max + 1, step, (band0, res0))
    matches = jnp.logical_and(res <= k, valid)
    return jnp.sum(matches, axis=1, dtype=jnp.int32)  # (P,)


@functools.partial(jax.jit, static_argnames=("k", "m_max", "v"))
def scan_corpus_xla(
    corpus: jax.Array,  # (n_pad + m_max,) uint8 zero-padded corpus
    pat: jax.Array,  # (P, m_max + 2k) uint8
    plen: jax.Array,  # (P,) int32
    n: jax.Array,  # () int32 true corpus length
    start: jax.Array = 0,  # () int32 global window index of corpus[0]
    *,
    k: int,
    m_max: int,
    v: int,
) -> jax.Array:
    """Whole-corpus scan: fori over chunks of ``v`` windows on-device."""
    n_pad = corpus.shape[0] - m_max
    assert n_pad % v == 0, "corpus must be padded to a multiple of the chunk width"
    num_chunks = n_pad // v
    p = pat.shape[0]
    start = jnp.asarray(start, jnp.int32)

    def body(i, acc):
        blk = jax.lax.dynamic_slice(corpus, (i * v,), (v + m_max,))
        return acc + scan_block_xla(blk, pat, plen, start + (i * v).astype(jnp.int32), n, k=k, m_max=m_max)

    return jax.lax.fori_loop(0, num_chunks, body, jnp.zeros((p,), jnp.int32))
