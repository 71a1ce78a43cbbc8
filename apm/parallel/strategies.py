"""Multi-device distribution strategies (GSPMD / shard_map).

TPU-native re-design of the reference's two MPI strategies. Where the
reference mails bytes between ranks (``MPI_Bcast``/``Send``/``Recv``,
``src/patterns_over_ranks.c:139-207``, ``src/database_over_ranks.c:119-195``),
here shards are *placed* on devices via ``jax.sharding.NamedSharding`` and the
only runtime communication is one ``psum``/gather of the tiny per-pattern
count vector over ICI.

* ``database_over_devices`` — the analog of strategy B
  (``src/database_over_ranks.c``): the corpus window axis is sharded across
  the ``data`` mesh axis; each device's shard carries a host-materialized
  halo of ``round_up(m_max, 128)`` extra bytes (the moral equivalent of the
  ``(m-1)``-byte halo at ``database_over_ranks.c:339-343``); per-pattern
  counts are combined with ``jax.lax.psum``. Unlike the reference — which
  double-counts windows in the halo seam (Report §4.3) — every window start
  is owned by exactly one shard.
* ``patterns_over_devices`` — the analog of strategy A
  (``src/patterns_over_ranks.c``): the pattern axis is sharded, the corpus is
  replicated (the Bcast analog, done once by placement); no reduction needed,
  counts are gathered by the output sharding.

Both strategies compile to a single ``jit`` program; there is no master rank,
no poison pill, no tag demuxing — the cost model that chose between MPI
strategies largely dissolves (see apm.parallel.plan for what remains).
"""

from __future__ import annotations

import functools
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.common import round_up

if TYPE_CHECKING:  # pragma: no cover
    from ..models.scanner import Scanner


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _engine_counts(corpus, pat, plen, n, start, *, backend, k, m_max, w, halo, interpret):
    """Per-device compute body shared by both strategies."""
    if backend == "pallas":
        from ..ops.pallas_kernel import scan_corpus_pallas

        return scan_corpus_pallas(
            corpus, pat, plen, n, start,
            k=k, m_max=m_max, w=w, halo=halo, interpret=interpret,
        )
    from ..ops.xla_engine import scan_corpus_xla

    return scan_corpus_xla(corpus, pat, plen, n, start, k=k, m_max=m_max, v=w)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "backend", "k", "m_max", "w", "halo", "interpret"),
)
def _database_sharded(shards, starts, pat, plen, n, *, mesh, backend, k, m_max, w, halo, interpret):
    def body(shard, start, pat, plen, n):
        counts = _engine_counts(
            shard[0], pat, plen, n, start[0],
            backend=backend, k=k, m_max=m_max, w=w, halo=halo, interpret=interpret,
        )
        return jax.lax.psum(counts, "data")

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data", None), P("data"), P(None, None), P(None), P()),
        out_specs=P(None),
        check_vma=False,
    )(shards, starts, pat, plen, n)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "backend", "k", "m_max", "w", "halo", "interpret"),
)
def _patterns_sharded(corpus, pat, plen, n, *, mesh, backend, k, m_max, w, halo, interpret):
    def body(corpus, pat, plen, n):
        return _engine_counts(
            corpus, pat, plen, n, jnp.int32(0),
            backend=backend, k=k, m_max=m_max, w=w, halo=halo, interpret=interpret,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None), P("pat", None), P("pat"), P()),
        out_specs=P("pat"),
        check_vma=False,
    )(corpus, pat, plen, n)


def count_database_over_devices(scanner: "Scanner", buf: np.ndarray, n_dev: int) -> np.ndarray:
    """Shard the window axis over ``n_dev`` devices with host-side halos."""
    k, m_max = scanner.k, scanner.m_max
    backend = scanner._resolve_backend()
    w = scanner.config.block_windows
    halo = round_up(m_max, 128) if backend == "pallas" else m_max
    n = len(buf)
    nw = max(n - k, 0)

    # Per-shard window count: multiple of the block width, >= w.
    s = max(round_up(_cdiv(max(nw, 1), n_dev), w), w)
    shards = np.zeros((n_dev, s + halo), dtype=np.uint8)
    for d in range(n_dev):
        lo = d * s
        hi = min(lo + s + halo, n)
        if lo < n:
            shards[d, : hi - lo] = buf[lo:hi]
    starts = (np.arange(n_dev, dtype=np.int32) * s)

    devices = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("data",))
    sh = jax.device_put(shards, NamedSharding(mesh, P("data", None)))
    st = jax.device_put(starts, NamedSharding(mesh, P("data")))
    rep = NamedSharding(mesh, P())
    counts = _database_sharded(
        sh,
        st,
        jax.device_put(scanner._pat, NamedSharding(mesh, P(None, None))),
        jax.device_put(scanner._plen, NamedSharding(mesh, P(None))),
        jax.device_put(np.int32(n), rep),
        mesh=mesh,
        backend=backend,
        k=k,
        m_max=m_max,
        w=w,
        halo=halo,
        interpret=scanner.config.interpret,
    )
    return np.asarray(counts)


def count_patterns_over_devices(scanner: "Scanner", buf: np.ndarray, n_dev: int) -> np.ndarray:
    """Shard the pattern axis over ``n_dev`` devices; corpus replicated."""
    from ..ops.common import pad_corpus

    k, m_max = scanner.k, scanner.m_max
    backend = scanner._resolve_backend()
    w = scanner.config.block_windows
    halo = round_up(m_max, 128) if backend == "pallas" else m_max
    n = len(buf)

    # Pad the pattern axis so it splits evenly into sublane-aligned shards.
    p_pad = scanner._pat.shape[0]
    p_shard = round_up(p_pad, 8 * n_dev)
    pat = np.zeros((p_shard, scanner._pat.shape[1]), dtype=np.uint8)
    pat[:p_pad] = scanner._pat
    plen = np.zeros((p_shard,), dtype=np.int32)
    plen[:p_pad] = scanner._plen

    n_pad = max(round_up(max(n - k, 0), w), w)
    corpus = pad_corpus(buf, n_pad, halo)

    devices = np.asarray(jax.devices()[:n_dev])
    mesh = Mesh(devices, ("pat",))
    counts = _patterns_sharded(
        jax.device_put(corpus, NamedSharding(mesh, P(None))),
        jax.device_put(pat, NamedSharding(mesh, P("pat", None))),
        jax.device_put(plen, NamedSharding(mesh, P("pat"))),
        jax.device_put(np.int32(n), NamedSharding(mesh, P())),
        mesh=mesh,
        backend=backend,
        k=k,
        m_max=m_max,
        w=w,
        halo=halo,
        interpret=scanner.config.interpret,
    )
    return np.asarray(counts)


def count_distributed(scanner: "Scanner", buf: np.ndarray, strategy: str, n_dev: int) -> np.ndarray:
    if strategy == "database_over_devices":
        return count_database_over_devices(scanner, buf, n_dev)
    if strategy == "patterns_over_devices":
        return count_patterns_over_devices(scanner, buf, n_dev)
    raise ValueError(f"unknown distribution strategy {strategy!r}")
