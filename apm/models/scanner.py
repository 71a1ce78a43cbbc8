"""End-to-end scan pipeline: the framework's "model".

Where the reference wires CLI -> cost model -> MPI strategy -> OMP -> kernel
(src/main.c:30-156), here one Scanner owns: pattern packing, corpus padding,
backend selection (Pallas kernel vs portable XLA), chunking, and — when more
than one device is visible — the GSPMD distribution plan (apm.parallel).
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Union

import jax
import numpy as np

from ..ops.common import cap_for, pad_corpus, round_up
from ..utils.config import ApmConfig
from ..utils.io import PatternSet
from ..utils.oracle import Bytes, as_u8


class Scanner:
    """Counts, for each pattern, the windows within edit distance <= k.

    Usage::

        sc = Scanner(["GATTACA", "CCCTTT"], k=2)
        counts = sc.count(corpus_bytes)   # np.ndarray (P,) int64
    """

    def __init__(
        self,
        patterns: Sequence[Bytes],
        k: int,
        config: Optional[ApmConfig] = None,
    ):
        if k < 0:
            raise ValueError("approx factor k must be >= 0")
        self.k = int(k)
        self.config = (config or ApmConfig()).validate()
        self.patterns = PatternSet.from_patterns(patterns)
        self.m_max = self.patterns.max_len
        pat_packed, plen = self.patterns.packed(self.k)
        # Pad the pattern axis to a sublane multiple; padding rows have
        # length 0 and can never match (their captured distance stays at cap).
        p_pad = max(8, round_up(self.patterns.num_patterns, 8))
        self._pat = np.zeros((p_pad, pat_packed.shape[1]), dtype=np.uint8)
        self._pat[: pat_packed.shape[0]] = pat_packed
        self._plen = np.zeros((p_pad,), dtype=np.int32)
        self._plen[: plen.shape[0]] = plen
        self.last_duration: Optional[float] = None

    # -- backend selection ---------------------------------------------------

    def _resolve_backend(self) -> str:
        b = self.config.backend
        if b != "auto":
            return b
        platform = jax.devices()[0].platform
        return "pallas" if platform == "tpu" else "xla"

    # -- single-device scan ---------------------------------------------------

    def _count_single(self, buf: np.ndarray) -> np.ndarray:
        n = len(buf)
        backend = self._resolve_backend()
        w = self.config.block_windows
        halo = round_up(self.m_max, 128)
        if backend == "pallas":
            from ..ops.pallas_kernel import scan_corpus_pallas

            n_pad = max(round_up(max(n - self.k, 0), w), w)
            corpus = pad_corpus(buf, n_pad, halo)
            counts = scan_corpus_pallas(
                jax.numpy.asarray(corpus),
                jax.numpy.asarray(self._pat),
                jax.numpy.asarray(self._plen),
                jax.numpy.asarray(n, dtype=np.int32),
                jax.numpy.asarray(0, dtype=np.int32),
                k=self.k,
                m_max=self.m_max,
                w=w,
                halo=halo,
                interpret=self.config.interpret,
            )
        else:
            from ..ops.xla_engine import scan_corpus_xla

            v = w
            n_pad = max(round_up(max(n - self.k, 0), v), v)
            corpus = pad_corpus(buf, n_pad, self.m_max)
            counts = scan_corpus_xla(
                jax.numpy.asarray(corpus),
                jax.numpy.asarray(self._pat),
                jax.numpy.asarray(self._plen),
                jax.numpy.asarray(n, dtype=np.int32),
                k=self.k,
                m_max=self.m_max,
                v=v,
            )
        return np.asarray(counts)

    # -- public API ------------------------------------------------------------

    def count(self, corpus: Bytes) -> np.ndarray:
        """Per-pattern match counts (int64, length = number of patterns)."""
        buf = as_u8(corpus)
        n = len(buf)
        p = self.patterns.num_patterns
        t0 = time.perf_counter()
        if n - self.k <= 0:
            self.last_duration = time.perf_counter() - t0
            return np.zeros((p,), dtype=np.int64)

        strategy = self.config.strategy
        n_dev = len(jax.devices())
        if self.config.max_devices is not None:
            n_dev = min(n_dev, self.config.max_devices)
        if strategy == "auto":
            from ..parallel.plan import choose_strategy

            strategy = choose_strategy(
                n, self.m_max, self.patterns.num_patterns, self.k, n_dev
            )

        if strategy == "single" or n_dev == 1:
            counts = self._count_single(buf)
        else:
            from ..parallel.strategies import count_distributed

            counts = count_distributed(self, buf, strategy, n_dev)
        self.last_duration = time.perf_counter() - t0
        return counts[:p].astype(np.int64)


def scan_counts(
    corpus: Bytes,
    patterns: Sequence[Bytes],
    k: int,
    config: Optional[ApmConfig] = None,
) -> List[int]:
    """One-shot functional API mirroring the reference CLI semantics."""
    return [int(c) for c in Scanner(patterns, k, config).count(corpus)]
