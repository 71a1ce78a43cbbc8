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

from ..ops.common import fold_corpus, pad_corpus, round_up
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

        # Deduplicate patterns: identical patterns share one scan and the
        # counts are expanded afterwards. (The reference scans each duplicate
        # separately — its own smoke test sends the same 50-char line five
        # times, README.md:54-91.)
        raw = list(self.patterns.raw)
        if self.config.dedup_patterns:
            uniq: List[bytes] = []
            index = {}
            inverse = []
            for r in raw:
                if r not in index:
                    index[r] = len(uniq)
                    uniq.append(r)
                inverse.append(index[r])
            self._inverse = np.asarray(inverse, dtype=np.int64)
        else:
            uniq = raw
            self._inverse = np.arange(len(raw), dtype=np.int64)
        self.scan_patterns = PatternSet.from_patterns(uniq)

        pat_packed, plen = self.scan_patterns.packed(self.k)
        # Pad the pattern axis to a sublane multiple; padding rows have
        # length 0 and generate no work in the kernel.
        p_pad = max(8, round_up(self.scan_patterns.num_patterns, 8))
        self._pat = np.zeros((p_pad, pat_packed.shape[1]), dtype=np.uint8)
        self._pat[: pat_packed.shape[0]] = pat_packed
        self._plen = np.zeros((p_pad,), dtype=np.int32)
        self._plen[: plen.shape[0]] = plen
        self._plens_static = tuple(int(x) for x in self._plen)
        # Raw (un-k-padded) table for the filtration kernel.
        self._pat_raw = np.zeros((p_pad, self.m_max), dtype=np.uint8)
        self._pat_raw[: self.scan_patterns.num_patterns] = (
            self.scan_patterns.table
        )
        self.last_duration: Optional[float] = None
        from ..utils.profiling import Meter

        self.meter = Meter()
        self.last_strategy: Optional[str] = None
        # Device-resident staged-corpus cache: (fingerprint, wf, halo,
        # chunk_win, c0) -> device array of folded rows.
        self._dev_cache: dict = {}

    @staticmethod
    def _fingerprint(buf: np.ndarray) -> tuple:
        """Cheap content fingerprint for the device-corpus cache.

        Samples the ends and a strided middle slice; a same-length in-place
        mutation that misses every sampled byte would go stale — callers
        mutating corpora in place should disable ``cache_corpus``.
        """
        n = len(buf)
        head = bytes(buf[:64].tobytes())
        tail = bytes(buf[-64:].tobytes()) if n >= 64 else b""
        mid = bytes(buf[:: max(1, n // 64)].tobytes())
        return (n, hash(head), hash(tail), hash(mid))

    # -- backend selection ---------------------------------------------------

    def _resolve_backend(self) -> str:
        b = self.config.backend
        if b != "auto":
            return b
        platform = jax.devices()[0].platform
        return "pallas" if platform == "tpu" else "xla"

    # -- single-device scan ---------------------------------------------------

    def device_window_bound(self, n: int) -> int:
        """Exclusive bound of device-owned window starts.

        The device scans untruncated windows ``j <= n - m_max``; the <=
        ``m_max - 1`` EOF-truncated windows (``sequential.c:131-134``) are
        counted host-side by :meth:`tail_counts` — they are too few to
        matter and removing them from the kernel removes a per-step
        ``(P, W)`` compare.
        """
        return max(0, min(n - self.m_max + 1, n - self.k))

    def tail_counts(self, buf: np.ndarray, dev_bound: int) -> np.ndarray:
        """Oracle counts for the EOF tail windows ``j in [dev_bound, n-k)``.

        Returned per *scan* (deduplicated) pattern.
        """
        n = len(buf)
        p = self.scan_patterns.num_patterns
        out = np.zeros((p,), dtype=np.int64)
        if dev_bound >= max(n - self.k, 0):
            return out
        suffix = buf[dev_bound:]
        nw = max(0, len(suffix) - self.k)
        try:
            from ..utils import native

            if native.available():
                for i, raw in enumerate(self.scan_patterns.raw):
                    out[i] = native.banded_count(
                        suffix,
                        np.frombuffer(raw, np.uint8),
                        self.k,
                        nw,
                        len(suffix),
                    )
                return out
        except Exception:
            pass
        from ..utils.oracle import count_matches

        out[:] = count_matches(suffix, list(self.scan_patterns.raw), self.k)
        return out

    def block_windows_for(self, n: int) -> int:
        """Kernel block width: explicit config or the planner's choice."""
        if self.config.block_windows is not None:
            return self.config.block_windows
        from ..parallel.plan import choose_block_windows

        return choose_block_windows(
            max(n - self.k, 0),
            self.m_max,
            self.scan_patterns.num_patterns,
            self.k,
        )

    _DEV_CACHE_MAX = 32  # staged chunks kept device-resident (LRU)

    def _staged_rows(self, buf, fp, c0, n_rows, wf, halo):
        """Device-resident folded staging rows for one chunk (LRU-cached)."""
        key = (fp, wf, halo, n_rows, c0)
        if fp is not None and key in self._dev_cache:
            self._dev_cache[key] = self._dev_cache.pop(key)  # mark recent
            return self._dev_cache[key]
        drows = jax.numpy.asarray(fold_corpus(buf, c0, n_rows, wf, halo))
        if fp is not None:
            self._dev_cache[key] = drows
            while len(self._dev_cache) > self._DEV_CACHE_MAX:
                self._dev_cache.pop(next(iter(self._dev_cache)))
        return drows

    def _count_pallas(self, buf: np.ndarray, n: int, w: int) -> np.ndarray:
        """Single-device Pallas scan: filtration + banded DP, chunked.

        Patterns are partitioned by :func:`apm.ops.filter_kernel.
        filter_eligible`: eligible ones run the pigeonhole phase-1 kernel
        (exact counts at k = 0; candidate counts + group map at k >= 1,
        verified against the oracle per 32-window group), the rest run the
        banded DP kernel. A density fallback reruns pattern sets whose
        candidate rate says filtration isn't paying for itself.

        The host-side chunk loop keeps every chunk the same compiled shape
        (the window bound masks the last chunk's padding), so one jit
        compilation serves arbitrarily large corpora — and accumulating
        counts per chunk host-side is checkpoint/resume for free
        (SURVEY.md §5).
        """
        from ..ops.filter_kernel import (
            FOLD as FILTER_FOLD,
            partition_plens,
            scan_filter_pallas,
        )
        from ..ops.pallas_kernel import (
            _DTYPE_FOLD,
            scan_folded_pallas_unrolled,
        )

        k = self.k
        fold = _DTYPE_FOLD[self.config.dp_dtype]
        w = round_up(w, max(fold, FILTER_FOLD) * 128)
        wf = w // fold
        halo = round_up(self.m_max + 2 * k, 128)
        dev_bound = self.device_window_bound(n)
        p_pad = self._pat.shape[0]
        counts = np.zeros((p_pad,), dtype=np.int64)
        if dev_bound <= 0:
            counts[: self.scan_patterns.num_patterns] += self.tail_counts(
                buf, dev_bound
            )
            return counts

        plens = self._plens_static
        engine = self.config.engine if fold == FILTER_FOLD else "dp"
        fmask, plens_filter, plens_dp = partition_plens(plens, k, engine)

        chunk_win = max(
            w, round_up(min(self.config.chunk_bytes, max(dev_bound, 1)), w)
        )
        n_rows = chunk_win // wf
        dpat = jax.numpy.asarray(self._pat)
        dpat_raw = jax.numpy.asarray(self._pat_raw)
        dbound = jax.numpy.asarray(dev_bound, dtype=np.int32)
        fp = self._fingerprint(buf) if self.config.cache_corpus else None

        filt_chunks = []  # (c0, gmap device array)
        filt_totals = np.zeros((p_pad,), dtype=np.int64)
        for c0 in range(0, dev_bound, chunk_win):
            drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
            dc0 = jax.numpy.asarray(c0, dtype=np.int32)
            if any(plens_dp):
                dev = scan_folded_pallas_unrolled(
                    drows, dpat, dbound, dc0,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plens_dp, dp_dtype=self.config.dp_dtype,
                    interpret=self.config.interpret,
                )
                counts += np.asarray(dev)
            if any(plens_filter):
                fcnt, rowmap = scan_filter_pallas(
                    drows, dpat_raw, dbound, dc0,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plens_filter, interpret=self.config.interpret,
                )
                fcnt = np.asarray(fcnt)
                if k == 0:
                    counts += fcnt  # exact: candidates ARE matches
                else:
                    filt_totals += fcnt
                    filt_chunks.append((c0, rowmap))

        if k > 0 and any(plens_filter):
            total_cand = int(filt_totals.sum())
            dense = False
            if total_cand > 0:
                # Verification cost scales with hot rows (wf windows each):
                # fetch the tiny row maps and decide on actual density.
                filt_chunks = [
                    (c0, np.asarray(rm)) for c0, rm in filt_chunks
                ]
                hot_rows = sum(
                    int(np.count_nonzero(rm.any(axis=1)))
                    for _, rm in filt_chunks
                )
                dense = hot_rows * wf > max(64 * wf, dev_bound // 20)
            if dense:
                # Candidates too dense for targeted verification: rerun
                # these patterns through the banded kernel (phase 1 cost
                # ~5% of a DP scan, so the fallback is cheap insurance).
                for c0 in range(0, dev_bound, chunk_win):
                    drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
                    dev = scan_folded_pallas_unrolled(
                        drows, dpat, dbound,
                        jax.numpy.asarray(c0, dtype=np.int32),
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plens_filter, dp_dtype=self.config.dp_dtype,
                        interpret=self.config.interpret,
                    )
                    counts += np.asarray(dev)
            elif total_cand > 0:
                # (zero candidates need no verification — and touching the
                # un-fetched device row maps would cost round trips)
                counts += self._verify_candidates(
                    buf, dev_bound, filt_chunks, filt_totals, fmask,
                    wf, halo, plens_filter,
                )

        counts[: self.scan_patterns.num_patterns] += self.tail_counts(
            buf, dev_bound
        )
        return counts

    def _verify_candidates(
        self,
        buf,
        dev_bound,
        filt_chunks,
        filt_totals,
        fmask,
        wf,
        halo,
        plens_filter,
    ) -> np.ndarray:
        """Verify candidate windows in the hot staging rows.

        The union of hot rows (across all filtration patterns) is staged as
        a mini-corpus and run through the banded DP kernel in ONE device
        call — rows hot only for another pattern contribute zero (no
        candidates implies no matches), the row-count bucket padding is
        masked by the window bound, and only the corpus-final clipped row
        falls back to the NumPy oracle.
        """
        from ..ops.pallas_kernel import FOLD, scan_folded_pallas_unrolled
        from ..utils.oracle import banded_distances

        n = len(buf)
        k = self.k
        p_pad = self._pat.shape[0]
        out = np.zeros((p_pad,), dtype=np.int64)

        hot = set()
        per_pattern_rows = {pi: [] for pi in range(p_pad)}
        for c0, rm in filt_chunks:
            for r in np.nonzero(rm[:, : p_pad].any(axis=1))[0]:
                hot.add(c0 + int(r) * wf)
            for pi in range(p_pad):
                for r in np.nonzero(rm[:, pi])[0]:
                    per_pattern_rows[pi].append(c0 + int(r) * wf)
        device_rows = sorted(j0 for j0 in hot if j0 + wf <= dev_bound)
        clipped_rows = sorted(j0 for j0 in hot if j0 + wf > dev_bound)

        # Small candidate sets: the native verifier beats a device round
        # trip (and verifies only each pattern's own hot rows).
        from ..utils import native

        if len(device_rows) <= 16 and native.available():
            for pi, is_f in enumerate(fmask):
                if not is_f or filt_totals[pi] == 0:
                    continue
                pat = self.scan_patterns.raw[pi]
                for j0 in sorted(set(per_pattern_rows[pi])):
                    j1 = min(j0 + wf, dev_bound)
                    if j0 >= j1:
                        continue
                    seg = buf[j0 : min(n, j1 + len(pat) - 1 + k)]
                    out[pi] += native.banded_count(
                        seg, np.frombuffer(pat, np.uint8), k, j1 - j0, -1
                    )
            return out

        if device_rows:
            n_hot = len(device_rows)
            bucket = max(FOLD, round_up(n_hot, 4 * FOLD))
            stage = np.zeros((bucket, wf + halo), dtype=np.uint8)
            for i, j0 in enumerate(device_rows):
                hi = min(n, j0 + wf + halo)
                stage[i, : hi - j0] = buf[j0:hi]
            dev = scan_folded_pallas_unrolled(
                jax.numpy.asarray(stage),
                jax.numpy.asarray(self._pat),
                jax.numpy.asarray(n_hot * wf, dtype=np.int32),
                jax.numpy.asarray(0, dtype=np.int32),
                k=k,
                m_max=self.m_max,
                wf=wf,
                halo=halo,
                plens=plens_filter,
                dp_dtype=self.config.dp_dtype,
                interpret=self.config.interpret,
            )
            out += np.asarray(dev)

        from ..utils import native

        use_native = native.available()
        for j0 in clipped_rows:
            j1 = min(j0 + wf, dev_bound)
            if j0 >= j1:
                continue
            for pi, is_f in enumerate(fmask):
                if not is_f or filt_totals[pi] == 0:
                    continue
                pat = self.scan_patterns.raw[pi]
                seg = buf[j0 : min(n, j1 + len(pat) - 1 + k)]
                if use_native:
                    out[pi] += native.banded_count(
                        seg, np.frombuffer(pat, np.uint8), k, j1 - j0, -1
                    )
                else:
                    d = banded_distances(seg, pat, k)
                    out[pi] += int(np.sum(d[: j1 - j0] <= k))
        return out

    def _count_single(self, buf: np.ndarray) -> np.ndarray:
        n = len(buf)
        backend = self._resolve_backend()
        w = self.block_windows_for(n)
        if backend == "pallas":
            counts = self._count_pallas(buf, n, w)
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

    def warmup(self, corpus_bytes: int) -> None:
        """Ahead-of-time compile the kernels for a given corpus size.

        First-time compilation of a (k, pattern-length multiset, block
        width) combination can take minutes on remote-compile setups; call
        this once at service startup (with the expected corpus size) so
        the first real scan runs at full speed. Executes one zero-filled
        block of the exact shapes the scan will use (some platforms'
        AOT-lowered executables don't feed the normal dispatch path, so a
        real execution is the only reliable warm); results land in the
        persistent compile cache. No-op on non-Pallas backends.
        """
        if self._resolve_backend() != "pallas":
            return
        from ..ops.filter_kernel import (
            FOLD as FILTER_FOLD,
            partition_plens,
            scan_filter_pallas,
        )
        from ..ops.pallas_kernel import (
            _DTYPE_FOLD,
            scan_folded_pallas_unrolled,
        )

        n = int(corpus_bytes)
        k = self.k
        fold = _DTYPE_FOLD[self.config.dp_dtype]
        w = round_up(
            self.block_windows_for(n), max(fold, FILTER_FOLD) * 128
        )
        wf = w // fold
        halo = round_up(self.m_max + 2 * k, 128)
        dev_bound = self.device_window_bound(n)
        if dev_bound <= 0:
            return
        engine = self.config.engine if fold == FILTER_FOLD else "dp"
        _, plens_filter, plens_dp = partition_plens(
            self._plens_static, k, engine
        )
        chunk_win = max(
            w, round_up(min(self.config.chunk_bytes, dev_bound), w)
        )
        n_rows = chunk_win // wf
        zero32 = jax.numpy.asarray(0, jax.numpy.int32)
        rows = jax.numpy.zeros((n_rows, wf + halo), jax.numpy.uint8)
        if any(plens_dp):
            np.asarray(
                scan_folded_pallas_unrolled(
                    rows, jax.numpy.asarray(self._pat), zero32, zero32,
                    k=k, m_max=self.m_max, wf=wf, halo=halo, plens=plens_dp,
                    dp_dtype=self.config.dp_dtype,
                    interpret=self.config.interpret,
                )
            )
        if any(plens_filter):
            fcnt, _ = scan_filter_pallas(
                rows, jax.numpy.asarray(self._pat_raw), zero32, zero32,
                k=k, m_max=self.m_max, wf=wf, halo=halo,
                plens=plens_filter, interpret=self.config.interpret,
            )
            np.asarray(fcnt)

    def find(self, corpus: Bytes, limit: Optional[int] = None):
        """Match *positions*, not just counts — beyond the reference's API.

        Returns a list (one entry per input pattern) of int64 arrays of
        window starts ``j`` with ``lev(pattern, corpus[j:j+m]) <= k``
        (untruncated and EOF-truncated windows alike, same semantics as
        :meth:`count`). ``limit`` caps positions per pattern.

        Implementation: filtration-eligible patterns locate candidates with
        the phase-1 kernel's row map and resolve exact positions with the
        banded oracle on the hot rows only; other patterns fall back to an
        oracle sweep (fine for the small/rare-k cases they represent).
        """
        from ..ops.filter_kernel import (
            FOLD as FILTER_FOLD,
            partition_plens,
            scan_filter_pallas,
        )
        from ..ops.pallas_kernel import _DTYPE_FOLD
        from ..utils.oracle import banded_distances

        buf = as_u8(corpus)
        n = len(buf)
        k = self.k
        nw = max(n - k, 0)
        uniq_positions = [
            np.zeros((0,), dtype=np.int64)
            for _ in range(self.scan_patterns.num_patterns)
        ]
        if nw > 0:
            fold = _DTYPE_FOLD[self.config.dp_dtype]
            backend = self._resolve_backend()
            use_kernel = backend == "pallas" and fold == FILTER_FOLD
            fmask, plens_filter, _ = partition_plens(
                self._plens_static, k, "filter" if use_kernel else "dp"
            )
            dev_bound = self.device_window_bound(n)
            hot_rows_by_pattern = {}
            wf = None
            if use_kernel and any(plens_filter) and dev_bound > 0:
                w = round_up(
                    self.block_windows_for(n), max(fold, FILTER_FOLD) * 128
                )
                wf = w // fold
                halo = round_up(self.m_max + 2 * k, 128)
                chunk_win = max(
                    w,
                    round_up(min(self.config.chunk_bytes, dev_bound), w),
                )
                n_rows = chunk_win // wf
                fp = (
                    self._fingerprint(buf)
                    if self.config.cache_corpus
                    else None
                )
                dpat_raw = jax.numpy.asarray(self._pat_raw)
                dbound = jax.numpy.asarray(dev_bound, dtype=np.int32)
                for c0 in range(0, dev_bound, chunk_win):
                    drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
                    fcnt, rowmap = scan_filter_pallas(
                        drows, dpat_raw, dbound,
                        jax.numpy.asarray(c0, dtype=np.int32),
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plens_filter,
                        interpret=self.config.interpret,
                    )
                    if int(np.asarray(fcnt).sum()) == 0:
                        continue
                    rm = np.asarray(rowmap)
                    for pi in range(self.scan_patterns.num_patterns):
                        if not fmask[pi]:
                            continue
                        for r in np.nonzero(rm[:, pi])[0]:
                            hot_rows_by_pattern.setdefault(pi, []).append(
                                c0 + int(r) * wf
                            )
            for pi, raw in enumerate(self.scan_patterns.raw):
                pat = np.frombuffer(raw, np.uint8)
                if use_kernel and fmask[pi]:
                    # exact positions from hot rows + the EOF tail
                    ranges = [
                        (j0, min(j0 + wf, dev_bound))
                        for j0 in sorted(set(hot_rows_by_pattern.get(pi, [])))
                    ]
                    if dev_bound < nw:
                        ranges.append((dev_bound, nw))
                else:
                    ranges = [(0, nw)]  # full oracle sweep
                found = []
                m = len(pat)
                for j0, j1 in ranges:
                    if j0 >= j1:
                        continue
                    # Untruncated ranges only need m-1+k context bytes;
                    # a range reaching the EOF tail keeps the true end so
                    # the truncation quirk applies.
                    end = n if j1 > dev_bound else min(n, j1 + m - 1 + k)
                    d = banded_distances(buf[j0:end], pat, k)
                    hits = np.nonzero(d[: j1 - j0] <= k)[0] + j0
                    found.append(hits)
                pos = (
                    np.concatenate(found)
                    if found
                    else np.zeros((0,), dtype=np.int64)
                )
                pos = np.unique(pos).astype(np.int64)
                if limit is not None:
                    pos = pos[:limit]
                uniq_positions[pi] = pos
        return [uniq_positions[i] for i in self._inverse]

    def count_file(self, path) -> np.ndarray:
        """Scan a corpus file without slurping it into memory.

        The file is memory-mapped read-only; the chunked scan loop then
        touches pages on demand (the native staging routines memcpy
        straight out of the mapping), so corpora larger than RAM stream
        through at page-cache speed. Counts are identical to
        ``count(read_input_file(path))``.
        """
        import os

        buf = np.memmap(os.fspath(path), dtype=np.uint8, mode="r")
        return self.count(buf)

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
                n, self.m_max, self.scan_patterns.num_patterns, self.k, n_dev
            )

        if strategy == "single" or n_dev == 1:
            counts = self._count_single(buf)
        else:
            from ..parallel.strategies import count_distributed

            counts = count_distributed(self, buf, strategy, n_dev)
        uniq = counts[: self.scan_patterns.num_patterns].astype(np.int64)
        expanded = uniq[self._inverse]
        self.last_duration = time.perf_counter() - t0
        self.last_strategy = strategy

        from ..utils.profiling import ScanStats, info

        stats = ScanStats(
            corpus_bytes=n,
            patterns=p,
            unique_patterns=self.scan_patterns.num_patterns,
            k=self.k,
            strategy=strategy,
            backend=self._resolve_backend(),
            block_windows=self.block_windows_for(n),
            seconds=self.last_duration,
        )
        self.meter.record(stats)
        if self.config.verbose:
            info(stats.line())
        return expanded


def scan_counts(
    corpus: Bytes,
    patterns: Sequence[Bytes],
    k: int,
    config: Optional[ApmConfig] = None,
) -> List[int]:
    """One-shot functional API mirroring the reference CLI semantics."""
    return [int(c) for c in Scanner(patterns, k, config).count(corpus)]
