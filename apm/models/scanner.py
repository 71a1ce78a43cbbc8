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
        # Optional SHARED host-side fold cache (same key -> folded np
        # rows): set on pattern-shard sub-scanners so the corpus is
        # folded once per chunk instead of once per device
        # (count_patterns_over_devices replicates the corpus on every
        # device; only the h2d transfer is inherently per-device).
        self._fold_cache: Optional[dict] = None
        import threading

        # Guards _fold_cache insert/evict; replaced by the PARENT's lock
        # when a shared fold cache is attached (_pattern_shard_scanners),
        # so all sub-scanners serialize on one lock.
        self._fold_cache_lock = threading.Lock()
        # Guards _dev_cache mutation and iteration: the background prewarm
        # thread (warmup's purge) runs concurrently with foreground scans'
        # _staged_rows insert/evict, and dict iteration during a
        # concurrent pop raises RuntimeError.
        self._dev_cache_lock = threading.RLock()
        # id -> (weakref, fp) memo for immutable buffers (_corpus_fp).
        self._fp_memo: dict = {}
        self._prewarm_thread = None
        if self.config.prewarm_bytes:
            self._prewarm_thread = threading.Thread(
                target=self._prewarm_run,
                args=(int(self.config.prewarm_bytes),),
                name="apm-prewarm",
                daemon=True,
            )
            self._prewarm_thread.start()

    def _prewarm_run(self, corpus_bytes: int) -> None:
        try:
            self.warmup(corpus_bytes)
        except Exception as e:  # startup helper: never take the service down
            from ..utils.profiling import info

            info(f"prewarm failed (scans will compile lazily): {e!r}")

    def prewarm_join(self, timeout: Optional[float] = None) -> bool:
        """Wait for the background prewarm (``ApmConfig.prewarm_bytes``).

        Returns True when the prewarm has finished (or none was requested).
        """
        t = self._prewarm_thread
        if t is None:
            return True
        t.join(timeout)
        return not t.is_alive()

    def _corr_alphabet(self) -> np.ndarray:
        """Distinct pattern bytes (cached) — the corr engine's channels."""
        a = getattr(self, "_corr_alph", None)
        if a is None:
            from ..ops.corr_engine import build_alphabet

            a = self._corr_alph = build_alphabet(self.scan_patterns.raw)
        return a

    def _dp_alphabet(self) -> tuple:
        """Distinct pattern bytes as a static tuple — keys the bit-parallel
        (Myers) banded-DP mode (``apm.ops.pallas_kernel._myers_mode``;
        eligibility — k range, alphabet size, table budget — is decided
        there, so this just hands the kernel the static alphabet)."""
        return tuple(int(b) for b in self._corr_alphabet())

    def _corr_kernel(self):
        """Shift-folded one-hot conv kernel for the corr engine (cached):
        ``(kern, thr, stride)`` — pass ``stride`` to ``scan_corr_mxu``.

        Built over the REAL pattern rows only: pattern-table padding rows
        would add all-zero kernel columns that still cost MXU MACs and
        shrink the shift-fold stride (a 2-unique-pattern set padded to 8
        rows paid 3.2x the MACs/byte; the probe's k = 0 corr ran 5.05
        GB/s vs the piece conv's 7.4 on the same staging). The scan pads
        its count vector back to ``p_pad`` (``p_out``).
        """
        kk = getattr(self, "_corr_kern", None)
        if kk is None:
            from ..ops.corr_engine import build_kernel, pick_stride

            n_real = self.scan_patterns.num_patterns
            stride = pick_stride(n_real)
            kern, thr = build_kernel(
                self._pat_raw[:n_real],
                self._plens_static[:n_real],
                self._corr_alphabet(),
                stride=stride,
            )
            kk = self._corr_kern = (kern, thr, stride)
        return kk

    def _corr_fused_tables(self):
        """Phase-folded ±1 tables for the fused Pallas correlation
        (cached): ``(km, thr)`` — see ``apm.ops.corr_fused``. Built over
        the REAL pattern rows only, like :meth:`_corr_kernel`."""
        kk = getattr(self, "_corr_fused_kern", None)
        if kk is None:
            from ..ops.corr_fused import build_fused_tables

            n_real = self.scan_patterns.num_patterns
            kk = self._corr_fused_kern = build_fused_tables(
                self._pat_raw[:n_real],
                self._plens_static[:n_real],
                self._corr_alphabet(),
            )
        return kk

    def _use_fused_corr(
        self, wf: int, halo: int, pieces: bool = False
    ) -> bool:
        """Route an eligible correlation scan to the fused Pallas kernel
        (``config.corr_impl``; DESIGN §8: 1.5-1.8x the XLA conv at
        P <= 16, 2.2x int8 at P = 64, bit-exact). The PIECE kernel's
        coverage proof needs m <= 65 (``fused_pieces_ok``); the count
        kernel takes m <= 97 (S = 32 phases)."""
        from ..ops.corr_fused import fused_eligible, fused_pieces_ok

        impl = self.config.corr_impl
        if impl == "conv":
            return False
        gate = fused_pieces_ok if pieces else fused_eligible
        ok = gate(self.m_max, wf, halo)
        if impl == "fused" and not ok and not pieces:
            raise ValueError(
                "corr_impl='fused' requires m_max <= 97 and 128-aligned "
                "staging (apm.ops.corr_fused.fused_eligible)"
            )
        return ok

    def _corr_call(
        self, drows, dbound, dstart, *, wf, halo, n_rows, p_out
    ):
        """One k = 0 correlation chunk scan, dispatched to the fused
        Pallas kernel or the XLA conv engine (same count contract)."""
        alph = self._corr_alphabet()
        if self._use_fused_corr(wf, halo):
            from ..ops.corr_engine import n_bitplanes
            from ..ops.corr_fused import pick_g, pick_s, scan_corr_fused

            km, thr = self._corr_fused_tables()
            l128 = (wf + halo) // 128
            s_ph = pick_s(self.m_max)
            try:
                return scan_corr_fused(
                    drows, jax.numpy.asarray(km), jax.numpy.asarray(thr),
                    jax.numpy.asarray(alph), dbound, dstart,
                    wf=wf, l128=l128, n_rows=n_rows,
                    g=pick_g(n_rows, l128, km.shape[1] // s_ph),
                    p=km.shape[1] // s_ph, c_alpha=len(alph),
                    b_planes=n_bitplanes(len(alph)), s_ph=s_ph,
                    interpret=self.config.interpret, p_out=p_out,
                )
            except Exception:
                # Compile failures surface at dispatch (only execution is
                # async). This testbed's remote-compile helper throws
                # transient HTTP 500s; under corr_impl="auto" a scan must
                # degrade to the XLA conv (identical counts), not die.
                if self.config.corr_impl == "fused":
                    raise
                from ..utils.profiling import info

                info("fused corr compile failed; falling back to conv")
        from ..ops.corr_engine import _group_rows, scan_corr_mxu

        kern_np, thr_np, corr_stride = self._corr_kernel()
        return scan_corr_mxu(
            drows, jax.numpy.asarray(kern_np), jax.numpy.asarray(thr_np),
            jax.numpy.asarray(alph), dbound, dstart,
            wf=wf, m_max=self.m_max, n_rows=n_rows,
            g_rows=_group_rows(wf + halo, len(alph), n_rows),
            stride=corr_stride, p_out=p_out,
        )

    def _fp1_kernel(self, plens_filter: tuple):
        """Piece-correlation tables for conv phase 1 (cached per split):
        ``(kern, thr, owner, stride)``."""
        cached = getattr(self, "_fp1_cache", None)
        if cached is not None and cached[0] == plens_filter:
            return cached[1]
        from ..ops.corr_engine import build_piece_kernel, pick_stride
        from ..ops.filter_kernel import tier_of

        n_pieces = sum(
            tier_of(m, self.k)[0] for m in plens_filter if m > 0
        )
        stride = pick_stride(n_pieces)
        tables = build_piece_kernel(
            self._pat_raw, plens_filter, self.k, self._corr_alphabet(),
            stride=stride,
        ) + (stride,)
        self._fp1_cache = (plens_filter, tables)
        return tables

    def _fp1_fused_tables(self, plens_filter: tuple):
        """Fused-Pallas piece tables for conv phase 1 (cached per split):
        ``(km, thr, owner64)`` — see
        ``apm.ops.corr_fused.build_fused_piece_tables``."""
        cached = getattr(self, "_fp1_fused_cache", None)
        if cached is not None and cached[0] == plens_filter:
            return cached[1]
        from ..ops.corr_fused import build_fused_piece_tables

        tables = build_fused_piece_tables(
            self._pat_raw, plens_filter, self.k, self._corr_alphabet()
        )
        self._fp1_fused_cache = (plens_filter, tables)
        return tables

    def _fp1_call(
        self, drows, dpat, dbound, dstart, plan, *, n_rows, max_hot
    ):
        """One conv-phase-1 + shared-phase-2 chunk call, dispatched to the
        fused Pallas piece scan or the XLA piece conv (same
        ``(packed, rowmap)`` contract)."""
        from ..ops.corr_fused import S_FUSED, pick_g

        wf, halo = plan.wf, plan.halo
        alph = self._corr_alphabet()
        common = dict(
            k=self.k, m_max=self.m_max, wf=wf, halo=halo,
            plens=plan.plens_filter, max_hot=max_hot,
            dp_dtype=self.config.dp_dtype,
            alphabet=self._dp_alphabet(),
            dp_impl=self.config.dp_impl,
            interpret=self.config.interpret,
        )
        # Fused phase 1 only when PINNED: for whole patterns the
        # phase-split K-tile padding tax is 128/m <= 2.6x and the fused
        # kernel wins, but pieces are short (l ~ m/(k+1)) — at k=4
        # (l=10) the tax is 12.8x and the fused piece scan measured
        # 0.83x the XLA piece conv (k=1/2, l=16-25: a wash). The conv
        # keeps the default; corr_impl="fused" forces the Pallas path.
        if self.config.corr_impl == "fused" and self._use_fused_corr(
            wf, halo, pieces=True
        ):
            from ..ops.corr_engine import n_bitplanes
            from ..ops.fused import filter_verify_chunk_fused

            km, thr, owner64 = self._fp1_fused_tables(plan.plens_filter)
            l128 = (wf + halo) // 128
            n_slots = km.shape[1] // S_FUSED
            try:
                return filter_verify_chunk_fused(
                    drows, jax.numpy.asarray(km), jax.numpy.asarray(thr),
                    jax.numpy.asarray(owner64), jax.numpy.asarray(alph),
                    dpat, dbound, dstart,
                    l128=l128, n_rows=n_rows,
                    g=pick_g(n_rows, l128, n_slots), n_slots=n_slots,
                    p_pat=owner64.shape[1], c_alpha=len(alph),
                    b_planes=n_bitplanes(len(alph)), **common,
                )
            except Exception:
                # Same transient-compile degradation contract as
                # _corr_call: "auto" falls back to the conv phase 1.
                if self.config.corr_impl == "fused":
                    raise
                from ..utils.profiling import info

                info("fused phase 1 compile failed; falling back to conv")
        from ..ops.corr_engine import _group_rows
        from ..ops.fused import filter_verify_chunk_conv

        pk_np, pt_np, ow_np, fp1_stride = self._fp1_kernel(
            plan.plens_filter
        )
        return filter_verify_chunk_conv(
            drows, jax.numpy.asarray(pk_np), jax.numpy.asarray(pt_np),
            jax.numpy.asarray(ow_np), jax.numpy.asarray(alph),
            dpat, dbound, dstart,
            w_kern=pk_np.shape[0], n_rows=n_rows,
            g_rows=_group_rows(wf + halo, len(alph), n_rows),
            fp1_stride=fp1_stride, **common,
        )

    @staticmethod
    def _immutable(buf) -> bool:
        """True when no numpy handle can mutate ``buf``'s bytes: every
        ndarray in the base chain is non-writeable (a read-only *view* of
        a writeable array does NOT qualify — writes through the base
        would still change the content under the view)."""
        obj = buf
        while isinstance(obj, np.ndarray):
            if obj.flags.writeable:
                return False
            obj = obj.base
        return True

    def _corpus_fp(self, buf: np.ndarray):
        """Content fingerprint for the device-corpus cache, memoized for
        immutable buffers.

        The full-content hash runs at ~12 GB/s but still costs ~21 ms of
        a 60 ms steady-state 256 MB scan (bench/fp1_probe.py item 7).
        When the buffer is provably immutable (:meth:`_immutable` — e.g.
        ``count_file``'s read-only memmap, or any array the caller
        ``setflags(write=False)``-froze), the hash is computed once and
        memoized by object identity; a weakref guards against a recycled
        ``id`` ever aliasing a different array. Writable buffers are
        re-hashed every call — an in-place mutation must change the key
        (ADVICE r1 #2).

        CONTRACT: freezing a buffer is a promise it will never change
        again. Thawing a scanned frozen buffer with
        ``setflags(write=True)``, mutating it in place, and re-freezing
        it is UNSUPPORTED (use a fresh array, or leave the buffer
        writable and pay the per-call re-hash): the memo validates hits
        with a sampled check (:meth:`_fp_sample`) that catches coarse
        content swaps but — necessarily, or it would be the full hash —
        not arbitrary localized mutations, and a hit then serves counts
        for the old content. Documented in ``ApmConfig.cache_corpus``
        (ADVICE r3 #2 offered exactly this contract as the remedy).
        """
        if not self.config.cache_corpus:
            return None
        if isinstance(buf, np.ndarray) and self._immutable(buf):
            import weakref

            key = id(buf)
            ent = self._fp_memo.get(key)
            if ent is not None and ent[0]() is buf and (
                ent[2] == self._fp_sample(buf)
            ):
                # Sample check: an array thawed with setflags(write=True),
                # mutated, and re-frozen keeps its id but (almost surely)
                # not its boundary/stride sample — recompute on mismatch
                # instead of serving a stale fingerprint (ADVICE r3 #2).
                return ent[1]
            fp = self._fingerprint(buf)
            try:
                ref = weakref.ref(
                    buf, lambda _, k=key: self._fp_memo.pop(k, None)
                )
                self._fp_memo[key] = (ref, fp, self._fp_sample(buf))
            except TypeError:
                pass
            return fp
        return self._fingerprint(buf)

    @staticmethod
    def _fp_sample(buf: np.ndarray) -> tuple:
        """Cheap content sample validating `_fp_memo` hits: length plus
        64 bytes at each of 33 evenly spaced offsets (~2 KB, O(1), no
        full pass). This catches coarse content changes (a swapped or
        re-sliced buffer, a bulk overwrite) — NOT arbitrary localized
        mutations of a thawed-and-refrozen buffer, which the memo
        contract excludes (see :meth:`_corpus_fp`)."""
        n = buf.size
        if n == 0:
            return (0,)
        flat = buf.reshape(-1)
        parts = [n]
        for i in range(33):
            off = (n - 1) * i // 32
            parts.append(flat[off:off + 64].tobytes())
        return tuple(parts)

    @staticmethod
    def _fingerprint(buf: np.ndarray) -> tuple:
        """Full-content fingerprint for the device-corpus cache.

        Hashes EVERY byte (native MurmurHash64A pass at several GB/s, or
        BLAKE2b via the buffer protocol as fallback) so any content change
        — including a localized in-place mutation — changes the key.
        Round 1 sampled ~192 bytes and could silently serve stale counts
        (ADVICE r1 #2); the full pass costs a few ms per 100 MB, far below
        the host→device transfer it saves on a hit.
        """
        from ..utils import native

        n = len(buf)
        if native.available():
            return (n, native.hash_bytes(buf))
        import hashlib

        arr = np.ascontiguousarray(buf, dtype=np.uint8)
        return (n, hashlib.blake2b(memoryview(arr), digest_size=8).hexdigest())

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

    def _cache_byte_budget(self) -> int:
        """Byte cap for the device-corpus LRU: explicit config, or a
        quarter of the device's reported HBM (round 1 capped by entry
        *count*, which could pin ~8 GB at the default chunk size)."""
        if self.config.cache_bytes is not None:
            return self.config.cache_bytes
        try:
            stats = jax.devices()[0].memory_stats()
            limit = int(stats.get("bytes_limit", 0)) if stats else 0
        except Exception:
            limit = 0
        return limit // 4 if limit > 0 else 4 << 30

    def _staged_rows(self, buf, fp, c0, n_rows, wf, halo):
        """Device-resident folded staging rows for one chunk (LRU-cached,
        byte-bounded)."""
        key = (fp, wf, halo, n_rows, c0)
        if fp is not None:
            with self._dev_cache_lock:
                if key in self._dev_cache:
                    # mark recent
                    self._dev_cache[key] = self._dev_cache.pop(key)
                    return self._dev_cache[key]
        fc = self._fold_cache
        rows = fc.get(key) if (fc is not None and fp is not None) else None
        if rows is None:
            rows = fold_corpus(buf, c0, n_rows, wf, halo)
            if fc is not None and fp is not None:
                # Shared across pattern-shard sub-scanners running in a
                # ThreadPoolExecutor: insert + evict under the shared lock
                # so two threads can't pop the same key (ADVICE r3 #1).
                with self._fold_cache_lock:
                    fc[key] = rows
                    while len(fc) > 4:  # bound host memory to ~4 chunks
                        try:
                            fc.pop(next(iter(fc)), None)
                        except StopIteration:  # pragma: no cover
                            break
        drows = jax.numpy.asarray(rows)
        if fp is not None:
            budget = self._cache_byte_budget()
            if drows.nbytes <= budget:
                with self._dev_cache_lock:
                    self._dev_cache[key] = drows
                    total = sum(
                        v.nbytes for v in self._dev_cache.values()
                    )
                    while total > budget and len(self._dev_cache) > 1:
                        old = self._dev_cache.pop(
                            next(iter(self._dev_cache))
                        )
                        total -= old.nbytes
        return drows

    def _count_pallas(
        self, buf: np.ndarray, n: int, fp: object = "auto"
    ) -> np.ndarray:
        """Single-device Pallas scan: filtration + banded DP, chunked.

        Patterns are partitioned by :func:`apm.ops.filter_kernel.
        filter_eligible`: eligible ones run the fused phase-1 + on-device
        phase-2 program (``apm.ops.fused.filter_verify_chunk``), the rest
        run the banded DP kernel. The chunk loop only *dispatches* — all
        device results are fetched together afterwards, so no per-chunk
        host synchronization — and the phase-2 decision tree (density
        fallback, overflow recovery, clipped rows) is the shared
        :func:`apm.models.pipeline.finalize_filtration`.

        The host-side chunk loop keeps every chunk the same compiled shape
        (the window bound masks the last chunk's padding), so one jit
        compilation serves arbitrarily large corpora — and accumulating
        counts per chunk host-side is checkpoint/resume for free
        (SURVEY.md §5).
        """
        from ..ops.filter_kernel import scan_filter_pallas
        from ..ops.fused import (
            OVERFLOW_BATCH,
            OVERFLOW_CAP,
            count_hot_batch,
            filter_verify_chunk,
            pick_max_hot,
        )
        from ..ops.pallas_kernel import scan_folded_pallas_unrolled
        from .pipeline import (
            FilterChunk,
            buf_reader,
            finalize_filtration,
            make_plan,
        )

        k = self.k
        plan = make_plan(self, n, "pallas")
        wf, halo, dev_bound = plan.wf, plan.halo, plan.dev_bound
        p_pad = self._pat.shape[0]
        counts = np.zeros((p_pad,), dtype=np.int64)
        if dev_bound <= 0:
            counts[: self.scan_patterns.num_patterns] += self.tail_counts(
                buf, dev_bound
            )
            return counts

        chunk_win = max(
            plan.w,
            round_up(min(self.config.chunk_bytes, dev_bound), plan.w),
        )
        n_rows = chunk_win // wf
        max_hot = pick_max_hot(n_rows, wf, plan.plens_filter, k)
        dpat = jax.numpy.asarray(self._pat)
        dpat_raw = jax.numpy.asarray(self._pat_raw)
        dbound = jax.numpy.asarray(dev_bound, dtype=np.int32)
        if fp == "auto":
            fp = self._corpus_fp(buf)

        handles = []  # (P,)-shaped device counts, fetched after the loop
        raw_chunks = []  # (c0, packed handle, rowmap handle)
        for c0 in range(0, dev_bound, chunk_win):
            drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
            dc0 = jax.numpy.asarray(c0, dtype=np.int32)
            if plan.use_corr:
                handles.append(
                    self._corr_call(
                        drows, dbound, dc0,
                        wf=wf, halo=halo, n_rows=n_rows, p_out=p_pad,
                    )
                )
            if plan.any_dp:
                handles.append(
                    scan_folded_pallas_unrolled(
                        drows, dpat, dbound, dc0,
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plan.plens_dp, dp_dtype=self.config.dp_dtype,
                        alphabet=self._dp_alphabet(),
                        dp_impl=self.config.dp_impl,
                        interpret=self.config.interpret,
                    )
                )
            if plan.any_filter:
                if k == 0:
                    fcnt, _ = scan_filter_pallas(
                        drows, dpat_raw, dbound, dc0,
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plan.plens_filter,
                        interpret=self.config.interpret,
                    )
                    handles.append(fcnt)  # exact: candidates ARE matches
                elif plan.fp1_conv:
                    packed, rowmap = self._fp1_call(
                        drows, dpat, dbound, dc0, plan,
                        n_rows=n_rows, max_hot=max_hot,
                    )
                    raw_chunks.append((c0, packed, rowmap, drows))
                else:
                    packed, rowmap = filter_verify_chunk(
                        drows, dpat_raw, dpat, dbound, dc0,
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plan.plens_filter,
                        max_hot=max_hot,
                        dp_dtype=self.config.dp_dtype,
                        alphabet=self._dp_alphabet(),
                        dp_impl=self.config.dp_impl,
                        interpret=self.config.interpret,
                    )
                    raw_chunks.append((c0, packed, rowmap, drows))

        # ONE device->host fetch for all per-chunk vectors: each fetch is
        # a full link round trip, so everything rides one stacked array.
        from ..ops.fused import unpack_chunk

        small = [h for h in handles]
        small += [pk for _, pk, _, _ in raw_chunks]
        fetched = (
            np.asarray(jax.numpy.concatenate([s.ravel() for s in small]))
            if small
            else np.zeros((0,), dtype=np.int64)
        )
        off = 0
        for h in handles:
            counts += fetched[off : off + p_pad]
            off += p_pad

        def make_verify_dev(drows, rowmap, c0):
            """Device-side overflow recovery for one chunk: batch count
            handles over ALL its full hot rows (fused.count_hot_batch);
            None past the compaction cap (host fallback)."""

            from ..ops import fused

            n_batch, cap = fused.OVERFLOW_BATCH, fused.OVERFLOW_CAP

            def verify(n_hot: int):
                if n_hot > cap:
                    return None
                nb = -(-n_hot // n_batch)
                return [
                    count_hot_batch(
                        drows, rowmap, dpat, dbound,
                        jax.numpy.asarray(c0, dtype=np.int32),
                        jax.numpy.asarray(b, dtype=np.int32),
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=plan.plens_filter,
                        n_batch=n_batch, cap=cap,
                        dp_dtype=self.config.dp_dtype,
                        alphabet=self._dp_alphabet(),
                        dp_impl=self.config.dp_impl,
                        interpret=self.config.interpret,
                    )
                    for b in range(nb)
                ]

            return verify

        fchunks = []
        for c0, pk, rowmap, drows in raw_chunks:
            ln = pk.shape[0]
            fcnt, vcnt, n_hot, clip = unpack_chunk(
                fetched[off : off + ln], p_pad
            )
            off += ln
            fchunks.append(
                FilterChunk(
                    c0, fcnt, vcnt, n_hot, clip, rowmap,
                    verify_dev=make_verify_dev(drows, rowmap, c0),
                )
            )

        if fchunks:

            def rescan() -> np.ndarray:
                out = np.zeros((p_pad,), dtype=np.int64)
                for c0 in range(0, dev_bound, chunk_win):
                    drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
                    out += np.asarray(
                        scan_folded_pallas_unrolled(
                            drows, dpat, dbound,
                            jax.numpy.asarray(c0, dtype=np.int32),
                            k=k, m_max=self.m_max, wf=wf, halo=halo,
                            plens=plan.plens_filter,
                            dp_dtype=self.config.dp_dtype,
                            alphabet=self._dp_alphabet(),
                            dp_impl=self.config.dp_impl,
                            interpret=self.config.interpret,
                        )
                    )
                return out

            counts += finalize_filtration(
                self, buf_reader(buf), plan, n, fchunks, rescan,
                max_hot=max_hot,
            )

        counts[: self.scan_patterns.num_patterns] += self.tail_counts(
            buf, dev_bound
        )
        return counts

    def _pattern_shard_scanners(
        self, groups, block_windows: Optional[int] = None
    ) -> List["Scanner"]:
        """Sub-scanners over pattern index groups (patterns_over_devices).

        Cached on the parent so repeated ``count()`` calls reuse each
        sub-scanner's device-resident corpus cache and compiled kernels.
        ``block_windows`` pins every group to ONE block width so their
        staging layouts (wf, halo) agree and the shared host fold cache
        can serve all devices from a single ``fold_corpus`` pass.
        """
        key = (tuple(tuple(g) for g in groups), block_windows)
        if getattr(self, "_shard_scanners_key", None) == key:
            return self._shard_scanners
        from dataclasses import replace

        # prewarm_bytes must not propagate: each sub-scanner would spawn a
        # background warmup thread compiling + dispatching mid-scan.
        cfg = replace(
            self.config,
            strategy="single",
            dedup_patterns=False,
            prewarm_bytes=None,
            block_windows=block_windows or self.config.block_windows,
        )
        subs = [
            Scanner([self.scan_patterns.raw[i] for i in g], self.k, cfg)
            for g in groups
        ]
        fold_cache: dict = {}
        for sub in subs:
            sub._fold_cache = fold_cache
            sub._fold_cache_lock = self._fold_cache_lock
        self._shard_scanners_key = key
        self._shard_scanners = subs
        return subs

    def _count_single(self, buf: np.ndarray) -> np.ndarray:
        n = len(buf)
        backend = self._resolve_backend()
        w = self.block_windows_for(n)
        if backend == "pallas":
            counts = self._count_pallas(buf, n)
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

    def warmup(
        self,
        corpus_bytes: int,
        paths: Sequence[str] = ("count", "find", "batch"),
    ) -> None:
        """Ahead-of-time compile the kernels for a given corpus size.

        First-time compilation of a (k, pattern-length multiset, block
        width) combination can take minutes on remote-compile setups; call
        this once at service startup (with the expected corpus size) so
        the first real scan runs at full speed. Executes one zero-filled
        block of the exact shapes the scan will use (some platforms'
        AOT-lowered executables don't feed the normal dispatch path, so a
        real execution is the only reliable warm); results land in the
        persistent compile cache. No-op on non-Pallas backends.

        ``paths`` selects which serving entry points to warm:

        * ``"count"`` — the :meth:`count` kernels (filtration / banded /
          corr / overflow-recovery), zero-filled blocks of exact shapes;
        * ``"find"`` — :meth:`find`'s position kernels
          (``find_positions_chunk`` / ``sweep_positions_chunk`` and the
          overflow ``gather_mask_rows``), warmed by driving the real
          entry point on a zero corpus of ``corpus_bytes`` (identical
          shapes to a real call) plus one direct overflow-batch call;
        * ``"batch"`` — :meth:`count_batch`'s grouped kernel, warmed on a
          one-corpus batch of ``corpus_bytes`` (covers any batch big
          enough to hit the group bucket cap; smaller batches bucket
          differently and compile on first use).

        Corpus-cache entries staged by the warm runs are purged so the
        zero corpus never occupies the device cache budget.
        """
        if self._resolve_backend() != "pallas":
            return
        if "count" in paths:
            self._warmup_count(int(corpus_bytes))
        if "find" in paths or "batch" in paths:
            self._warmup_serving(int(corpus_bytes), paths)

    def _warmup_serving(self, n: int, paths: Sequence[str]) -> None:
        """Drive find()/count_batch on a zero corpus to absorb their
        compiles (see :meth:`warmup`), leaving the corpus caches as they
        were.

        The purge is scoped by the zero corpus's FINGERPRINT (every
        ``_dev_cache``/``_fold_cache`` key carries the fp first), not a
        bare before/after key diff: warmup may run on the background
        prewarm thread concurrently with real foreground scans, and a
        key diff would evict whatever the foreground scan staged
        meanwhile. Within that fp scope, keys already present BEFORE the
        warm runs are additionally spared — a foreground corpus that is
        itself all zeros of the same length shares the content
        fingerprint, and its previously staged rows must survive the
        warmup (ADVICE r4 #2; a same-fp key staged DURING the warm runs
        is indistinguishable from warmup's own and is purged — it is
        byte-identical staging the foreground can restage on a miss).
        The zero buffer is writable, so ``_corpus_fp`` never memoizes it
        — no ``_fp_memo`` cleanup is needed (round 4 cleared the whole
        memo here, dropping real corpora's memoized fingerprints).
        """
        zeros = np.zeros((n,), dtype=np.uint8)
        warm_fp = (
            self._fingerprint(zeros) if self.config.cache_corpus else None
        )
        if warm_fp is not None:
            with self._dev_cache_lock:
                dev_pre = {
                    k2 for k2 in self._dev_cache if k2[0] == warm_fp
                }
            fold_pre = set()
            if self._fold_cache is not None:
                with self._fold_cache_lock:
                    fold_pre = {
                        k2 for k2 in self._fold_cache if k2[0] == warm_fp
                    }
        try:
            if "find" in paths:
                self.find(zeros)
                self._warmup_gather(n)
            if "batch" in paths:
                self.count_batch([zeros])
        finally:
            if warm_fp is not None:
                with self._dev_cache_lock:
                    for key in [
                        k2
                        for k2 in self._dev_cache
                        if k2[0] == warm_fp and k2 not in dev_pre
                    ]:
                        self._dev_cache.pop(key, None)
                if self._fold_cache is not None:
                    with self._fold_cache_lock:
                        for key in [
                            k2
                            for k2 in self._fold_cache
                            if k2[0] == warm_fp and k2 not in fold_pre
                        ]:
                            self._fold_cache.pop(key, None)

    def _warmup_gather(self, n: int) -> None:
        """Compile find()'s overflow-batch kernel (``gather_mask_rows``)
        for the exact shapes :meth:`find` dispatches at corpus size
        ``n`` — a zero-corpus drive never overflows, so this one is
        warmed directly."""
        from ..ops.filter_kernel import FOLD as FILTER_FOLD
        from ..ops.filter_kernel import partition_plens
        from ..ops.fused import FIND_BATCH, POS_CAP, gather_mask_rows
        from ..ops.pallas_kernel import _DTYPE_FOLD

        k = self.k
        fold = _DTYPE_FOLD[self.config.dp_dtype]
        if fold != FILTER_FOLD:
            return
        dev_bound = self.device_window_bound(n)
        if dev_bound <= 0:
            return
        p_all = self.scan_patterns.num_patterns
        _, plens_filter, plens_dp = partition_plens(
            self._plens_static, k, "filter"
        )
        w = round_up(self.block_windows_for(n), max(fold, FILTER_FOLD) * 128)
        wf = w // fold
        halo = round_up(self.m_max + 2 * k, 128)
        chunk_win = max(w, round_up(min(self.config.chunk_bytes, dev_bound), w))
        n_rows = chunk_win // wf
        rows = jax.numpy.zeros((n_rows, wf + halo), jax.numpy.uint8)
        idx = jax.numpy.full((FIND_BATCH,), n_rows, jax.numpy.int32)
        dpat = jax.numpy.asarray(self._pat)
        for plens in (plens_filter, plens_dp):
            if not any(plens):
                continue
            posmeta, _bits = gather_mask_rows(
                rows, idx, dpat, jax.numpy.asarray(0, np.int32),
                k=k, m_max=self.m_max, wf=wf, halo=halo, plens=plens,
                p_real=p_all, dp_dtype=self.config.dp_dtype,
                alphabet=self._dp_alphabet(), dp_impl=self.config.dp_impl,
                interpret=self.config.interpret, pos_cap=POS_CAP,
            )
            np.asarray(posmeta)

    def _warmup_count(self, n: int) -> None:
        from ..ops.filter_kernel import scan_filter_pallas
        from ..ops.fused import (
            count_hot_batch,
            filter_verify_chunk,
            pick_max_hot,
        )
        from ..ops.pallas_kernel import scan_folded_pallas_unrolled
        from .pipeline import make_plan

        k = self.k
        plan = make_plan(self, n, "pallas")
        wf, halo, dev_bound = plan.wf, plan.halo, plan.dev_bound
        if dev_bound <= 0:
            return
        chunk_win = max(
            plan.w, round_up(min(self.config.chunk_bytes, dev_bound), plan.w)
        )
        n_rows = chunk_win // wf
        zero32 = jax.numpy.asarray(0, jax.numpy.int32)
        rows = jax.numpy.zeros((n_rows, wf + halo), jax.numpy.uint8)
        if plan.use_corr:
            np.asarray(
                self._corr_call(
                    rows, zero32, zero32,
                    wf=wf, halo=halo, n_rows=n_rows,
                    p_out=self._pat.shape[0],
                )
            )
        if plan.any_dp:
            np.asarray(
                scan_folded_pallas_unrolled(
                    rows, jax.numpy.asarray(self._pat), zero32, zero32,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plan.plens_dp, dp_dtype=self.config.dp_dtype,
                    alphabet=self._dp_alphabet(),
                    dp_impl=self.config.dp_impl,
                    interpret=self.config.interpret,
                )
            )
        if plan.any_filter:
            if k == 0:
                fcnt, _ = scan_filter_pallas(
                    rows, jax.numpy.asarray(self._pat_raw), zero32, zero32,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plan.plens_filter, interpret=self.config.interpret,
                )
                np.asarray(fcnt)
                return
            max_hot = pick_max_hot(n_rows, wf, plan.plens_filter, k)
            if plan.fp1_conv:
                packed, rowmap = self._fp1_call(
                    rows, jax.numpy.asarray(self._pat), zero32, zero32,
                    plan, n_rows=n_rows, max_hot=max_hot,
                )
                np.asarray(packed)
            else:
                packed, rowmap = filter_verify_chunk(
                    rows, jax.numpy.asarray(self._pat_raw),
                    jax.numpy.asarray(self._pat), zero32, zero32,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plan.plens_filter,
                    max_hot=max_hot,
                    dp_dtype=self.config.dp_dtype,
                    alphabet=self._dp_alphabet(),
                    dp_impl=self.config.dp_impl,
                    interpret=self.config.interpret,
                )
                np.asarray(packed)
            # Overflow-recovery batch kernel (count_hot_batch): the batch
            # index is traced, so this one execution compiles the program
            # any overflowed scan will dispatch.
            np.asarray(
                count_hot_batch(
                    rows, rowmap, jax.numpy.asarray(self._pat),
                    zero32, zero32, zero32,
                    k=k, m_max=self.m_max, wf=wf, halo=halo,
                    plens=plan.plens_filter,
                    dp_dtype=self.config.dp_dtype,
                    alphabet=self._dp_alphabet(),
                    dp_impl=self.config.dp_impl,
                    interpret=self.config.interpret,
                )
            )

    def find(self, corpus: Bytes, limit: Optional[int] = None):
        """Match *positions*, not just counts — beyond the reference's API.

        Returns a list (one entry per input pattern) of int64 arrays of
        window starts ``j`` with ``lev(pattern, corpus[j:j+m]) <= k``
        (untruncated and EOF-truncated windows alike, same semantics as
        :meth:`count`). ``limit`` caps positions per pattern.

        Implementation: every pattern resolves positions ON DEVICE, one
        fused call per chunk per path — filtration-eligible patterns via
        ``find_positions_chunk`` (phase-1 filtration, hot-row compaction,
        verdict-mask re-verification), ineligible patterns (short, or
        high k) via ``sweep_positions_chunk`` (dense banded verdict-mask
        sweep feeding the same compaction tail). The host fetches one
        small meta vector plus a bit-packed verdict mask per path, so
        dense-match sweeps stay at device speed and zero-candidate chunks
        cost a single fetch. Only the (at most one per chunk)
        window-bound-clipped row and the EOF tail fall back to the host
        oracle; the XLA backend keeps the full oracle sweep.
        """
        from ..ops.filter_kernel import (
            FOLD as FILTER_FOLD,
            partition_plens,
        )
        from ..ops.fused import (
            FIND_BATCH,
            MAX_CLIP,
            POS_CAP,
            find_positions_chunk,
            gather_mask_rows,
            sweep_positions_chunk,
            unpack_mask_bits,
        )
        from ..ops.pallas_kernel import _DTYPE_FOLD
        from ..utils.oracle import banded_distances

        buf = as_u8(corpus)
        n = len(buf)
        k = self.k
        nw = max(n - k, 0)
        p_all = self.scan_patterns.num_patterns
        uniq_positions = [np.zeros((0,), dtype=np.int64) for _ in range(p_all)]
        if nw > 0:
            fold = _DTYPE_FOLD[self.config.dp_dtype]
            backend = self._resolve_backend()
            use_kernel = backend == "pallas" and fold == FILTER_FOLD
            fmask, plens_filter, plens_dp = partition_plens(
                self._plens_static, k, "filter" if use_kernel else "dp"
            )
            dev_bound = self.device_window_bound(n)
            dev_positions = {pi: [] for pi in range(p_all)}  # np arrays
            # bound-clipped hot rows -> host oracle, per device path
            clip_ranges = {"filter": [], "dense": []}
            wf = None
            if use_kernel and dev_bound > 0:
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
                fp = self._corpus_fp(buf)
                kw_common = dict(
                    k=k, m_max=self.m_max, wf=wf, halo=halo, p_real=p_all,
                    dp_dtype=self.config.dp_dtype,
                    alphabet=self._dp_alphabet(),
                    dp_impl=self.config.dp_impl,
                    interpret=self.config.interpret,
                    # read at call time (module attr) and part of the jit
                    # static key, so a changed cap can never reuse a trace
                    # compiled for a different position-vector size
                    pos_cap=POS_CAP,
                )
                dpat_raw = jax.numpy.asarray(self._pat_raw)
                dpat = jax.numpy.asarray(self._pat)
                dbound = jax.numpy.asarray(dev_bound, dtype=np.int32)

                # Two device paths share one contract: filtration-eligible
                # patterns go through phase-1 + compaction
                # (find_positions_chunk); the rest — short patterns, high
                # k — through the dense verdict-mask sweep
                # (sweep_positions_chunk). Both resolve positions on
                # device; only clipped rows and the EOF tail remain host
                # work.
                paths = []
                if any(plens_filter):
                    paths.append(("filter", plens_filter, fmask))
                if any(plens_dp):
                    dmask = tuple(m > 0 for m in plens_dp)
                    paths.append(("dense", plens_dp, dmask))

                def collect(bits_np, rows_np, c0, sel):
                    """Append positions from a fetched bit-packed mask."""
                    for pi in range(p_all):
                        if not sel[pi]:
                            continue
                        m01 = unpack_mask_bits(bits_np, pi, len(rows_np))
                        hh, ll = np.nonzero(m01[:, :wf])
                        if len(hh):
                            dev_positions[pi].append(
                                c0 + rows_np[hh].astype(np.int64) * wf + ll
                            )

                def collect_rows(pos2, cnts, rows_np, c0, sel):
                    """Append positions from per-row device top-k
                    compaction (fused._row_topk_positions): ``pos2``
                    (nb, c) flat indices into (p, wf), ``cnts`` exact
                    per-row hit counts, ``rows_np`` the rows' global
                    staging indices. Rows with cnt > c are skipped (the
                    caller routes them through the mask fallback)."""
                    nb, c = pos2.shape
                    valid = (pos2 >= 0) & (cnts <= c)[:, None]
                    b, _s = np.nonzero(valid)
                    if not len(b):
                        return
                    v = pos2[valid].astype(np.int64)
                    pis = v // wf
                    ll = v % wf
                    base = c0 + rows_np.astype(np.int64)[b] * wf + ll
                    for pi in range(p_all):
                        if not sel[pi]:
                            continue
                        seg = base[pis == pi]
                        if len(seg):
                            dev_positions[pi].append(seg)

                def collect_batch(posmeta_like, bits, rows_np, c0, sel):
                    """One verdict-mask batch: fetch the small per-row
                    count+position vector; touch the packed mask only
                    when some row overflowed POS_CAP — the same predicate
                    the device used to decide whether to compute bits
                    (bits stays on device — np.asarray is the
                    transfer)."""
                    pm = np.asarray(posmeta_like)
                    cnts = pm[:FIND_BATCH]
                    pos2 = pm[FIND_BATCH:].reshape(FIND_BATCH, -1)
                    rows_full = np.zeros(FIND_BATCH, dtype=np.int64)
                    rows_full[: len(rows_np)] = rows_np
                    if int(cnts.max(initial=0)) > pos2.shape[1]:
                        collect(np.asarray(bits), rows_np, c0, sel)
                    else:
                        collect_rows(pos2, cnts, rows_full, c0, sel)

                def gather_batches(hot, drows, c0, sel, kw):
                    """Re-verify ``hot`` (global full hot rows, ascending)
                    via gather_mask_rows batches, all dispatched before
                    the first fetch (each fetch is a full link round
                    trip)."""
                    r_rows = drows.shape[0]
                    batches, handles = [], []
                    for b0 in range(0, len(hot), FIND_BATCH):
                        batch = hot[b0 : b0 + FIND_BATCH]
                        bidx = np.full(FIND_BATCH, r_rows, dtype=np.int32)
                        bidx[: len(batch)] = batch
                        batches.append(batch)
                        handles.append(
                            gather_mask_rows(
                                drows, jax.numpy.asarray(bidx), dpat,
                                jax.numpy.asarray(len(batch), dtype=np.int32),
                                **kw,
                            )
                        )
                    # One async-batched d2h for every batch's meta (each
                    # serial np.asarray is a full link round trip).
                    pms = jax.device_get([pm for pm, _ in handles])
                    for batch, pm_h, (_, bb) in zip(batches, pms, handles):
                        collect_batch(pm_h, bb, batch, c0, sel)

                def finish_path(name, plens, sel, drows, c0, meta, pos,
                                gpos, bits, rowmap):
                    kw = dict(kw_common, plens=plens)
                    mv = np.asarray(meta)  # host array when pre-fetched
                    fcnt = mv[: len(plens)]
                    n_hot = int(mv[len(plens)])
                    i0 = len(plens) + 1
                    idx = mv[i0 : i0 + FIND_BATCH]
                    tailcnt = mv[i0 + FIND_BATCH : i0 + 2 * FIND_BATCH]
                    cs0 = i0 + 2 * FIND_BATCH
                    clip_starts = mv[cs0 : cs0 + MAX_CLIP]
                    gcnt = mv[cs0 + MAX_CLIP :]  # sweep path: per-row
                    clip_ranges[name].extend(
                        (int(cs), min(int(cs) + wf, dev_bound))
                        for cs in clip_starts
                        if cs >= 0
                    )
                    if int(fcnt.sum()) == 0:
                        return
                    r_rows = drows.shape[0]
                    if gpos is not None and n_hot > FIND_BATCH:
                        # Dense regime on the sweep path: ONE gpos fetch
                        # replaces the tail verdicts and every gather
                        # batch; only rows past POS_CAP re-verify (via
                        # batches whose own bits fallback covers them).
                        gp = np.asarray(gpos)
                        collect_rows(
                            gp, gcnt, np.arange(r_rows, dtype=np.int64),
                            c0, sel,
                        )
                        over = np.nonzero(gcnt > gp.shape[1])[0]
                        if len(over):
                            gather_batches(over, drows, c0, sel, kw)
                        return
                    n_first = min(n_hot, FIND_BATCH)
                    if n_first > 0:
                        if int(tailcnt.max(initial=0)) > POS_CAP:
                            collect(np.asarray(bits), idx[:n_first], c0, sel)
                        else:
                            rows_full = np.zeros(FIND_BATCH, dtype=np.int64)
                            rows_full[:n_first] = idx[:n_first]
                            collect_rows(
                                np.asarray(pos), tailcnt, rows_full, c0, sel
                            )
                    if n_hot > FIND_BATCH:
                        rm = np.asarray(rowmap)
                        hot = np.nonzero(np.sum(rm, axis=1) > 0)[0]
                        full = c0 + (hot + 1) * wf <= dev_bound
                        gather_batches(
                            hot[full][FIND_BATCH:], drows, c0, sel, kw
                        )

                def flush(entries):
                    """Fetch every entry's (meta, pos) in ONE async-batched
                    d2h (``jax.device_get`` starts all copies before
                    blocking), then run the per-entry tail logic. Round 4
                    fetched each chunk's meta serially — one ~25 ms link
                    round trip per chunk per path (VERDICT r4 ask #3);
                    the conditional fetches (bits / gpos / gather batches)
                    stay lazy, they fire only on overflow."""
                    if not entries:
                        return
                    fetched = jax.device_get(
                        [(e[5], e[6]) for e in entries]
                    )
                    for e, (mv_h, pos_h) in zip(entries, fetched):
                        finish_path(
                            e[0], e[1], e[2], e[3], e[4], mv_h, pos_h,
                            e[7], e[8], e[9],
                        )

                # Dispatch chunks ahead of the fetches (async): the metas
                # and first-batch bits travel while the device is still
                # scanning later chunks. The window bounds how many chunks'
                # staging rows stay referenced at once; on overflow the
                # OLDER half flushes in one batched fetch while the newer
                # half keeps computing.
                ahead = 4 * max(1, len(paths))
                pending = []
                for c0 in range(0, dev_bound, chunk_win):
                    drows = self._staged_rows(buf, fp, c0, n_rows, wf, halo)
                    dc0 = jax.numpy.asarray(c0, dtype=np.int32)
                    for name, plens, sel in paths:
                        # n_batch mirrors the module constant so the host
                        # meta parse and the kernels' static layout can't
                        # drift (and tests can shrink it).
                        kw = dict(kw_common, plens=plens,
                                  n_batch=FIND_BATCH)
                        if name == "filter":
                            meta, pos, bits, rowmap = find_positions_chunk(
                                drows, dpat_raw, dpat, dbound, dc0, **kw
                            )
                            gpos = None
                        else:
                            meta, pos, gpos, bits, rowmap = (
                                sweep_positions_chunk(
                                    drows, dpat, dbound, dc0, **kw
                                )
                            )
                        pending.append(
                            (name, plens, sel, drows, c0, meta, pos, gpos,
                             bits, rowmap)
                        )
                    if len(pending) > ahead:
                        half = max(1, len(pending) // 2)
                        flush(pending[:half])
                        del pending[:half]
                flush(pending)
            for pi, raw in enumerate(self.scan_patterns.raw):
                pat = np.frombuffer(raw, np.uint8)
                if use_kernel and dev_bound > 0:
                    # device mask positions + clipped rows + the EOF tail
                    ranges = list(
                        clip_ranges["filter" if fmask[pi] else "dense"]
                    )
                    if dev_bound < nw:
                        ranges.append((dev_bound, nw))
                elif use_kernel:
                    ranges = [(0, nw)]  # corpus shorter than one window row
                else:
                    ranges = [(0, nw)]  # full oracle sweep (XLA backend)
                found = list(dev_positions[pi])
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
                    np.concatenate(found).astype(np.int64)
                    if found
                    else np.zeros((0,), dtype=np.int64)
                )
                # Segments are generated ascending and disjoint (chunks in
                # order, rows ascending within a chunk, the <= 1 clipped
                # row and the EOF tail last and past all device windows),
                # so the concatenation is normally already sorted-unique —
                # checking is O(n), the sort it avoids dominated dense
                # sweeps (measured 3.4 s on 4.2M positions).
                if len(pos) > 1 and not np.all(pos[1:] > pos[:-1]):
                    pos = np.unique(pos)
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

    def count_stream(
        self,
        chunks,
        *,
        segment_bytes: Optional[int] = None,
    ) -> np.ndarray:
        """Scan a corpus delivered incrementally, without materializing it.

        ``chunks`` is any iterable of byte chunks (a socket reader, a pipe,
        a generator over an object store…). Counts are identical to
        ``count(b"".join(chunks))`` — including the reference's
        EOF-truncation quirk, which is only applied at the true end of the
        stream — while peak memory stays at one segment
        (``segment_bytes``, default ``config.chunk_bytes``) plus the
        ``m_max - 1 + k`` carry bytes that windows straddling a segment
        boundary need.

        Exactness without a range-scan kernel: for a working buffer ``B``
        the mid-stream segment owns windows ``[0, hi)`` with
        ``hi = device_window_bound(len(B))`` (every such window is
        untruncated and provably below the final ``n - k`` bound), and

            counts[0, hi) == count(B) - count(B[hi:])

        because ``count`` applies the same EOF-truncation semantics to the
        identical trailing windows of both calls — the wrong-mid-stream
        tail counts cancel bit-exactly. The suffix re-scan costs one
        ``m_max - 1 + k``-byte host pass per segment, noise next to the
        segment scan. The reference slurps the whole file up front
        (``src/utils.c:12-68``) and has no streaming story.
        """
        p = self.patterns.num_patterns
        total = np.zeros((p,), dtype=np.int64)
        seg = int(segment_bytes or self.config.chunk_bytes)
        seg = max(seg, 4 * max(self.m_max + self.k, 1))
        # Segments are never re-scanned, so route them through a sibling
        # scanner with the device-corpus cache off — otherwise every
        # segment's staged rows would churn the byte-bounded LRU and evict
        # hot resident corpora served by concurrent count() calls. The
        # sibling shares the compiled kernels (jit caches by shape), so
        # this costs nothing.
        sib = getattr(self, "_stream_scanner", None)
        if sib is None and self.config.cache_corpus:
            from dataclasses import replace

            sib = self._stream_scanner = Scanner(
                list(self.patterns.raw),
                self.k,
                replace(self.config, cache_corpus=False, prewarm_bytes=None),
            )
        count = sib.count if sib is not None else self.count
        parts, pending = [], 0  # buffered chunks (one concat per segment)
        for chunk in chunks:
            b = as_u8(chunk)
            if len(b) == 0:
                continue
            parts.append(b)
            pending += len(b)
            while pending >= seg:
                carry = (
                    np.concatenate(parts) if len(parts) > 1 else parts[0]
                )
                hi = self.device_window_bound(len(carry))
                if hi <= 0:
                    parts, pending = [carry], len(carry)
                    break
                total += count(carry)
                total -= count(carry[hi:])
                parts, pending = [carry[hi:]], len(carry) - hi
        if pending:
            total += count(
                np.concatenate(parts) if len(parts) > 1 else parts[0]
            )
        return total

    def count_batch(self, corpora: Sequence[Bytes]) -> np.ndarray:
        """Scan MANY corpora in one device dispatch: (B, P) counts.

        Semantics are exactly ``np.stack([count(c) for c in corpora])``,
        but per-call dispatch latency (~30-40 ms over a tunneled link) is
        paid once for the whole batch instead of once per corpus: every
        corpus's windows are laid out in a shared virtual window space and
        scanned by ONE banded-DP kernel sweep with per-block bounds
        (:func:`apm.ops.pallas_kernel.scan_folded_pallas_batch`); the
        per-block count output is split back per corpus host-side. The
        serving analog the reference lacks entirely (its unit of work is
        one process launch per database, ``src/main.c:30-60``).

        Engine: eligible k = 0 batches route through the MXU correlation
        engine (``apm.ops.corr_engine.scan_corr_batch``, same per-block
        contract) — batch serving is exactly the many-pattern regime
        where the banded kernel is weakest (155 MB/s at P = 64 vs corr's
        2.2 GB/s, DESIGN.md §8; the reference's analog is one CUDA thread
        per pattern, ``src/database_over_ranks.cu:26-29``). Everything
        else uses the banded kernel; filtration stays out of batch mode —
        its win is on large corpora, which belong in :meth:`count`.
        """
        from ..ops.common import fold_corpus
        from ..ops.corr_engine import corr_eligible
        from ..ops.pallas_kernel import _DTYPE_FOLD, scan_folded_pallas_batch

        bufs = [as_u8(c) for c in corpora]
        B = len(bufs)
        p_out = self.patterns.num_patterns
        out = np.zeros((B, p_out), dtype=np.int64)
        if B == 0:
            return out
        backend = self._resolve_backend()
        if backend != "pallas":
            for b, buf in enumerate(bufs):
                out[b] = self.count(buf)
            return out

        from .pipeline import check_dp_dtype

        check_dp_dtype(
            jax.devices()[0].platform,
            self.config.dp_dtype,
            self.config.interpret,
        )
        k = self.k
        fold = _DTYPE_FOLD[self.config.dp_dtype]
        n_max = max(len(b) for b in bufs)
        w = round_up(self.block_windows_for(n_max), fold * 128)
        wf = w // fold
        halo = round_up(self.m_max + 2 * k, 128)
        p_pad = self._pat.shape[0]

        # (corpus, block) work items in a shared virtual window space;
        # each corpus's own bound masks its final partial block.
        items = []  # (corpus index, block index, dev_bound)
        bounds = []
        for b, buf in enumerate(bufs):
            db = self.device_window_bound(len(buf))
            bounds.append(db)
            for blk in range((db + w - 1) // w if db > 0 else 0):
                items.append((b, blk, db))

        # k = 0 batches with a conv-sized alphabet ride the MXU; the
        # "auto" crossover keeps tiny short-pattern sets on the banded
        # kernel, where the conv's fixed encode cost dominates.
        use_corr = (
            k == 0
            and self.config.engine in ("auto", "corr")
            and corr_eligible(
                self._plens_static,
                len(self._corr_alphabet()),
                self.m_max,
                0,
                auto=self.config.engine == "auto",
            )
        )
        if self.config.engine == "corr" and not use_corr:
            # Same forced-engine contract as count() (pipeline.make_plan):
            # an ineligible scan raises instead of silently routing to the
            # banded kernel (ADVICE r3 #4).
            from ..ops.corr_engine import ALPHABET_MAX, M_MAX_CORR

            raise ValueError(
                "engine='corr' requires the pallas backend, k == 0, a "
                f"pattern alphabet of <= {ALPHABET_MAX} distinct bytes, "
                f"and m_max <= {M_MAX_CORR}"
            )
        uniq = np.zeros((B, p_pad), dtype=np.int64)
        if items:
            # One compiled shape: groups padded to a fixed block bucket.
            # Groups are dispatched back-to-back and fetched afterwards, so
            # a moderate bucket lets host staging + h2d transfer of group
            # g+1 overlap the kernel on group g (capped well below
            # chunk_bytes: transfer, not VMEM, is the batch bottleneck).
            rows_bytes = fold * (wf + halo)
            cap = self.config.batch_blocks or 128
            gmax = max(
                8,
                min(
                    len(items),
                    cap,
                    self.config.chunk_bytes // rows_bytes,
                ),
            )
            # pow2 bucket, rounded DOWN so the user's batch_blocks cap and
            # the chunk_bytes staging bound are never exceeded.
            gmax = max(8, 1 << (gmax.bit_length() - 1))
            dpat = jax.numpy.asarray(self._pat)
            if use_corr:
                from ..ops.corr_engine import _group_rows, scan_corr_batch

                batch_fused = self._use_fused_corr(wf, halo)
                if batch_fused:
                    from ..ops.corr_fused import batch_owner, pick_s

                    km_np, fthr_np = self._corr_fused_tables()
                    s_ph = pick_s(self.m_max)
                    fp_slots = km_np.shape[1] // s_ph
                    dkm = jax.numpy.asarray(km_np)
                    dfthr = jax.numpy.asarray(fthr_np)
                    downer = jax.numpy.asarray(
                        batch_owner(fp_slots, s_ph)
                    )
                else:
                    kern_np, thr_np, corr_stride = self._corr_kernel()
                    dkern = jax.numpy.asarray(kern_np)
                    dthr = jax.numpy.asarray(thr_np)
                    corr_g_rows = _group_rows(
                        wf + halo, len(self._corr_alphabet()), gmax * fold
                    )
                dalph = jax.numpy.asarray(self._corr_alphabet())
                row_in_blk = np.arange(fold, dtype=np.int64) * wf
            handles = []  # (group items, device counts handle)
            for g0 in range(0, len(items), gmax):
                group = items[g0 : g0 + gmax]
                rows = np.zeros((gmax * fold, wf + halo), dtype=np.uint8)
                meta = np.zeros((gmax, 2), dtype=np.int32)
                limits = np.zeros((gmax * fold,), dtype=np.int32)
                for slot, (b, blk, db) in enumerate(group):
                    rows[slot * fold : (slot + 1) * fold] = fold_corpus(
                        bufs[b], blk * w, fold, wf, halo
                    )
                    meta[slot, 0] = db  # bound (virtual base 0 per corpus)
                    meta[slot, 1] = blk * w  # this block's start
                    if use_corr:
                        limits[slot * fold : (slot + 1) * fold] = np.clip(
                            db - blk * w - row_in_blk, 0, wf
                        )
                if use_corr and batch_fused:
                    from ..ops.corr_engine import n_bitplanes
                    from ..ops.corr_fused import pick_g, scan_corr_batch_fused

                    l128 = (wf + halo) // 128
                    cnts = scan_corr_batch_fused(
                        jax.numpy.asarray(rows), dkm, dfthr, downer,
                        dalph, jax.numpy.asarray(limits),
                        wf=wf, l128=l128, fold=fold,
                        g=pick_g(rows.shape[0], l128, fp_slots),
                        p=fp_slots,
                        c_alpha=len(self._corr_alphabet()),
                        b_planes=n_bitplanes(len(self._corr_alphabet())),
                        s_ph=s_ph, interpret=self.config.interpret,
                        p_out=p_pad,
                    )
                elif use_corr:
                    cnts = scan_corr_batch(
                        jax.numpy.asarray(rows), dkern, dthr, dalph,
                        jax.numpy.asarray(limits),
                        wf=wf, fold=fold, g_rows=corr_g_rows,
                        stride=corr_stride, p_out=p_pad,
                    )
                else:
                    cnts = scan_folded_pallas_batch(
                        jax.numpy.asarray(rows), dpat,
                        jax.numpy.asarray(meta),
                        k=k, m_max=self.m_max, wf=wf, halo=halo,
                        plens=self._plens_static,
                        dp_dtype=self.config.dp_dtype,
                        alphabet=self._dp_alphabet(),
                        dp_impl=self.config.dp_impl,
                        interpret=self.config.interpret,
                    )
                handles.append((group, cnts))
            # One fetch for every group's counts (a fetch is a link RT).
            allc = np.asarray(
                jax.numpy.stack([c for _, c in handles])
            )  # (G, gmax, p_pad)
            for gi, (group, _) in enumerate(handles):
                for slot, (b, blk, db) in enumerate(group):
                    uniq[b] += allc[gi, slot]

        for b, buf in enumerate(bufs):
            uniq[b, : self.scan_patterns.num_patterns] += self.tail_counts(
                buf, bounds[b]
            )
        for b in range(B):
            out[b] = uniq[b, : self.scan_patterns.num_patterns][self._inverse]
        return out

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

            # The corr engine's throughput is flat in P (DESIGN §8), so
            # pattern sharding would replicate the corpus encode per
            # device for nothing. Derive the gate from make_plan itself
            # (not a hand-mirrored eligibility test): round 4's mirror
            # omitted the DP-fold gate (`fold != FILTER_FOLD` forces
            # engine='dp'), pinning database sharding while the banded
            # DP — not flat in P — actually ran (ADVICE r4 #1).
            flat_p = False
            if self.k == 0 and self._resolve_backend() == "pallas":
                from .pipeline import make_plan

                flat_p = make_plan(self, n).use_corr
            strategy = choose_strategy(
                n,
                self.m_max,
                self.scan_patterns.num_patterns,
                self.k,
                n_dev,
                flat_p_engine=flat_p,
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
