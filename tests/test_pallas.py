"""Pallas kernel conformance (interpreter mode) vs the NumPy golden oracle.

Interpreter mode is the fake-backend analog of the reference's
``TESTPERFORMANCE_NO_LEVENSHTEIN`` stub (``src/utils.c:77-79``) — except here
it runs the *real* recurrence, so it doubles as a correctness check of the
kernel independent of TPU hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apm.models.scanner import Scanner
from apm.ops.common import fold_corpus, round_up
from apm.ops.pallas_kernel import FOLD, scan_folded_pallas
from apm.utils.config import ApmConfig
from apm.utils.io import PatternSet
from apm.utils.oracle import as_u8, banded_distances, count_matches
from tests.conftest import random_dna


def pallas_counts(corpus, patterns, k, w=1024, dp_dtype="int32"):
    """Full scan semantics via the Scanner (device part + host tail)."""
    cfg = ApmConfig(
        backend="pallas",
        interpret=True,
        strategy="single",
        block_windows=w,
        dp_dtype=dp_dtype,
    )
    return Scanner(patterns, k, cfg).count(as_u8(corpus)).tolist()


def kernel_counts(corpus, patterns, k, wf, bound, start=0):
    """Raw kernel invocation: untruncated windows in [start, bound) only."""
    ps = PatternSet.from_patterns(patterns)
    pat, plen = ps.packed(k)
    p_pad = max(8, round_up(ps.num_patterns, 8))
    pat2 = np.zeros((p_pad, pat.shape[1]), np.uint8)
    pat2[: pat.shape[0]] = pat
    plen2 = np.zeros((p_pad,), np.int32)
    plen2[: plen.shape[0]] = plen
    buf = as_u8(corpus)
    m_max = ps.max_len
    halo = round_up(m_max, 128)
    nw = max(bound - start, 0)
    n_rows = max(FOLD, round_up(-(-nw // wf), FOLD))
    rows = fold_corpus(buf, start, n_rows, wf, halo)
    out = scan_folded_pallas(
        jnp.asarray(rows),
        jnp.asarray(pat2),
        jnp.asarray(plen2),
        jnp.asarray(bound, jnp.int32),
        jnp.asarray(start, jnp.int32),
        k=k,
        m_max=m_max,
        wf=wf,
        halo=halo,
        interpret=True,
    )
    return [int(c) for c in np.asarray(out)[: ps.num_patterns]]


@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_pallas_random_vs_oracle(k):
    corpus = random_dna(2000, seed=k)
    pats = [random_dna(m, seed=7 * k + m) for m in [1, 3, 8, 33, 50]]
    assert pallas_counts(corpus, pats, k) == count_matches(corpus, pats, k)


def test_pallas_easy():
    assert pallas_counts(b"123123123456456", [b"123", b"456", b"78934"], 0) == [3, 2, 0]


def test_pallas_x100_k0_readme(x100, pattern_20783, pattern_nonexistent):
    pats = [pattern_nonexistent] + [pattern_20783] * 5
    assert pallas_counts(x100, pats, 0, w=8192) == [0, 4, 4, 4, 4, 4]


@pytest.mark.parametrize("k", [0, 1, 3])
def test_pallas_eof_truncation(k):
    """Device bound + host tail must reproduce the EOF truncation quirk."""
    corpus = random_dna(300, seed=99, alphabet=b"AB")
    pats = [random_dna(50, seed=1, alphabet=b"AB"), b"AB"]
    assert pallas_counts(corpus, pats, k) == count_matches(corpus, pats, k)


def test_pallas_block_width_invariance():
    corpus = random_dna(9000, seed=3)
    pats = [random_dna(20, seed=4), random_dna(5, seed=5)]
    want = count_matches(corpus, pats, 2)
    for w in [1024, 2048, 4096]:
        assert pallas_counts(corpus, pats, 2, w=w) == want


def test_pallas_k_exceeds_pattern_len():
    """k >= m: every window within the bound matches."""
    corpus = random_dna(500, seed=8)
    pats = [b"ACG"]
    assert pallas_counts(corpus, pats, 5) == count_matches(corpus, pats, 5)


def test_pallas_corpus_shorter_than_pattern():
    corpus = b"ACGTACGT"
    pats = [random_dna(50, seed=2), b"ACGT"]
    for k in [0, 2]:
        assert pallas_counts(corpus, pats, k) == count_matches(corpus, pats, k)


@pytest.mark.parametrize("dp_dtype", ["int16", "int8"])
@pytest.mark.parametrize("k", [0, 1, 4])
def test_pallas_narrow_dtypes(dp_dtype, k):
    """int16/int8 DP cells: exact <= k verdict (clamping commutes)."""
    corpus = random_dna(3000, seed=5 * k + 1)
    pats = [random_dna(m, seed=30 + m) for m in [2, 9, 33, 50]]
    got = pallas_counts(corpus, pats, k, w=4096, dp_dtype=dp_dtype)
    assert got == count_matches(corpus, pats, k)


def test_dedup_patterns_expansion():
    """Duplicate patterns share one scan; expanded counts match the oracle."""
    corpus = random_dna(1500, seed=44)
    a, b = random_dna(20, seed=45), random_dna(7, seed=46)
    pats = [a, b, a, a, b]
    for dedup in (True, False):
        cfg = ApmConfig(
            backend="pallas", interpret=True, strategy="single",
            block_windows=1024, dedup_patterns=dedup,
        )
        sc = Scanner(pats, 1, cfg)
        assert sc.count(corpus).tolist() == count_matches(corpus, pats, 1)
        if dedup:
            assert sc.scan_patterns.num_patterns == 2


def test_kernel_start_offset():
    """Global start offset: a tail shard counts exactly its own windows."""
    corpus = random_dna(600, seed=11)
    pats = [random_dna(10, seed=12)]
    k = 1
    start = 256
    bound = len(corpus) - 10 + 1  # untruncated windows only
    dists = banded_distances(corpus, pats[0], k)
    want = int(np.sum(dists[start:bound] <= k))
    assert kernel_counts(corpus, pats, k, wf=128, bound=bound, start=start) == [want]


def test_kernel_shard_decomposition():
    """Two shards with exact ownership must sum to the full device count."""
    corpus = random_dna(4000, seed=21)
    pats = [random_dna(12, seed=22), random_dna(30, seed=23)]
    k = 2
    bound = len(corpus) - 30 + 1
    full = kernel_counts(corpus, pats, k, wf=128, bound=bound, start=0)
    s = 2048  # shard boundary (multiple of FOLD * wf)
    c0 = kernel_counts(corpus, pats, k, wf=128, bound=min(s, bound), start=0)
    c1 = kernel_counts(corpus, pats, k, wf=128, bound=bound, start=s)
    assert [a + b for a, b in zip(c0, c1)] == full


def test_warmup_compiles_then_counts():
    """warmup() pre-compiles the exact shapes the scan will use."""
    corpus = random_dna(5000, seed=71)
    pats = [random_dna(50, seed=72), b"ACG"]
    cfg = ApmConfig(backend="pallas", interpret=True, strategy="single")
    sc = Scanner(pats, 1, cfg)
    sc.warmup(len(corpus))
    assert sc.count(corpus).tolist() == count_matches(corpus, pats, 1)


def test_prewarm_background_thread():
    """prewarm_bytes compiles on a daemon thread; counts stay correct
    whether the scan races the prewarm or waits for it."""
    corpus = random_dna(5000, seed=73)
    pats = [random_dna(50, seed=74), b"ACG"]
    cfg = ApmConfig(
        backend="pallas",
        interpret=True,
        strategy="single",
        prewarm_bytes=len(corpus),
    )
    sc = Scanner(pats, 1, cfg)
    # race the prewarm deliberately: count() must be correct regardless
    racing = sc.count(corpus).tolist()
    assert sc.prewarm_join(timeout=120.0)
    assert racing == count_matches(corpus, pats, 1)
    assert sc.count(corpus).tolist() == count_matches(corpus, pats, 1)


def test_prewarm_join_without_prewarm():
    sc = Scanner([b"ACG"], 0, ApmConfig(backend="xla"))
    assert sc.prewarm_join() is True


def test_jit_cache_collapses_when_myers_off():
    """Pattern sets with identical length multisets but different BYTES must
    share one compile whenever the bit-parallel mode is off (the classic
    band never reads pattern bytes at trace time) — the static ``alphabet``
    arg is normalized to () outside the jit (ADVICE r2 #1)."""
    from apm.ops.pallas_kernel import (
        _scan_folded_pallas_unrolled,
        scan_folded_pallas_unrolled,
    )

    k = 0  # k = 0 is always Myers-ineligible
    wf, halo = 256, 128
    rows = jnp.zeros((FOLD, wf + halo), jnp.uint8)
    before = _scan_folded_pallas_unrolled._cache_size()
    outs = []
    for pat_bytes in (b"GATTACA!", b"CCCTTTAA"):
        pat = np.zeros((8, 8 + 2 * k), np.uint8)
        pat[0, :8] = np.frombuffer(pat_bytes, np.uint8)
        alphabet = tuple(sorted(set(pat_bytes)))
        outs.append(
            np.asarray(
                scan_folded_pallas_unrolled(
                    rows, jnp.asarray(pat), jnp.int32(0), jnp.int32(0),
                    k=k, m_max=8, wf=wf, halo=halo,
                    plens=(8,) + (0,) * 7, alphabet=alphabet,
                    interpret=True,
                )
            )
        )
    assert _scan_folded_pallas_unrolled._cache_size() == before + 1
    # And dp_impl auto/myers collapse onto one entry when the mode is ON.
    k = 4
    for impl in ("auto", "myers"):
        pat = np.zeros((8, 16 + 2 * k), np.uint8)
        pat[0, :16] = np.frombuffer(b"GATTACAGGATTACAG", np.uint8)
        scan_folded_pallas_unrolled(
            jnp.zeros((FOLD, wf + halo), jnp.uint8), jnp.asarray(pat),
            jnp.int32(0), jnp.int32(0),
            k=k, m_max=16, wf=wf, halo=halo, plens=(16,) + (0,) * 7,
            alphabet=(65, 67, 71, 84), dp_impl=impl, interpret=True,
        )
    assert _scan_folded_pallas_unrolled._cache_size() == before + 2
