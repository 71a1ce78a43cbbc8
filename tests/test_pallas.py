"""Pallas kernel conformance (interpreter mode) vs the NumPy golden oracle.

Interpreter mode is the fake-backend analog of the reference's
``TESTPERFORMANCE_NO_LEVENSHTEIN`` stub (``src/utils.c:77-79``) — except here
it runs the *real* recurrence, so it doubles as a correctness check of the
kernel independent of TPU hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from apm.ops.common import pad_corpus, round_up
from apm.ops.pallas_kernel import scan_corpus_pallas
from apm.utils.io import PatternSet
from apm.utils.oracle import as_u8, count_matches
from tests.conftest import random_dna


def pallas_counts(corpus, patterns, k, w=512, start=0, n_override=None):
    ps = PatternSet.from_patterns(patterns)
    pat, plen = ps.packed(k)
    p_pad = max(8, round_up(ps.num_patterns, 8))
    pat2 = np.zeros((p_pad, pat.shape[1]), np.uint8)
    pat2[: pat.shape[0]] = pat
    plen2 = np.zeros((p_pad,), np.int32)
    plen2[: plen.shape[0]] = plen
    buf = as_u8(corpus)
    n = len(buf) if n_override is None else n_override
    m_max = ps.max_len
    halo = round_up(m_max, 128)
    n_pad = max(round_up(max(n - k - start, 0), w), w)
    padded = pad_corpus(buf, n_pad, halo)
    out = scan_corpus_pallas(
        jnp.asarray(padded),
        jnp.asarray(pat2),
        jnp.asarray(plen2),
        jnp.asarray(n, jnp.int32),
        jnp.asarray(start, jnp.int32),
        k=k,
        m_max=m_max,
        w=w,
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
    assert pallas_counts(b"123123123456456", [b"123", b"456", b"78934"], 0, w=128) == [3, 2, 0]


def test_pallas_x100_k0_readme(x100, pattern_20783, pattern_nonexistent):
    pats = [pattern_nonexistent] + [pattern_20783] * 5
    assert pallas_counts(x100, pats, 0, w=4096) == [0, 4, 4, 4, 4, 4]


@pytest.mark.parametrize("k", [0, 1, 3])
def test_pallas_eof_truncation(k):
    corpus = random_dna(300, seed=99, alphabet=b"AB")
    pats = [random_dna(50, seed=1, alphabet=b"AB"), b"AB"]
    assert pallas_counts(corpus, pats, k, w=128) == count_matches(corpus, pats, k)


def test_pallas_block_width_invariance():
    corpus = random_dna(900, seed=3)
    pats = [random_dna(20, seed=4), random_dna(5, seed=5)]
    want = count_matches(corpus, pats, 2)
    for w in [128, 256, 512]:
        assert pallas_counts(corpus, pats, 2, w=w) == want


def test_pallas_start_offset():
    """Global start offset: a tail shard counts exactly the tail windows."""
    from apm.utils.oracle import banded_distances

    corpus = random_dna(600, seed=11)
    pats = [random_dna(10, seed=12)]
    k = 1
    start = 256
    dists = banded_distances(corpus, pats[0], k)
    want_tail = int(np.sum(dists[start:] <= k))
    tail = pallas_counts(
        corpus[start:], pats, k, w=128, start=start, n_override=len(corpus)
    )
    assert tail[0] == want_tail


def test_pallas_shard_decomposition():
    """Two shards with correct ownership must sum to the full count."""
    corpus = random_dna(700, seed=21)
    pats = [random_dna(12, seed=22), random_dna(30, seed=23)]
    k = 2
    full = count_matches(corpus, pats, k)
    s = 384  # windows owned by shard 0
    m_max = 30
    halo = round_up(m_max, 128)
    shard0 = corpus[: s + halo]
    shard1 = corpus[s:]
    c0 = pallas_counts(shard0, pats, k, w=128, start=0, n_override=len(corpus))
    c1 = pallas_counts(shard1, pats, k, w=128, start=s, n_override=len(corpus))
    # shard0 scans windows [0, s) only if we clamp... window validity comes
    # from n - k, so shard0 must be fed exactly s padded windows:
    ps = PatternSet.from_patterns(pats)
    pat, plen = ps.packed(k)
    p_pad = 8
    pat2 = np.zeros((p_pad, pat.shape[1]), np.uint8)
    pat2[: pat.shape[0]] = pat
    plen2 = np.zeros((p_pad,), np.int32)
    plen2[: plen.shape[0]] = plen
    padded0 = np.zeros(s + halo, np.uint8)
    padded0[: len(shard0)] = shard0
    out0 = scan_corpus_pallas(
        jnp.asarray(padded0), jnp.asarray(pat2), jnp.asarray(plen2),
        jnp.asarray(len(corpus), jnp.int32), jnp.asarray(0, jnp.int32),
        k=k, m_max=m_max, w=128, halo=halo, interpret=True,
    )
    got = [int(a + b) for a, b in zip(np.asarray(out0)[:2], c1)]
    assert got == full
