"""XLA engine conformance vs the NumPy golden oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from apm.models.scanner import Scanner, scan_counts
from apm.ops.common import pad_corpus, round_up
from apm.ops.xla_engine import scan_block_xla, scan_corpus_xla
from apm.utils.config import ApmConfig
from apm.utils.io import PatternSet
from apm.utils.oracle import as_u8, count_matches
from tests.conftest import random_dna


def xla_counts(corpus, patterns, k, v=512):
    ps = PatternSet.from_patterns(patterns)
    pat, plen = ps.packed(k)
    n = len(corpus)
    m_max = ps.max_len
    n_pad = max(round_up(max(n - k, 0), v), v)
    buf = pad_corpus(as_u8(corpus), n_pad, m_max)
    out = scan_corpus_xla(
        jnp.asarray(buf),
        jnp.asarray(pat),
        jnp.asarray(plen),
        jnp.asarray(n, jnp.int32),
        k=k,
        m_max=m_max,
        v=v,
    )
    return [int(c) for c in np.asarray(out)[: ps.num_patterns]]


@pytest.mark.parametrize("k", [0, 1, 2, 4])
def test_xla_random_vs_oracle(k):
    corpus = random_dna(1000, seed=k)
    pats = [random_dna(m, seed=7 * k + m) for m in [1, 3, 8, 33]]
    assert xla_counts(corpus, pats, k) == count_matches(corpus, pats, k)


def test_xla_easy():
    assert xla_counts(b"123123123456456", [b"123", b"456", b"78934"], 0) == [3, 2, 0]


@pytest.mark.parametrize("k", [0, 2])
def test_xla_x100(x100, pattern_20783, pattern_nonexistent, k):
    pats = [pattern_nonexistent] + [pattern_20783] * 2
    assert xla_counts(x100, pats, k, v=4096) == count_matches(x100, pats, k)


def test_xla_x100_k0_readme(x100, pattern_20783, pattern_nonexistent):
    pats = [pattern_nonexistent] + [pattern_20783] * 5
    assert xla_counts(x100, pats, 0, v=4096) == [0, 4, 4, 4, 4, 4]


@pytest.mark.parametrize("k", [0, 1, 3])
def test_xla_eof_truncation(k):
    """Blocks ending past EOF + truncated windows: padding must not leak."""
    corpus = random_dna(300, seed=99, alphabet=b"AB")
    pats = [random_dna(50, seed=1, alphabet=b"AB"), b"AB"]
    assert xla_counts(corpus, pats, k, v=128) == count_matches(corpus, pats, k)


def test_xla_block_boundaries():
    """Counts must be invariant to the chunk width v (window ownership)."""
    corpus = random_dna(777, seed=3)
    pats = [random_dna(20, seed=4), random_dna(5, seed=5)]
    want = count_matches(corpus, pats, 2)
    for v in [128, 256, 1024]:
        assert xla_counts(corpus, pats, 2, v=v) == want


def test_scanner_api_xla(x100, pattern_20783, pattern_nonexistent):
    cfg = ApmConfig(backend="xla", strategy="single", block_windows=4096)
    sc = Scanner([pattern_nonexistent] + [pattern_20783] * 5, k=0, config=cfg)
    got = sc.count(x100)
    assert got.tolist() == [0, 4, 4, 4, 4, 4]
    assert sc.last_duration is not None


def test_scan_counts_functional():
    cfg = ApmConfig(backend="xla", strategy="single", block_windows=128)
    assert scan_counts(b"123123123456456", [b"123", b"456", b"78934"], 0, cfg) == [3, 2, 0]


def test_block_scan_unit():
    """scan_block_xla in isolation: one block, absolute offsets honored."""
    corpus = np.frombuffer(b"ABABABAB", np.uint8)
    ps = PatternSet.from_patterns([b"AB"])
    pat, plen = ps.packed(0)
    # block covering windows [4, 8) of the corpus: text = corpus[4:4+4+2]
    text = np.zeros(4 + 2, np.uint8)
    text[:4] = corpus[4:8]
    out = scan_block_xla(
        jnp.asarray(text),
        jnp.asarray(pat),
        jnp.asarray(plen),
        jnp.asarray(4, jnp.int32),
        jnp.asarray(8, jnp.int32),
        k=0,
        m_max=2,
    )
    # windows 4..7: "AB","BA","AB","B(EOF size1->'B' vs 'A')" -> matches at 4,6
    assert int(out[0]) == 2
