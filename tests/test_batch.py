"""Batched serving API: count_batch == per-corpus count, one dispatch."""

import numpy as np
import pytest

from apm.models.scanner import Scanner
from apm.utils.config import ApmConfig
from apm.utils.oracle import count_matches
from tests.conftest import random_dna

PALLAS = dict(backend="pallas", interpret=True, block_windows=1024)


@pytest.mark.parametrize("k", [0, 1, 2])
def test_count_batch_matches_oracle(k):
    from apm.utils.corpus import plant, random_pattern

    pats = [random_pattern(20, seed=401), random_pattern(33, seed=402),
            random_pattern(20, seed=401)]  # duplicate exercises dedup
    corpora = [
        random_dna(700, seed=410),   # smaller than one block
        random_dna(9000, seed=411),  # several blocks
        random_dna(15, seed=412),    # tail-only (shorter than m_max)
        np.zeros((0,), np.uint8),    # empty
        random_dna(4096, seed=413),
    ]
    if k > 0:
        plant(corpora[1], np.asarray(pats[0]), [100, 5000], k=k, seed=414)
    sc = Scanner(pats, k, ApmConfig(**PALLAS))
    got = sc.count_batch(corpora)
    assert got.shape == (5, 3)
    for b, corpus in enumerate(corpora):
        want = count_matches(corpus, pats, k)
        assert got[b].tolist() == want, (b, got[b].tolist(), want)
        assert got[b].tolist() == sc.count(corpus).tolist()


def test_count_batch_multiple_groups():
    """More blocks than one group bucket: grouping must not change counts."""
    pats = [b"ACGTACGTAC"]
    corpora = [random_dna(3000, seed=420 + i) for i in range(6)]
    cfg = ApmConfig(chunk_bytes=1 << 16, **PALLAS)  # tiny groups
    sc = Scanner(pats, 1, cfg)
    got = sc.count_batch(corpora)
    for b, corpus in enumerate(corpora):
        assert got[b].tolist() == count_matches(corpus, pats, 1)


def test_count_batch_xla_backend_fallback():
    pats = [b"GATTACA"]
    corpora = [random_dna(2000, seed=430), random_dna(100, seed=431)]
    sc = Scanner(pats, 1, ApmConfig(backend="xla", block_windows=1024))
    got = sc.count_batch(corpora)
    for b, corpus in enumerate(corpora):
        assert got[b].tolist() == count_matches(corpus, pats, 1)
