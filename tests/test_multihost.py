"""Multi-host feeder exercised in single-process mode on the virtual mesh.

``count_multihost`` stages per-device shards straight from the file (never
materializing the corpus on any host) and assembles the global array with
``make_array_from_single_device_arrays`` — in single-process mode that is
bit-identical plumbing to a real multi-host run minus DCN.
"""

import os
import tempfile

import jax
import numpy as np
import pytest

from apm.models.scanner import Scanner
from apm.parallel.multihost import count_multihost
from apm.utils.config import ApmConfig
from apm.utils.oracle import count_matches
from tests.conftest import random_dna


@pytest.fixture(scope="module", autouse=True)
def need_8_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


@pytest.fixture()
def corpus_file():
    data = random_dna(7000, seed=55)
    with tempfile.NamedTemporaryFile(suffix=".fa", delete=False) as f:
        f.write(data.tobytes())
        path = f.name
    yield path, data
    os.unlink(path)


@pytest.mark.parametrize("backend", ["xla", "pallas"])
@pytest.mark.parametrize("k", [0, 2])
def test_multihost_vs_oracle(corpus_file, backend, k):
    path, data = corpus_file
    pats = [random_dna(m, seed=70 + m) for m in [10, 33, 50]]
    cfg = ApmConfig(
        backend=backend,
        interpret=(backend == "pallas"),
        block_windows=1024,
    )
    sc = Scanner(pats, k, cfg)
    counts = count_multihost(sc, path)
    got = [int(c) for c in counts[: len(pats)]]
    assert got == count_matches(data, pats, k)


def test_multihost_matches_single(corpus_file):
    path, data = corpus_file
    pats = [random_dna(25, seed=81)]
    cfg = ApmConfig(backend="xla", block_windows=1024, strategy="single")
    sc = Scanner(pats, 1, cfg)
    single = sc.count(data).tolist()
    multi = [int(c) for c in count_multihost(sc, path)[:1]]
    assert multi == single


def test_count_file_streams(corpus_file):
    """count_file (memmap streaming) == count (in-memory slurp)."""
    path, data = corpus_file
    pats = [random_dna(20, seed=91), random_dna(50, seed=92)]
    for backend, interp in [("xla", False), ("pallas", True)]:
        cfg = ApmConfig(backend=backend, interpret=interp, block_windows=1024)
        sc = Scanner(pats, 1, cfg)
        assert sc.count_file(path).tolist() == sc.count(data).tolist()


def test_multihost_filtration_with_plants(corpus_file):
    """File-backed filtration across the mesh: planted matches recovered."""
    from apm.utils.corpus import plant, random_pattern

    path, data = corpus_file
    pat = random_pattern(50, seed=61)
    mutable = data.copy()
    plant(mutable, pat, [500, 3000, 6500], k=2, seed=62)
    import tempfile, os as _os

    with tempfile.NamedTemporaryFile(suffix=".fa", delete=False) as f:
        f.write(mutable.tobytes())
        path2 = f.name
    try:
        cfg = ApmConfig(
            backend="pallas", interpret=True, engine="filter",
            block_windows=1024,
        )
        sc = Scanner([pat], 2, cfg)
        got = [int(c) for c in count_multihost(sc, path2)[:1]]
        want = count_matches(mutable, [pat], 2)
        assert got == want
        assert want[0] >= 3
    finally:
        _os.unlink(path2)
