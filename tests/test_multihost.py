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


@pytest.mark.parametrize("k", [0, 1])
def test_multihost_two_processes(tmp_path, k):
    """REAL multi-process run: 2 spawned processes x 4 virtual devices,
    jax.distributed over localhost — exercises the process bootstrap and
    the make_array_from_single_device_arrays cross-process assembly
    (the analog of database_over_ranks.c:119-166 multi-node semantics),
    which round 1 only ever ran single-process."""
    import socket
    import subprocess
    import sys

    from apm.utils.corpus import plant, random_pattern

    data = random_dna(6000, seed=131)
    pat = random_pattern(24, seed=132)
    if k > 0:
        plant(data, pat, [400, 2900, 5200], k=k, seed=133)
    path = str(tmp_path / "corpus.fa")
    with open(path, "wb") as f:
        f.write(data.tobytes())

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [
                sys.executable, worker, str(port), str(i), "2", path,
                str(k), outs[i], pat.tobytes().decode(),
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err

    import json

    want = count_matches(data, [pat], k)
    for i in range(2):
        with open(outs[i]) as f:
            res = json.load(f)
        assert res["process_count"] == 2
        assert res["counts"] == want, (i, res, want)
    if k > 0:
        assert want[0] >= 3


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
