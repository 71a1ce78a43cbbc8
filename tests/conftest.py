"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Must run before jax is imported anywhere (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The env var alone is not enough on this image (a TPU platform plugin still
# wins the backend election); the config update below forces CPU reliably.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REF_DNA = "/root/reference/dna"


def _ref(name: str) -> str:
    return os.path.join(REF_DNA, name)


@pytest.fixture(scope="session")
def dna_dir():
    if not os.path.isdir(REF_DNA):
        pytest.skip("reference dna corpus not available")
    return REF_DNA


@pytest.fixture(scope="session")
def easy_fa(dna_dir):
    return np.fromfile(_ref("easy.fa"), dtype=np.uint8)


@pytest.fixture(scope="session")
def small_chry(dna_dir):
    return np.fromfile(_ref("small_chrY.fa"), dtype=np.uint8)


@pytest.fixture(scope="session")
def x100(dna_dir):
    return np.fromfile(_ref("small_chrY_x100.fa"), dtype=np.uint8)


@pytest.fixture(scope="session")
def pattern_20783(dna_dir):
    return open(_ref("line_20783.fa"), "rb").read()


@pytest.fixture(scope="session")
def pattern_nonexistent(dna_dir):
    return open(_ref("line_non_existent.fa"), "rb").read()


def random_dna(n: int, seed: int, alphabet: bytes = b"ACGT\n") -> np.ndarray:
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(alphabet, dtype=np.uint8)
    return alpha[rng.integers(0, len(alpha), size=n)]
