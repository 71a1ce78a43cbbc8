"""Shared helpers for the scan engines."""

from __future__ import annotations

import numpy as np


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cap_for(k: int) -> int:
    """DP clamp value. ``min(dist, k+1)`` preserves the ``dist <= k`` verdict.

    Clamping commutes with the min-plus Levenshtein recurrence: if every input
    cell holds ``min(true, k+1)``, then ``min(min3(inputs)+cost, k+1)`` equals
    ``min(true_output, k+1)`` — proved by monotonicity of min/plus. This keeps
    every DP cell in ``[0, k+1]`` regardless of pattern length.
    """
    return k + 1


def pad_corpus(buf: np.ndarray, n_pad: int, halo: int) -> np.ndarray:
    """Zero-pad the corpus to ``n_pad + halo`` bytes (device block layout)."""
    out = np.zeros(n_pad + halo, dtype=np.uint8)
    out[: len(buf)] = buf
    return out
