"""Configuration for the scan pipeline.

Replaces the reference's three config tiers (compile-time ``-D`` flags,
``OMP_NUM_THREADS``, CLI positionals + trailing strategy word — SURVEY.md §5)
with one dataclass.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass
class ApmConfig:
    # Backend for the per-block scan: "pallas" (TPU kernel), "xla" (pure jnp,
    # portable — also the CPU / interpret-mode path), or "auto".
    backend: str = "auto"
    # Run the Pallas kernel in interpreter mode (the fake-backend analog of the
    # reference's TESTPERFORMANCE_NO_LEVENSHTEIN stub, utils.c:77-79).
    interpret: bool = False
    # Windows per kernel block (lane-dim width). Must be a multiple of 128.
    block_windows: int = 8192
    # Corpus bytes handed to one jitted chunk invocation (host-side loop unit).
    chunk_bytes: int = 1 << 22
    # Distribution strategy across devices: "auto", "database_over_devices"
    # (shard the window axis, halo + psum — reference strategy B),
    # "patterns_over_devices" (shard the pattern axis — reference strategy A),
    # or "single" (no sharding).
    strategy: str = "auto"
    # Emit per-phase timing info (reference APM_INFO analog).
    verbose: bool = False
    # Optional cap on devices used (None = all visible).
    max_devices: Optional[int] = None

    def validate(self) -> "ApmConfig":
        if self.backend not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown backend {self.backend!r}")
        if self.strategy not in (
            "auto",
            "single",
            "database_over_devices",
            "patterns_over_devices",
        ):
            raise ValueError(f"unknown strategy {self.strategy!r}")
        if self.block_windows % 128 != 0 or self.block_windows <= 0:
            raise ValueError("block_windows must be a positive multiple of 128")
        return self
