"""Execution planner: the TPU analog of the reference's runtime cost model.

The reference picks between its two MPI strategies with a ratio heuristic
(``getRatio`` at ``src/main.c:21-28``, applied at ``main.c:88-139``; the
derivation lives in ``Workflow.md:100-271``): it measures how well the
pattern count divides over active ranks vs over OMP threads and runs the
strategy that wastes less. On TPU most of that decision dissolves — one
GSPMD program shards the window axis *and* vectorizes the pattern axis at
the same time — but two planning decisions remain real:

* which mesh axis to shard (windows vs patterns) when devices > 1;
* the kernel block width ``w`` (windows per grid step), which trades VMEM
  footprint against grid overhead.

Both are derived here from ``(n, m_max, P, k, n_dev)`` — statically, before
compilation, like the reference's selector (every rank computes the same
deterministic answer, ``main.c:110-114``).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ops.common import round_up


def get_ratio(x: float) -> float:
    """Literal port of the reference's waste metric (``src/main.c:21-28``).

    Doubles ``x`` until it reaches 1, then reports the overshoot. 0 means the
    division is perfectly balanced; larger means more idle capacity. Kept for
    parity/testing and for the strategy choice below.
    """
    if x <= 0:
        return float("inf")
    while x < 1:
        x *= 2
    return x - 1


def choose_strategy(n: int, m_max: int, p: int, k: int, n_dev: int) -> str:
    """Pick the mesh axis to shard. Mirrors the spirit of ``main.c:88-139``.

    The window axis has ``n - k`` elements, the pattern axis ``p``. Sharding
    windows (database_over_devices) is right whenever windows outnumber
    devices — i.e. essentially always; the halo overhead is
    ``n_dev * m_max`` bytes total. Sharding patterns only wins when the
    corpus replica cost dominates and patterns split evenly, the analog of
    the reference's ``ratioPatterns < ratioDatabase`` branch
    (``main.c:118-122``).
    """
    if n_dev <= 1:
        return "single"
    nw = max(n - k, 0)
    if nw < n_dev:  # degenerate: fewer windows than devices
        return "single"
    # Patterns-over-devices pays replication of the corpus on every device;
    # windows-over-devices pays a halo of m_max bytes per device. Patterns
    # win only if they divide perfectly AND each device still gets enough
    # windows*patterns work to saturate (tiny corpora, many patterns).
    ratio_pat = get_ratio(n_dev / p)  # reference arg order, main.c:93
    if ratio_pat == 0.0 and nw < 4 * n_dev * 1024 and p >= n_dev * 8:
        return "patterns_over_devices"
    return "database_over_devices"


def choose_block_windows(nw: int, m_max: int, p: int, k: int) -> int:
    """Kernel block width: windows per Pallas grid step.

    Larger blocks amortize grid overhead; the VMEM footprint per block is
    roughly ``p * (2k + 1) * w * 4`` bytes of live DP band (one
    ``(FOLD, w/FOLD)`` int32 tile per pattern per diagonal) plus temporaries,
    so cap ``w`` to keep the working set well inside the 16 MB of VMEM.
    ``p`` should be the number of *distinct* patterns actually scanned.
    """
    budget = 6 << 20  # DP-band budget; leaves room for temps + text tiles
    band_rows = 2 * k + 2
    p_eff = max(p, 1)
    w_cap = budget // (band_rows * p_eff * 4)
    w = min(65536, max(1024, w_cap))
    w = round_up(min(w, max(nw, 1)), 1024)
    return max(1024, w)


@dataclass(frozen=True)
class Plan:
    strategy: str
    block_windows: int
    n_dev: int

    @staticmethod
    def make(n: int, m_max: int, p: int, k: int, n_dev: int) -> "Plan":
        strategy = choose_strategy(n, m_max, p, k, n_dev)
        w = choose_block_windows(max(n - k, 0), m_max, p, k)
        return Plan(strategy=strategy, block_windows=w, n_dev=n_dev)
