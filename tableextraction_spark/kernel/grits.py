"""GriTS-style grid similarity — diagnostic metric, not a pass/fail gate.

The reference vendors the TATR evaluation harness whose GriTS metrics score
predicted vs ground-truth tables as 2D grids
(``table_extraction/transformer/src/grits.py:628-708``; cell-text reward =
LCS similarity, ``grits.py:592``; grid alignment via factored 2D-LCS,
``grits.py:559``).  This module provides the same *shape* of diagnostic for
our serialized table payloads with one documented simplification: the
factored 2D-MSS is replaced by row-sequence alignment (weighted LCS over
rows, cells paired by column index within aligned rows).  For grid tables
whose column order is stable — everything this engine emits — the two agree;
under column permutation ours is a lower bound.

Used in tests and ad-hoc debugging: span equality is the correctness gate
(exact), GriTS tells you HOW WRONG a near-miss is.
"""

from __future__ import annotations

import json


def _lcs_len(a: str, b: str) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def text_similarity(a: str, b: str) -> float:
    """2·LCS/(|a|+|b|) — the GriTS cell-content reward (grits.py:592)."""
    if not a and not b:
        return 1.0
    denom = len(a) + len(b)
    return 2.0 * _lcs_len(a, b) / denom if denom else 1.0


def grid_from_payload(payload: str) -> list[list[str]]:
    """Serialized table JSON → 2D text grid (header paths row + records)."""
    obj = json.loads(payload)
    return [list(obj["columns"])] + [list(r) for r in obj["records"]]


def _row_score(ra: list[str], rb: list[str]) -> float:
    """Sum of cell rewards, cells paired by column index."""
    return sum(text_similarity(a, b) for a, b in zip(ra, rb))


def grits_content(grid_a: list[list[str]], grid_b: list[list[str]]) -> float:
    """2·(best aligned cell reward)/(cells_a + cells_b) ∈ [0, 1]."""
    na = sum(len(r) for r in grid_a)
    nb = sum(len(r) for r in grid_b)
    if na == 0 and nb == 0:
        return 1.0
    if not grid_a or not grid_b:
        return 0.0
    # weighted LCS over row sequences (monotone alignment, no gap reward)
    h, w = len(grid_a), len(grid_b)
    dp = [[0.0] * (w + 1) for _ in range(h + 1)]
    for i in range(1, h + 1):
        for j in range(1, w + 1):
            dp[i][j] = max(
                dp[i - 1][j],
                dp[i][j - 1],
                dp[i - 1][j - 1] + _row_score(grid_a[i - 1], grid_b[j - 1]),
            )
    return 2.0 * dp[h][w] / (na + nb)


def table_similarity(payload_a: str, payload_b: str) -> float:
    """GriTS-content diagnostic between two serialized table payloads."""
    return grits_content(grid_from_payload(payload_a), grid_from_payload(payload_b))
