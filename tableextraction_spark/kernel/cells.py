"""Cell construction from the snapped node grid.

Reference: ``table_extraction/detection.py:501-604`` (``get_cells``) — for
each node, scan right for the nearest x' and down for the nearest y' such
that the other three corners exist, producing minimal cells; merged (spanning)
cells fall out naturally where interior nodes are absent.  We add one
robustness check the reference gets implicitly from Hough evidence: each
candidate cell's four edges must actually be covered by ink on the binarized
page (≥``EDGE_COVER`` fraction dark within a ±``band``-px band), so phantom
cells cannot form across gaps that merely share grid coordinates.

Output cells are sorted in reading order (y1, x1) — ``detection.py:601-602``.
"""

from __future__ import annotations

import numpy as np

EDGE_COVER = 0.85


def _edge_dark_h(ink: np.ndarray, y: int, x1: int, x2: int, band: int) -> bool:
    h, w = ink.shape
    y0, y1b = max(0, y - band), min(h, y + band + 1)
    x1c, x2c = max(0, x1), min(w, x2 + 1)
    if x2c <= x1c:
        return False
    seg = ink[y0:y1b, x1c:x2c].any(axis=0)
    return seg.mean() >= EDGE_COVER


def _edge_dark_v(ink: np.ndarray, x: int, y1: int, y2: int, band: int) -> bool:
    return _edge_dark_h(ink.T, x, y1, y2, band)


def cells_from_nodes(nodes: np.ndarray, ink: np.ndarray, band: int = 2) -> np.ndarray:
    """nodes int32[K,2] + page ink mask → cells int32[C,4] (x1,y1,x2,y2).

    Minimal-cell scan over the sorted unique grid coordinates; edge coverage
    validated against ``ink``.  Reading-order sorted.
    """
    if len(nodes) < 4:
        return np.empty((0, 4), dtype=np.int32)
    node_set = {(int(x), int(y)) for x, y in nodes}
    xs = np.unique(nodes[:, 0])
    ys = np.unique(nodes[:, 1])
    h, w = ink.shape
    # Banded coverage prefix sums, one per grid line: each edge check becomes
    # O(1) (window count / length — the identical count/len arithmetic of
    # seg.mean()) instead of re-slicing + reducing an ink band per candidate
    # (~4 band scans per cell; measured 0.63 → ~0.2 ms/page).
    def _hpref(y: int) -> np.ndarray:
        y0, y1b = max(0, y - band), min(h, y + band + 1)
        cov = ink[y0:y1b].any(axis=0)
        p = np.zeros(len(cov) + 1, dtype=np.int64)
        np.cumsum(cov, out=p[1:])
        return p

    def _vpref(x: int) -> np.ndarray:
        x0, x1b = max(0, x - band), min(w, x + band + 1)
        cov = ink[:, x0:x1b].any(axis=1)
        p = np.zeros(len(cov) + 1, dtype=np.int64)
        np.cumsum(cov, out=p[1:])
        return p

    hpref = {int(y): _hpref(int(y)) for y in ys}
    vpref = {int(x): _vpref(int(x)) for x in xs}

    def edge_h(y: int, x1: int, x2: int) -> bool:
        x1c, x2c = max(0, x1), min(w, x2 + 1)
        if x2c <= x1c:
            return False
        p = hpref[y]
        return (p[x2c] - p[x1c]) / (x2c - x1c) >= EDGE_COVER

    def edge_v(x: int, y1: int, y2: int) -> bool:
        y1c, y2c = max(0, y1), min(h, y2 + 1)
        if y2c <= y1c:
            return False
        p = vpref[x]
        return (p[y2c] - p[y1c]) / (y2c - y1c) >= EDGE_COVER

    cells = []
    for x1 in xs[:-1]:
        for y1 in ys[:-1]:
            if (x1, y1) not in node_set:
                continue
            placed = False
            for x2 in xs[xs > x1]:
                if (x2, y1) not in node_set:
                    continue
                if not edge_h(int(y1), int(x1), int(x2)):
                    break  # top edge breaks before reaching x2 — no cell rightward
                for y2 in ys[ys > y1]:
                    if (x1, y2) not in node_set or (x2, y2) not in node_set:
                        continue
                    if not (
                        edge_v(int(x1), int(y1), int(y2))
                        and edge_v(int(x2), int(y1), int(y2))
                        and edge_h(int(y2), int(x1), int(x2))
                    ):
                        continue
                    cells.append((int(x1), int(y1), int(x2), int(y2)))
                    placed = True
                    break
                if placed:
                    break
    if not cells:
        return np.empty((0, 4), dtype=np.int32)
    arr = np.array(cells, dtype=np.int32)
    order = np.lexsort((arr[:, 0], arr[:, 1]))  # (y1, x1) reading order
    return arr[order]
