"""Table-region detection by grid-line connectivity clustering.

The reference's default region detector is a Mask R-CNN
(``table_extraction/detection.py:80-122``) whose weights are not in the repo,
so the reproducible path derives regions from the same line evidence the
structure step uses: segments whose (ε-expanded) bounding boxes touch belong
to one connected component; a component with ≥2 horizontal and ≥2 vertical
lines is a table region.  This mirrors the commented-out pure-Hough path the
reference keeps as its weights-free alternative (``extractor.py:55-57``).
"""

from __future__ import annotations

import numpy as np


def _boxes(horiz: np.ndarray, vert: np.ndarray, eps: int) -> np.ndarray:
    """Segments → ε-expanded bboxes int32[N,4] (x1,y1,x2,y2); H first."""
    hb = np.stack(
        [horiz[:, 1] - eps, horiz[:, 0] - eps, horiz[:, 2] + eps, horiz[:, 0] + eps],
        axis=1,
    ) if len(horiz) else np.empty((0, 4), np.int32)
    vb = np.stack(
        [vert[:, 0] - eps, vert[:, 1] - eps, vert[:, 0] + eps, vert[:, 2] + eps],
        axis=1,
    ) if len(vert) else np.empty((0, 4), np.int32)
    return np.concatenate([hb, vb], axis=0).astype(np.int32)


def cluster_tables(horiz: np.ndarray, vert: np.ndarray, eps: int = 3):
    """(horiz[N,3], vert[M,3]) → list of (bbox, horiz_subset, vert_subset).

    bbox is (x1, y1, x2, y2) over the member segments (unexpanded).
    Connected components via vectorized O(n²) adjacency + BFS — n is the
    number of *lines* on a page (tens), not pixels.
    """
    nh, nv = len(horiz), len(vert)
    n = nh + nv
    if n == 0:
        return []
    b = _boxes(horiz, vert, eps)
    # pairwise bbox intersection test, broadcast n×n
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    inter = (
        (x1[:, None] <= x2[None, :])
        & (x2[:, None] >= x1[None, :])
        & (y1[:, None] <= y2[None, :])
        & (y2[:, None] >= y1[None, :])
    )
    comp = np.full(n, -1, dtype=np.int64)
    n_comp = 0
    for seed in range(n):
        if comp[seed] >= 0:
            continue
        frontier = np.zeros(n, dtype=bool)
        frontier[seed] = True
        member = frontier.copy()
        while frontier.any():
            frontier = inter[frontier].any(axis=0) & ~member
            member |= frontier
        comp[member] = n_comp
        n_comp += 1
    out = []
    for c in range(n_comp):
        hm = horiz[comp[:nh] == c] if nh else horiz
        vm = vert[comp[nh:] == c] if nv else vert
        if len(hm) < 2 or len(vm) < 2:
            continue  # not a grid — stray rule / underline
        bx1 = int(min(hm[:, 1].min(), vm[:, 0].min()))
        bx2 = int(max(hm[:, 2].max(), vm[:, 0].max()))
        by1 = int(min(hm[:, 0].min(), vm[:, 1].min()))
        by2 = int(max(hm[:, 0].max(), vm[:, 2].max()))
        out.append(((bx1, by1, bx2, by2), hm, vm))
    # reading order: top-to-bottom, then left-to-right (detection.py:601-602)
    out.sort(key=lambda t: (t[0][1], t[0][0]))
    return out
