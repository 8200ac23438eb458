"""Grid-line segment detection — the weights-free detection path.

The reference isolates lines with 1×6 / 7×1 erode-dilate kernels and runs
probabilistic Hough (``table_extraction/detection.py:221-306``,
``get_lines_Hough``), then classifies segments as vertical/horizontal with an
ε = 1%·(h+w) tolerance (``detection.py:293-301``).  Without OpenCV we get the
same result on binarized scans via vectorized run-length extraction: a
horizontal line is a run of ≥ ``min_len`` consecutive ink pixels in a row
(vertical: in a column).  Runs on adjacent rows (line thickness / aliasing)
are merged into one segment.  Output coordinate convention is image space
(y grows down) — the reference's y-axis flip to math convention
(``detection.py:296-301``) is an internal representation choice it undoes at
crop time; we stay in image space end-to-end (documented deviation, same
geometry).
"""

from __future__ import annotations

import numpy as np

_EMPTY3 = np.empty((0, 3), dtype=np.int32)


def _row_runs(mask: np.ndarray, min_len: int) -> np.ndarray:
    """bool H×W → int32[N,3] (row, start, end) inclusive runs of ≥min_len.

    A row can only contain a ≥min_len run if it has ≥min_len ink pixels, so
    one cheap row-sum pass prunes to the handful of candidate rows (grid
    lines are ~20 of ~700 rows) before the expensive edge scan — measured
    2× on the whole kernel.
    """
    if mask.size == 0:
        return _EMPTY3
    # count_nonzero beats bool-sum (no int64 widening) on the full-page pass
    cand = np.nonzero(np.count_nonzero(mask, axis=1) >= min_len)[0]
    if cand.size == 0:
        return _EMPTY3
    sub = mask[cand]
    padded = np.zeros((sub.shape[0], sub.shape[1] + 2), dtype=np.int8)
    padded[:, 1:-1] = sub
    d = np.diff(padded, axis=1)
    rs, cs = np.nonzero(d == 1)
    re, ce = np.nonzero(d == -1)
    # row-major nonzero ⇒ starts/ends pair up positionally within each row
    lengths = ce - cs
    keep = lengths >= min_len
    return np.stack(
        [cand[rs[keep]], cs[keep], ce[keep] - 1], axis=1
    ).astype(np.int32)


def _merge_adjacent(runs: np.ndarray, gap: int = 2) -> np.ndarray:
    """Merge runs on nearby rows with overlapping extents (line thickness).

    int32[N,3] (row, a, b) → int32[M,3] with row = rounded mean of the
    cluster, extent = union.  Greedy single-link over row-sorted runs.
    """
    if len(runs) == 0:
        return _EMPTY3
    order = np.lexsort((runs[:, 1], runs[:, 0]))
    runs = runs[order]
    # A run can only join a cluster whose last row is within `gap`, and rows
    # arrive sorted — so a row step > gap is a hard cluster boundary.
    # Partitioning there first is semantics-preserving (the greedy loop
    # below runs unchanged within each part) and cuts the O(runs·clusters)
    # scan to the 1-3 runs that share a physical line (~0.4 ms/page).
    results: list[list[int]] = []
    bounds = np.nonzero(np.diff(runs[:, 0]) > gap)[0] + 1
    for part in np.split(runs, bounds):
        out: list[list[int]] = []  # [sum_row, n, a, b, last_row]
        for row, a, b in part:
            merged = False
            for c in out:
                if row - c[4] <= gap and a <= c[3] + gap and b >= c[2] - gap:
                    c[0] += row
                    c[1] += 1
                    c[2] = min(c[2], a)
                    c[3] = max(c[3], b)
                    c[4] = row
                    merged = True
                    break
            if not merged:
                out.append([int(row), 1, int(a), int(b), int(row)])
        results.extend(out)
    return np.array(
        [[round(s / n), a, b] for s, n, a, b, _ in results], dtype=np.int32
    )


def detect_segments(ink: np.ndarray, min_len_frac: float = 0.04):
    """bool ink mask → (horizontal int32[N,3] (y,x1,x2),
                        vertical   int32[M,3] (x,y1,y2)).

    ``min_len_frac`` of the corresponding image dimension is the minimum run
    length — glyph ink produces only short runs and is filtered out here,
    which is the same pruning role the reference's morphological open plays
    before Hough (``detection.py:243-270``).
    """
    h, w = ink.shape
    # floor of 8 > glyph width/height (5/7) so text ink can never register
    # as a grid line even on tiny crops
    horiz = _merge_adjacent(_row_runs(ink, max(8, int(w * min_len_frac))))
    vert = _merge_adjacent(_row_runs(ink.T, max(8, int(h * min_len_frac))))
    return horiz, vert


def split_orientation(segments: np.ndarray, height: int, width: int):
    """Classify generic (x1,y1,x2,y2) segments vertical/horizontal.

    Parity port of the reference predicate (``detection.py:293-301``):
    ε = 1%·(h+w); vertical iff |x1−x2| ≤ ε ∧ |y1−y2| > ε, horizontal iff the
    transpose holds; oblique segments are dropped.  Returns
    (vertical int32[K,4], horizontal int32[L,4]).
    """
    if len(segments) == 0:
        e = np.empty((0, 4), dtype=np.int32)
        return e, e
    seg = np.asarray(segments, dtype=np.int32)
    eps = 0.01 * (height + width)
    dx = np.abs(seg[:, 0] - seg[:, 2])
    dy = np.abs(seg[:, 1] - seg[:, 3])
    vert = seg[(dx <= eps) & (dy > eps)]
    horiz = seg[(dy <= eps) & (dx > eps)]
    return vert, horiz
