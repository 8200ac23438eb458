"""Plot digitization — the reference's second extraction capability.

Reference: ``plot_processing/PlotProcessing.ipynb`` (class ``PlotProcessing``,
cell 1): grayscale → blur → binarize → axis-line detection (morphology +
Hough, ``get_lines_Hough``) → grid/text removal → ``find_points`` (all ink
pixels) → ``filter_points`` (KDTree ε-neighborhood merge to blob centers) →
``filter_points_with_dbscan`` (DBSCAN eps=5, min_samples=5, the notebook's
fixed best params) → ``remove_small_clusters`` → digitized point clusters.

Weights-free port with two documented deviations:
* blob centers come from connected-component labeling instead of the greedy
  KDTree neighborhood merge — the reference's greedy visit order makes blob
  centers depend on pixel scan order; CC centroids are order-independent and
  equal the drawn marker centers exactly (same role as ``filter_points``).
* DBSCAN is re-implemented in pure NumPy (no sklearn in this container),
  same algorithm: eps-ball neighbor counts → core points → BFS expansion;
  small clusters dropped per ``remove_small_clusters``.

A page is treated as a plot when it has axis evidence (≥1 long horizontal
and ≥1 vertical segment) but no table grid (tables need ≥2+≥2 —
kernel/tables.py), mirroring the table|plot class split of the reference's
detector (``maskrcnn/class_names.py:2-12``).
"""

from __future__ import annotations

import json

import numpy as np

DBSCAN_EPS = 10.0
DBSCAN_MIN_SAMPLES = 4
MIN_CLUSTER_SIZE = 4
LINE_MASK_BAND = 3  # px masked around detected axis/grid lines


def blob_centers(ink: np.ndarray) -> np.ndarray:
    """Connected components (4-adjacency) of an ink mask → int32[N,2] (x, y)
    rounded centroids.

    Run-based labeling: horizontal ink runs come from lines._row_runs (the
    shared vectorized diff pass, min_len=1 → every run), then union-find
    joins runs on adjacent rows whose column extents overlap — exactly
    4-adjacency, but the Python work is O(#runs), not O(#pixels) (the
    per-pixel BFS this replaces profiled at 12% of the whole page kernel).
    Centroids come from exact per-run pixel sums, so outputs are
    bit-identical to the BFS (same banker's rounding, same (x, y) sort)."""
    from .lines import _row_runs

    h, _w = ink.shape
    runs = _row_runs(ink, 1)  # int32[N,3] (row, start, end) row-major
    n = len(runs)
    if n == 0:
        return np.empty((0, 2), dtype=np.int32)
    rs, a, b = runs[:, 0], runs[:, 1], runs[:, 2]  # inclusive extents
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # rows are sorted (row-major nonzero); two-pointer over adjacent rows
    row_bounds = np.searchsorted(rs, np.arange(h + 1))
    for r in range(h - 1):
        i, iend = row_bounds[r], row_bounds[r + 1]
        j, jend = row_bounds[r + 1], row_bounds[r + 2]
        while i < iend and j < jend:
            if a[i] <= b[j] and a[j] <= b[i]:  # column overlap → connected
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[rj] = ri
            if b[i] <= b[j]:
                i += 1
            else:
                j += 1
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    cnt_r = (b - a + 1).astype(np.float64)
    sx_r = (a + b) * cnt_r / 2.0  # sum of x coords within the run
    sy_r = rs * cnt_r
    order = np.argsort(roots, kind="stable")
    uniq, starts = np.unique(roots[order], return_index=True)
    centers = []
    for k in range(len(uniq)):
        sl = order[starts[k] : starts[k + 1] if k + 1 < len(uniq) else n]
        cnt = cnt_r[sl].sum()
        centers.append(
            (int(round(sx_r[sl].sum() / cnt)), int(round(sy_r[sl].sum() / cnt)))
        )
    return np.array(sorted(centers), dtype=np.int32)


def dbscan(points: np.ndarray, eps: float = DBSCAN_EPS,
           min_samples: int = DBSCAN_MIN_SAMPLES) -> np.ndarray:
    """Labels int64[N]; -1 = noise.  O(N²) NumPy — N is blob count (~100s)."""
    n = len(points)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    p = points.astype(np.float64)
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(axis=2)
    neigh = d2 <= eps * eps
    core = neigh.sum(axis=1) >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cluster = 0
    for seed in range(n):
        if labels[seed] != -1 or not core[seed]:
            continue
        member = np.zeros(n, dtype=bool)
        frontier = np.zeros(n, dtype=bool)
        frontier[seed] = True
        member[seed] = True
        while frontier.any():
            # expand only through core points (border points join, don't expand)
            reach = neigh[frontier & core].any(axis=0) & ~member
            member |= reach
            frontier = reach
        labels[member & (labels == -1)] = cluster
        cluster += 1
    return labels


def mask_lines(ink: np.ndarray, horiz: np.ndarray, vert: np.ndarray,
               band: int = LINE_MASK_BAND) -> np.ndarray:
    """Remove detected line segments (± band px) from the ink mask — the
    reference's remove_grid / axis removal step."""
    out = ink.copy()
    h, w = out.shape
    for y, x1, x2 in horiz:
        out[max(0, y - band) : min(h, y + band + 1), max(0, x1 - band) : min(w, x2 + band + 1)] = False
    for x, y1, y2 in vert:
        out[max(0, y1 - band) : min(h, y2 + band + 1), max(0, x - band) : min(w, x + band + 1)] = False
    return out


def digitize_plot(
    ink: np.ndarray, horiz: np.ndarray, vert: np.ndarray
) -> tuple[str, int] | None:
    """Ink mask + detected line segments → (serialized plot payload,
    n_points), or None when the page carries no plot evidence (no axes or no
    point clusters)."""
    if len(horiz) < 1 or len(vert) < 1:
        return None
    pts = blob_centers(mask_lines(ink, horiz, vert))
    if len(pts) < DBSCAN_MIN_SAMPLES:
        return None
    labels = dbscan(pts)
    clusters = []
    for c in range(labels.max() + 1 if labels.size else 0):
        m = pts[labels == c]
        if len(m) < MIN_CLUSTER_SIZE:  # remove_small_clusters
            continue
        clusters.append(
            {
                "n": int(len(m)),
                "x": int(round(float(m[:, 0].mean()))),
                "y": int(round(float(m[:, 1].mean()))),
            }
        )
    if not clusters:
        return None
    clusters.sort(key=lambda c: (c["y"], c["x"]))
    n_points = sum(c["n"] for c in clusters)
    return json.dumps({"clusters": clusters}, separators=(",", ":")), n_points
