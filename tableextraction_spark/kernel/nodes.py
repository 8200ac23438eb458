"""Grid-node derivation: line intersection, ε-snap, grid-consistency fixpoint.

Reference: ``table_extraction/detection.py:341-471`` (``get_nodes``) —
(1) cartesian vertical×horizontal intersection with ε tolerance
    (``:364-403``, itertools.product → here one broadcast),
(2) ε-neighborhood clustering replacing clusters by their rounded mean
    (``:417-434``, KDTree → here sort-based 1-D clustering per axis, which is
    exact for axis-aligned grids and needs no scipy),
(3) coordinate snapping of near-equal x's / y's (``:437-449``),
(4) iterative removal of nodes whose x or y occurs only once, until stable
    (``:455-468``) — degenerate-grid closure.

The reference's loop-variable-mutation bug in ``get_cells``
(``detection.py:522`` reassigns ``tables_nodes`` inside the per-table loop,
breaking multi-table pages) is deliberately NOT reproduced: everything here is
per-table pure functions.
"""

from __future__ import annotations

import numpy as np

_EMPTY2 = np.empty((0, 2), dtype=np.int32)


def intersect_lines(vert: np.ndarray, horiz: np.ndarray, eps: int) -> np.ndarray:
    """vert[M,3] (x,y1,y2) × horiz[N,3] (y,x1,x2) → candidate nodes int32[K,2].

    Node (x, y) exists where a vertical's x lies within a horizontal's
    ε-expanded x-extent and the horizontal's y within the vertical's
    ε-expanded y-extent — the reference's theta-join predicate
    (``detection.py:364-403``) vectorized with broadcasting.
    """
    if len(vert) == 0 or len(horiz) == 0:
        return _EMPTY2
    vx, vy1, vy2 = vert[:, 0][:, None], vert[:, 1][:, None], vert[:, 2][:, None]
    hy, hx1, hx2 = horiz[:, 0][None, :], horiz[:, 1][None, :], horiz[:, 2][None, :]
    hit = (hx1 - eps <= vx) & (vx <= hx2 + eps) & (vy1 - eps <= hy) & (hy <= vy2 + eps)
    vi, hi = np.nonzero(hit)
    return np.stack([vert[vi, 0], horiz[hi, 0]], axis=1).astype(np.int32)


def _snap_axis(vals: np.ndarray, eps: int) -> np.ndarray:
    """Cluster 1-D coords within ε and replace by rounded cluster mean."""
    if vals.size == 0:
        return vals
    uniq = np.unique(vals)
    breaks = np.nonzero(np.diff(uniq) > eps)[0] + 1
    groups = np.split(uniq, breaks)
    mapping = {}
    for g in groups:
        center = int(round(g.mean()))
        for v in g:
            mapping[int(v)] = center
    return np.array([mapping[int(v)] for v in vals], dtype=np.int32)


def snap_nodes(nodes: np.ndarray, eps: int) -> np.ndarray:
    """Snap near-equal coordinates per axis, then dedup exact duplicates.

    Sort-based equivalent of the reference's KDTree cluster-mean +
    consecutive-coordinate snap (``detection.py:417-449``).
    """
    if len(nodes) == 0:
        return _EMPTY2
    snapped = np.stack(
        [_snap_axis(nodes[:, 0], eps), _snap_axis(nodes[:, 1], eps)], axis=1
    )
    return np.unique(snapped, axis=0)


def dedup_grid_fixpoint(nodes: np.ndarray) -> np.ndarray:
    """Drop nodes whose x or y coordinate occurs exactly once; iterate to
    fixpoint (``detection.py:455-468``).  A lone coordinate cannot bound a
    cell, so these are intersection artifacts outside the grid."""
    nodes = np.asarray(nodes)
    while len(nodes):
        _, xi, xc = np.unique(nodes[:, 0], return_inverse=True, return_counts=True)
        _, yi, yc = np.unique(nodes[:, 1], return_inverse=True, return_counts=True)
        keep = (xc[xi] > 1) & (yc[yi] > 1)
        if keep.all():
            break
        nodes = nodes[keep]
    return nodes
