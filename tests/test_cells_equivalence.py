"""cells_from_nodes prefix-sum edge checks ≡ the original per-candidate band
scans (_edge_dark_h/_edge_dark_v are retained in the module as the reference
formulation), over randomized ink masks, node clouds, and proper grids."""

import numpy as np

from tableextraction_spark.kernel.cells import (
    _edge_dark_h,
    _edge_dark_v,
    cells_from_nodes,
)


def _cells_reference(nodes, ink, band=2):
    if len(nodes) < 4:
        return np.empty((0, 4), dtype=np.int32)
    node_set = {(int(x), int(y)) for x, y in nodes}
    xs, ys = np.unique(nodes[:, 0]), np.unique(nodes[:, 1])
    cells = []
    for x1 in xs[:-1]:
        for y1 in ys[:-1]:
            if (x1, y1) not in node_set:
                continue
            placed = False
            for x2 in xs[xs > x1]:
                if (x2, y1) not in node_set:
                    continue
                if not _edge_dark_h(ink, int(y1), int(x1), int(x2), band):
                    break
                for y2 in ys[ys > y1]:
                    if (x1, y2) not in node_set or (x2, y2) not in node_set:
                        continue
                    if not (
                        _edge_dark_v(ink, int(x1), int(y1), int(y2), band)
                        and _edge_dark_v(ink, int(x2), int(y1), int(y2), band)
                        and _edge_dark_h(ink, int(y2), int(x1), int(x2), band)
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
    return arr[np.lexsort((arr[:, 0], arr[:, 1]))]


def test_random_masks_and_grids_equivalent():
    rng = np.random.default_rng(1)
    for trial in range(120):
        H, W = int(rng.integers(20, 80)), int(rng.integers(20, 80))
        ink = rng.random((H, W)) < rng.uniform(0.05, 0.9)
        k = int(rng.integers(0, 12))
        nodes = (
            np.stack([rng.integers(0, W, k), rng.integers(0, H, k)], axis=1)
            .astype(np.int32)
            if k
            else np.empty((0, 2), dtype=np.int32)
        )
        a, b = _cells_reference(nodes, ink), cells_from_nodes(nodes, ink)
        assert a.shape == b.shape and (a == b).all(), f"random trial {trial}"

        gx = np.sort(rng.choice(np.arange(2, W - 2), size=min(4, W // 8),
                                replace=False))
        gy = np.sort(rng.choice(np.arange(2, H - 2), size=min(4, H // 8),
                                replace=False))
        ink2 = np.zeros((H, W), bool)
        for y in gy:
            ink2[y, gx[0] : gx[-1] + 1] = True
        for x in gx:
            ink2[gy[0] : gy[-1] + 1, x] = True
        nodes2 = np.array([(x, y) for x in gx for y in gy], dtype=np.int32)
        a, b = _cells_reference(nodes2, ink2), cells_from_nodes(nodes2, ink2)
        assert a.shape == b.shape and (a == b).all(), f"grid trial {trial}"
