"""Unit tests for the pure-NumPy geometry kernel (SURVEY.md §5: per-operator
tests against hand-built tiny grids with known answers)."""

import numpy as np
import pytest

from tableextraction_spark.kernel import (
    binarize,
    grayzation,
    cells_from_nodes,
    cluster_tables,
    dedup_grid_fixpoint,
    detect_segments,
    intersect_lines,
    scale_bboxes,
    snap_nodes,
    split_orientation,
)
from tableextraction_spark.media import decode_image, downscale, encode_image


def draw_grid(w=200, h=120, xs=(20, 80, 140), ys=(20, 60, 100), t=2):
    """White canvas with a full grid at the given boundaries."""
    img = np.full((h, w), 255, dtype=np.uint8)
    for y in ys:
        img[y : y + t, xs[0] : xs[-1] + t] = 0
    for x in xs:
        img[ys[0] : ys[-1] + t, x : x + t] = 0
    return img


def test_grayzation_rgb_mean():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    g = grayzation(rgb)
    assert g.shape == (2, 2) and g[0, 0] == 85


def test_binarize_threshold_200():
    gray = np.array([[0, 200, 201, 255]], dtype=np.uint8)
    assert binarize(gray).tolist() == [[True, True, False, False]]


def test_detect_segments_finds_grid_lines():
    img = draw_grid()
    horiz, vert = detect_segments(binarize(img))
    assert len(horiz) == 3 and len(vert) == 3
    assert sorted(int(y) for y, _, _ in horiz) == pytest.approx([20, 60, 100], abs=1)
    assert sorted(int(x) for x, _, _ in vert) == pytest.approx([20, 80, 140], abs=1)


def test_detect_segments_ignores_short_runs():
    img = np.full((100, 100), 255, dtype=np.uint8)
    img[50, 10:14] = 0  # 4px speck ≪ min_len
    horiz, vert = detect_segments(binarize(img))
    assert len(horiz) == 0 and len(vert) == 0


def test_split_orientation_reference_predicate():
    # detection.py:293-301 — ε = 1%·(h+w)
    segs = np.array(
        [
            [10, 10, 10, 90],   # vertical
            [10, 10, 90, 10],   # horizontal
            [10, 10, 90, 90],   # oblique → dropped
        ]
    )
    v, h = split_orientation(segs, height=100, width=100)
    assert len(v) == 1 and len(h) == 1


def test_intersect_lines_tolerance():
    vert = np.array([[50, 10, 90]])     # x=50, y 10..90
    horiz = np.array([[40, 48, 100]])   # y=40, x 48..100
    nodes = intersect_lines(vert, horiz, eps=2)
    assert nodes.tolist() == [[50, 40]]
    assert intersect_lines(vert, np.array([[40, 53, 100]]), eps=2).size == 0


def test_snap_nodes_clusters_close_coords():
    nodes = np.array([[10, 10], [11, 10], [10, 11], [50, 50]])
    snapped = snap_nodes(nodes, eps=2)
    assert len(snapped) == 2
    assert [50, 50] in snapped.tolist()


def test_dedup_grid_fixpoint_removes_dangling():
    # (99, 99) has unique x AND y; after its removal grid is consistent
    nodes = np.array([[0, 0], [0, 10], [10, 0], [10, 10], [99, 99]])
    out = dedup_grid_fixpoint(nodes)
    assert len(out) == 4 and [99, 99] not in out.tolist()


def test_dedup_grid_fixpoint_cascades():
    # removing (30, 0)'s partner exposes (30, 5) — must iterate to fixpoint
    nodes = np.array([[0, 0], [0, 10], [10, 0], [10, 10], [30, 0], [30, 5]])
    out = dedup_grid_fixpoint(nodes)
    assert sorted(out.tolist()) == [[0, 0], [0, 10], [10, 0], [10, 10]]


def test_cells_from_full_grid():
    img = draw_grid()
    ink = binarize(img)
    horiz, vert = detect_segments(ink)
    nodes = dedup_grid_fixpoint(snap_nodes(intersect_lines(vert, horiz, 3), 3))
    cells = cells_from_nodes(nodes, ink)
    assert len(cells) == 4  # 2×2 grid
    # reading order: (y1, x1)
    assert cells[0][1] <= cells[1][1] and cells[0][0] < cells[1][0]


def test_cells_spanning_merged_header():
    # top row has NO middle vertical line → one wide cell over two below
    img = np.full((120, 200), 255, dtype=np.uint8)
    xs, ys = (20, 80, 140), (20, 60, 100)
    t = 2
    for y in ys:
        img[y : y + t, xs[0] : xs[-1] + t] = 0
    img[ys[0] : ys[-1] + t, xs[0] : xs[0] + t] = 0
    img[ys[0] : ys[-1] + t, xs[-1] : xs[-1] + t] = 0
    img[ys[1] : ys[-1] + t, xs[1] : xs[1] + t] = 0  # middle line only below y=60
    ink = binarize(img)
    horiz, vert = detect_segments(ink)
    nodes = dedup_grid_fixpoint(snap_nodes(intersect_lines(vert, horiz, 3), 3))
    cells = cells_from_nodes(nodes, ink)
    widths = sorted(int(x2 - x1) for x1, _, x2, _ in cells)
    assert len(cells) == 3  # 1 wide + 2 narrow
    assert widths[2] == pytest.approx(widths[0] + widths[1], abs=3)


def test_cluster_tables_two_separate_grids():
    img = np.full((300, 200), 255, dtype=np.uint8)
    img[draw_grid().shape[0] * 0 : 120, :200] = draw_grid()
    g2 = draw_grid()
    img[160:280, :200] = g2
    ink = binarize(img)
    horiz, vert = detect_segments(ink)
    regions = cluster_tables(horiz, vert)
    assert len(regions) == 2
    assert regions[0][0][1] < regions[1][0][1]  # reading order


def test_cluster_tables_rejects_lone_rule():
    img = np.full((100, 200), 255, dtype=np.uint8)
    img[50:52, 20:180] = 0  # a single horizontal rule — not a table
    horiz, vert = detect_segments(binarize(img))
    assert cluster_tables(horiz, vert) == []


def test_scale_bboxes_factor_semantics():
    # detection.py:607-628 resize_tables_cells parity: multiply by factor
    cells = np.array([[1, 2, 3, 4]])
    assert scale_bboxes(cells, 10).tolist() == [[10, 20, 30, 40]]


def test_media_roundtrip_and_downscale():
    img = (np.arange(64).reshape(8, 8) * 3 % 256).astype(np.uint8)
    assert np.array_equal(decode_image(encode_image(img)), img)
    small = downscale(np.full((8, 8), 255, dtype=np.uint8), 4)
    assert small.shape == (2, 2)
    thin = np.full((8, 8), 255, dtype=np.uint8)
    thin[3, :] = 0  # 1px line survives block-min downscale
    assert (downscale(thin, 4) == 0).any()
