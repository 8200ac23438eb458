"""Unit tests for structure assembly (builder.py semantics) and OCR decode."""

import json

import numpy as np

from tableextraction_spark.font import decode_text, render_text, text_width
from tableextraction_spark.kernel import (
    assemble_table,
    build_header_tree,
    fill_records,
    group_cells_into_rows,
    remove_hyphenated_words,
    split_headers_records,
)


def _grid_cells(n_rows, n_cols, x0=0, y0=0, w=100, h=40):
    out = []
    for r in range(n_rows):
        for c in range(n_cols):
            out.append([x0 + c * w, y0 + r * h, x0 + (c + 1) * w, y0 + (r + 1) * h])
    return np.array(out)


def test_group_cells_rows_fuzzy_eps():
    # builder.py:11-57 — ε=20 y-segmentation with jitter
    cells = _grid_cells(3, 2)
    cells[1][1] += 5  # jitter within ε
    rows = group_cells_into_rows(cells)
    assert [len(r) for r in rows] == [2, 2, 2]
    # left-to-right within each row
    assert all(cells[r[0], 0] < cells[r[1], 0] for r in rows)


def test_split_headers_records_change_point():
    # builder.py:73-113 — bottom-up count change-point
    cells = np.array(
        [[0, 0, 200, 40]]  # header row: 1 wide cell
        + _grid_cells(3, 2, y0=40).tolist()  # 3 record rows × 2 cells
    )
    rows = group_cells_into_rows(cells)
    headers, records = split_headers_records(rows)
    assert len(headers) == 1 and len(records) == 3


def test_split_headers_records_flat_fallback():
    rows = group_cells_into_rows(_grid_cells(4, 3))
    headers, records = split_headers_records(rows)
    assert len(headers) == 1 and len(records) == 3


def test_header_tree_two_level():
    # builder.py:268-300 below-adjacency: S is a vertically-merged single
    # column; A spans 2 cols with children B, C.  (A table where EVERY
    # column is grouped has sub-header rows with the record count and the
    # bottom-up change-point — builder.py:73-113 — assigns them to records;
    # that reference behavior is intentional, hence the S column here.)
    bboxes = np.array(
        [
            [0, 0, 100, 80],     # S (tall merged single)
            [100, 0, 300, 40],   # A (spans B+C)
            [100, 40, 200, 80],  # B
            [200, 40, 300, 80],  # C
            [0, 80, 100, 120],   # record row: 3 cells
            [100, 80, 200, 120],
            [200, 80, 300, 120],
        ]
    )
    texts = ["S", "A", "B", "C", "1", "2", "3"]
    rows = group_cells_into_rows(bboxes)
    headers, records = split_headers_records(rows)
    assert len(headers) == 2 and len(records) == 1
    tree = build_header_tree(bboxes, texts, headers)
    assert [n["text"] for n in tree] == ["S", "A"]
    assert tree[0]["children"] == []
    assert [c["text"] for c in tree[1]["children"]] == ["B", "C"]


def test_fill_records_reading_order_and_containment():
    bboxes = np.array(
        [[0, 0, 100, 40], [100, 0, 200, 40],
         [0, 40, 100, 80], [100, 40, 200, 80],
         [0, 80, 100, 120], [100, 80, 200, 120]]
    )
    texts = ["H1", "H2", "a", "b", "c", "d"]
    rows = group_cells_into_rows(bboxes)
    headers, records = split_headers_records(rows)
    tree = build_header_tree(bboxes, texts, headers)
    leaf_cols = [(n["text"], (n["bbox"][0], n["bbox"][2])) for n in tree]
    recs = fill_records(bboxes, texts, records, leaf_cols)
    assert recs == [["a", "b"], ["c", "d"]]


def test_assemble_table_end_to_end_flat():
    bboxes = np.array(
        [[0, 0, 100, 40], [100, 0, 200, 40],
         [0, 40, 100, 80], [100, 40, 200, 80]]
    )
    payload = json.loads(assemble_table(bboxes, ["H1", "H2", "x", "y"]))
    assert payload["columns"] == ["H1", "H2"]
    assert payload["records"] == [["x", "y"]]


def test_remove_hyphenated_words_reference_regex():
    # recognition.py:151-164 exact parity, EN + RU
    assert remove_hyphenated_words("экс - порт") == "экспорт"
    assert remove_hyphenated_words("tab - le") == "table"
    assert remove_hyphenated_words("a-b-c") == "abc"
    assert remove_hyphenated_words("5 - 6") == "5 - 6"  # digits untouched
    assert remove_hyphenated_words("no hyphen") == "no hyphen"


def test_font_render_decode_roundtrip():
    for text in ["hello", "Марка 5", "a - b", "x,y.z-99%", "ПРОКАТ"]:
        canvas = np.full((20, text_width(text) + 10), 255, dtype=np.uint8)
        render_text(canvas, 3, 5, text)
        assert decode_text(canvas) == text


def test_font_decode_empty_and_unknown():
    assert decode_text(np.full((10, 10), 255, dtype=np.uint8)) == ""
    blob = np.full((20, 20), 255, dtype=np.uint8)
    blob[2:12, 2:12] = 0  # taller than one glyph line
    assert decode_text(blob) == "?"
