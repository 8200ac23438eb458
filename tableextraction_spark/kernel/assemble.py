"""Per-table structure assembly: rows → header/record split → header tree →
record fill → deterministic serialization.

Reference: ``table_extraction/builder.py`` —
  * ``group_cells`` (``:11-57``): sort cells by y1, greedy 1-D segmentation
    with ε=20 into visual rows (a sort-based group-by with fuzzy keys).
  * ``split_into_headers_and_records`` (``:60-113``): walk per-row cell
    counts bottom-up; the first row whose count differs from the bottom
    row's marks the header boundary (change-point).
  * ``create_cell_dict`` (``:268-300``) + ``build_structure`` (``:335-362``):
    header tree by below-adjacency (y-contact ≤ ε, x-containment ± ε).
  * ``fill_structure`` (``:365-387``): records filled in reading order.  The
    reference does this with a destructive ``pop(0)`` keyed on exact bbox
    lookups (``builder.py:383``, ``:407-426``); we key record cells to leaf
    header columns by center-x containment, which is equivalent on grid
    tables and total (no KeyError on jitter).
  * text cleanup ``remove_hyphenated_words``
    (``table_extraction/recognition.py:151-164``) — exact regex parity.

Also deliberately NOT reproduced: the ``UnboundLocalError`` ML-zone path
(``builder.py:149-155``), dead in the reference (``extractor.py:60``).
"""

from __future__ import annotations

import json
import re

import numpy as np

ROW_EPS = 20  # builder.py group_cells ε (high-res px)
ADJ_EPS = 20  # builder.py:268-300 containment / contact tolerance

_HYPHEN_RE = re.compile(r"(?<=[a-zA-Zа-яА-Я]) ?- ?(?=[a-zA-Zа-яА-Я])")


def remove_hyphenated_words(text: str) -> str:
    """Strip intra-word hyphenation introduced by line wraps (exact parity
    with ``recognition.py:151-164``)."""
    return _HYPHEN_RE.sub("", text)


def group_cells_into_rows(bboxes: np.ndarray, eps: int = ROW_EPS) -> list[np.ndarray]:
    """cells int[C,4] (x1,y1,x2,y2) → list of index arrays, one per visual
    row (top→bottom), each sorted left→right."""
    if len(bboxes) == 0:
        return []
    order = np.argsort(bboxes[:, 1], kind="stable")
    y1 = bboxes[order, 1]
    breaks = np.nonzero(np.diff(y1) > eps)[0] + 1
    rows = np.split(order, breaks)
    return [r[np.argsort(bboxes[r, 0], kind="stable")] for r in rows]


def split_headers_records(rows: list[np.ndarray]) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Bottom-up change-point split → (header_rows, record_rows).

    If every row has the bottom row's cell count, the first row alone is the
    header (degenerate flat table).
    """
    if not rows:
        return [], []
    if len(rows) == 1:
        return rows, []
    bottom_count = len(rows[-1])
    split_at = 1  # default: first row is header
    for i in range(len(rows) - 1, -1, -1):
        if len(rows[i]) != bottom_count:
            split_at = i + 1
            break
    return rows[:split_at], rows[split_at:]


def build_header_tree(
    bboxes: np.ndarray, texts: list[str], header_rows: list[np.ndarray], eps: int = ADJ_EPS
) -> list[dict]:
    """Header cells → forest of {text, bbox, children} by below-adjacency.

    Parent P adopts header cell C iff C sits in the next header row band,
    touches P vertically (|C.y1 − P.y2| ≤ ε) and is x-contained in P (± ε) —
    the reference's O(n²) double loop (``builder.py:268-300``) as a
    vectorized mask per parent.
    """
    if not header_rows:
        return []
    header_idx = np.concatenate(header_rows)
    hb = bboxes[header_idx]

    def subtree(i_local: int) -> dict:
        p = hb[i_local]
        below = (
            (np.abs(hb[:, 1] - p[3]) <= eps)
            & (hb[:, 0] >= p[0] - eps)
            & (hb[:, 2] <= p[2] + eps)
        )
        kids = np.nonzero(below)[0]
        kids = kids[np.argsort(hb[kids, 0], kind="stable")]
        return {
            "text": texts[header_idx[i_local]],
            "bbox": [int(v) for v in p],
            "children": [subtree(int(k)) for k in kids],
        }

    top = header_rows[0]
    roots = []
    pos = {int(g): loc for loc, g in enumerate(header_idx)}
    for g in top:
        roots.append(subtree(pos[int(g)]))
    return roots


def _leaves(tree: list[dict], prefix: str = "") -> list[tuple[str, tuple[int, int]]]:
    """DFS left→right → [(path, (x1, x2))] of leaf header columns."""
    out = []
    for node in tree:
        path = f"{prefix}/{node['text']}" if prefix else node["text"]
        if node["children"]:
            out.extend(_leaves(node["children"], path))
        else:
            out.append((path, (node["bbox"][0], node["bbox"][2])))
    return out


def fill_records(
    bboxes: np.ndarray,
    texts: list[str],
    record_rows: list[np.ndarray],
    leaf_cols: list[tuple[str, tuple[int, int]]],
    eps: int = ADJ_EPS,
) -> list[list[str]]:
    """Record rows → list of per-row text lists aligned to ``leaf_cols``.

    Each record cell lands in the leaf column containing its center-x; rows
    emitted top→bottom, reading order (``builder.py:180-199,419``).
    """
    records = []
    for row in record_rows:
        slot = [""] * len(leaf_cols)
        for g in row:
            cx = (bboxes[g, 0] + bboxes[g, 2]) / 2
            for j, (_, (x1, x2)) in enumerate(leaf_cols):
                if x1 - eps <= cx <= x2 + eps:
                    slot[j] = texts[g] if slot[j] == "" else slot[j] + " " + texts[g]
                    break
        records.append(slot)
    return records


def _strip_tree(tree: list[dict]) -> list[dict]:
    return [
        {"text": n["text"], "children": _strip_tree(n["children"])} for n in tree
    ]


def serialize_table(tree: list[dict], leaf_cols, records: list[list[str]]) -> str:
    """Deterministic JSON payload for a table span (replaces the reference's
    per-table YAML file sink, ``export.py:77-122``)."""
    return json.dumps(
        {
            "columns": [p for p, _ in leaf_cols],
            "headers": _strip_tree(tree),
            "records": records,
        },
        ensure_ascii=False,
        separators=(",", ":"),
    )


def assemble_table(bboxes: np.ndarray, texts: list[str]) -> str:
    """Full per-table assembly: cells+texts → serialized structure JSON.

    Composition of the stages above = reference stage F
    (``extractor.py:68`` → ``export.py:21-74``).
    """
    bboxes = np.asarray(bboxes, dtype=np.int64).reshape(-1, 4)
    texts = [remove_hyphenated_words(t) for t in texts]
    rows = group_cells_into_rows(bboxes)
    header_rows, record_rows = split_headers_records(rows)
    tree = build_header_tree(bboxes, texts, header_rows)
    leaf_cols = _leaves(tree)
    records = fill_records(bboxes, texts, record_rows, leaf_cols)
    return serialize_table(tree, leaf_cols, records)
