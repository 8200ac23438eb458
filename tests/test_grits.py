"""GriTS-content diagnostic metric tests."""

import json

from tableextraction_spark.kernel.grits import (
    grits_content,
    table_similarity,
    text_similarity,
)


def _payload(columns, records):
    return json.dumps({"columns": columns, "headers": [], "records": records})


def test_text_similarity_lcs():
    assert text_similarity("abc", "abc") == 1.0
    assert text_similarity("", "") == 1.0
    assert text_similarity("abc", "") == 0.0
    assert abs(text_similarity("abcd", "abxd") - 0.75) < 1e-9  # LCS=3, 2*3/8


def test_identical_tables_score_one():
    p = _payload(["A", "B"], [["1", "2"], ["3", "4"]])
    assert table_similarity(p, p) == 1.0


def test_missing_row_scores_proportionally():
    a = _payload(["A", "B"], [["1", "2"], ["3", "4"]])
    b = _payload(["A", "B"], [["1", "2"]])
    s = table_similarity(a, b)
    assert 0.7 < s < 0.9  # 4 matched cells of (6+4)/2=5 → 0.8


def test_ocr_noise_degrades_gracefully():
    a = _payload(["Grade", "Size"], [["steel", "42"]])
    b = _payload(["Grade", "Size"], [["stele", "42"]])
    assert 0.9 < table_similarity(a, b) < 1.0


def test_disjoint_tables_score_low():
    a = _payload(["A"], [["xxx"]])
    b = _payload(["Q"], [["zzz"]])
    assert table_similarity(a, b) < 0.2


def test_empty_grid_edge():
    assert grits_content([], []) == 1.0
    assert grits_content([["a"]], []) == 0.0


def test_bench_grits_goldens_score_one(spark):
    """The bench headline (BENCH_r4+ grits_content_golden): extracted vs
    plan-derived golden tables score exactly 1.0 under span equality."""
    import bench

    assert bench.bench_grits(spark, n_docs=48) == 1.0
