"""Behavioral tests for the corpus-level passes (q60/q61) on constructed
frames — sf0.001 oracle equality lives in test_queries_oracle.py; these pin
exact span boundaries and bucket behavior on crafted pathologies."""

import pytest

from tableextraction_spark.queries.corpusops import (
    SPAN_K,
    q60_dup_substring_spans,
    q61_lm_quality_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture()
def tmp_docs(spark, tmp_path):
    def write(rows):
        p = str(tmp_path / "documents.parquet")
        _docs(spark, rows).write.mode("overwrite").parquet(p)
        return str(tmp_path)

    return write


def _tok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_q60_cross_doc_shared_run_merges_to_one_span(spark, tmp_docs):
    # docs 1 and 2 share a 10-token run at position 0; only the 3 windows
    # fully inside the run (positions 0..2) are duplicated, and they merge
    # into ONE maximal span covering tokens 0..9
    shared = _tok("s", 10)
    sf = tmp_docs(
        [
            (1, f"{shared} {_tok('a', 6)}", "en", "t", 0),
            (2, f"{shared} {_tok('b', 6)}", "en", "t", 0),
            (3, _tok("c", 20), "en", "t", 0),  # all-unique control
        ]
    )
    rows = q60_dup_substring_spans(spark, sf).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
           for r in rows}
    assert got == {
        (1, 0, 9, 10, 10 - SPAN_K + 1),
        (2, 0, 9, 10, 10 - SPAN_K + 1),
    }


def test_q60_within_doc_repeat_yields_two_islands(spark, tmp_docs):
    # one doc repeats the same 8-token run at positions 0 and 18 (gap
    # > SPAN_K, so the islands must NOT merge); the filler is unique
    run = _tok("r", SPAN_K)
    doc = f"{run} {_tok('f', 10)} {run}"
    sf = tmp_docs([(1, doc, "en", "t", 0)])
    rows = sorted(
        q60_dup_substring_spans(spark, sf).collect(),
        key=lambda r: r.span_start,
    )
    assert [(r.span_start, r.span_end, r.span_tokens, r.n_windows)
            for r in rows] == [(0, 7, 8, 1), (18, 25, 8, 1)]


def test_q60_adjacent_windows_merge_short_docs_excluded(spark, tmp_docs):
    # duplicated windows at positions 0 and SPAN_K (touching, gap == SPAN_K)
    # merge into one island; a doc shorter than SPAN_K produces nothing
    run = _tok("r", 2 * SPAN_K)
    sf = tmp_docs(
        [
            (1, run, "en", "t", 0),
            (2, run, "en", "t", 0),
            (3, _tok("x", SPAN_K - 1), "en", "t", 0),
        ]
    )
    rows = q60_dup_substring_spans(spark, sf).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    for r in rows:
        assert (r.span_start, r.span_end, r.span_tokens) == (
            0, 2 * SPAN_K - 1, 2 * SPAN_K,
        )


def test_q61_buckets_track_bigram_novelty(spark, tmp_docs):
    # docs 1-2 are identical (every bigram seen twice -> familiar, low NLL);
    # doc 3 is pure novelty (every bigram unique -> unfamiliar, high NLL)
    common = "the cat sat on the mat and the dog sat on the rug"
    sf = tmp_docs(
        [
            (1, common, "en", "t", 0),
            (2, common, "en", "t", 0),
            (3, _tok("z", 14), "en", "t", 0),
        ]
    )
    out = {r.doc_id: r for r in q61_lm_quality_buckets(spark, sf).collect()}
    assert out[1].familiar_ratio == 1.0 and out[2].familiar_ratio == 1.0
    assert out[3].familiar_ratio == 0.0
    assert out[1].bucket == "head" and out[2].bucket == "head"
    assert out[3].bucket == "tail"
    assert out[3].avg_nll_mnat > out[1].avg_nll_mnat
    # identical docs must score identically (order-independent integer sum)
    assert out[1].avg_nll_mnat == out[2].avg_nll_mnat


def test_q61_single_word_docs_excluded(spark, tmp_docs):
    sf = tmp_docs(
        [
            (1, "lonely", "en", "t", 0),
            (2, "two words here now ok fine", "en", "t", 0),
            (3, "two words here now ok fine", "en", "t", 0),
        ]
    )
    out = q61_lm_quality_buckets(spark, sf).collect()
    assert {r.doc_id for r in out} == {2, 3}
