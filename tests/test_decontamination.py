"""Decontamination tiers (q36 verbatim, q45 fuzzy).

The defining fixture: a PARAPHRASED eval doc — every 3rd word substituted,
which leaves ZERO intact word-3-grams — must be caught by the fuzzy
MinHash-banded bigram tier and missed by the verbatim shingle-count tier;
an exact copy is caught by both; unrelated docs by neither.
"""

from tableextraction_spark.queries.pipelineops import (
    CONTAM_T,
    FUZZY_J,
    fuzzy_contamination_pairs,
    verbatim_contamination_pairs,
)

EVAL_ID = 107  # 107 % 100 == 7 → member of the stand-in eval set


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _fixture_rows():
    words = [f"tok{i}" for i in range(24)]
    eval_text = " ".join(words)
    para = list(words)
    for i in range(0, len(para), 3):  # period-3 substitution: no 3-gram survives
        para[i] = f"syn{i}"
    return [
        (EVAL_ID, eval_text),
        (1, " ".join(para)),                                # paraphrased leak
        (2, " ".join(f"other{i}" for i in range(24))),      # unrelated
        (3, eval_text),                                     # verbatim leak
    ]


def test_paraphrase_caught_by_fuzzy_missed_by_verbatim(spark):
    docs = _mk_docs(spark, _fixture_rows())
    fuzzy = {(r.doc_id, r.eval_id) for r in fuzzy_contamination_pairs(docs).collect()}
    verb = {(r.doc_id, r.eval_id) for r in verbatim_contamination_pairs(docs).collect()}
    assert (1, EVAL_ID) in fuzzy, "fuzzy tier must catch the paraphrase"
    assert (1, EVAL_ID) not in verb, "period-3 paraphrase leaves no 3-gram"
    assert (3, EVAL_ID) in fuzzy and (3, EVAL_ID) in verb, "verbatim copy: both"
    assert all(d != 2 for d, _ in fuzzy | verb), "unrelated doc flagged"


def test_paraphrase_shape_math(spark):
    """Pin WHY the fixture behaves as it does: the paraphrase's verbatim
    3-gram overlap is zero (below CONTAM_T) while its bigram Jaccard clears
    FUZZY_J — if thresholds drift, this explains the failure."""
    rows = _fixture_rows()
    eval_words = rows[0][1].split()
    para_words = rows[1][1].split()
    tri = lambda ws: {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    bi = lambda ws: {" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)}
    shared_tri = len(tri(eval_words) & tri(para_words))
    assert shared_tri == 0 < CONTAM_T
    b_e, b_p = bi(eval_words), bi(para_words)
    j = len(b_e & b_p) / len(b_e | b_p)
    assert j >= FUZZY_J


def test_fuzzy_eval_side_broadcasts(spark):
    """Plan audit: the candidate join is broadcast (eval side is a benchmark
    suite) — no SortMergeJoin / CartesianProduct in the fuzzy tier."""
    docs = _mk_docs(spark, _fixture_rows())
    plan = fuzzy_contamination_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
