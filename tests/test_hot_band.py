"""Hot-band behavior of the MinHash dedup path (r3 verdict ask #1).

A crawl's template band — n near-identical docs sharing one LSH band —
previously generated C(n,2) pairs in a single task (124,750 at n=500).
The sorted-neighborhood cap bounds that to ≤ n·BAND_WINDOW pairs while
keeping the band CHAIN-connected, so fixpoint clustering still merges
every copy into one cluster: the cap engages with a logged drop count
and dedup stays CORRECT, strictly better than dropping the band.
"""

import pytest

from tableextraction_spark.queries.pipelineops import (
    J_MIN,
    cluster_pairs_fixpoint,
)
from tableextraction_spark.queries.textops import (
    BAND_WINDOW,
    q14_hot_band_report,
    q14_minhash_band_pairs,
)

N_HOT = 500
TEMPLATE = (
    "breaking news widget copyright footer navigation subscribe newsletter "
    "terms of service privacy policy all rights reserved contact about"
)


@pytest.fixture(scope="module")
def hot_dir(spark, tmp_path_factory):
    """documents.parquet: 500 identical template docs + 40 distinct docs."""
    sf_dir = str(tmp_path_factory.mktemp("hotband"))
    rows = [(i, TEMPLATE, "en", "tmpl", len(TEMPLATE)) for i in range(N_HOT)]
    rows += [
        (10_000 + i, f"unique document number {i} " * 4 + f"tail {i * 7}", "en",
         "uniq", 40)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).repartition(8).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_hot_band_pairs_linear_not_quadratic(spark, hot_dir):
    pairs = q14_minhash_band_pairs(spark, hot_dir)
    n = pairs.count()
    # identical docs: full windows for the first N-W docs + shrinking tail
    expect_hot = BAND_WINDOW * (N_HOT - BAND_WINDOW) + BAND_WINDOW * (
        BAND_WINDOW - 1
    ) // 2
    assert n >= expect_hot  # the hot band's capped pairs are all present
    assert n <= expect_hot + 200  # …and nowhere near C(500,2)=124750
    # every emitted template pair is an exact duplicate
    hot = pairs.where("a_id < 10000 AND b_id < 10000")
    assert hot.where("jaccard != 1.0").count() == 0


def test_hot_band_report_logs_drop_count(spark, hot_dir):
    rows = q14_hot_band_report(spark, hot_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.bsize == N_HOT
    assert r.pairs_emitted == BAND_WINDOW * (N_HOT - BAND_WINDOW) + BAND_WINDOW * (
        BAND_WINDOW - 1
    ) // 2
    assert r.pairs_skipped == N_HOT * (N_HOT - 1) // 2 - r.pairs_emitted
    assert r.pairs_skipped > 0


def test_hot_band_still_dedups_to_one_cluster(spark, hot_dir):
    """The reason the window cap beats q22-style band dropping: adjacent
    pairs chain-connect the band, so all 500 copies merge into ONE cluster
    with one canonical survivor."""
    pairs = (
        q14_minhash_band_pairs(spark, hot_dir)
        .where(f"jaccard >= {J_MIN} AND a_id < 10000 AND b_id < 10000")
        .select("a_id", "b_id")
    )
    clusters = cluster_pairs_fixpoint(pairs)
    assert clusters.count() == N_HOT
    assert clusters.select("canon_id").distinct().count() == 1
