"""Fixpoint near-dup clustering: the production dedup decision must merge
duplication CHAINS the bounded 3-pass oracle form provably cannot, agree with
it wherever both are correct, and abort loudly instead of emitting
half-merged clusters."""

import pytest
from pyspark.sql import functions as F

from tableextraction_spark.queries.pipelineops import (
    LP_ITERS,
    cluster_pairs_fixpoint,
    q33_neardup_clusters,
    q43_neardup_fixpoint_verify,
)

SF_DIR = "/root/testdata/sf0.001"


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "a_id long, b_id long")


def _bounded_lp(spark, pairs, iters=LP_ITERS):
    """The q33 3-pass propagation, applied to an explicit pair list (mirrors
    q33_neardup_clusters exactly, minus the corpus-derived pair source)."""
    p = _pairs_df(spark, pairs)
    edges = p.unionByName(p.selectExpr("b_id AS a_id", "a_id AS b_id"))
    lab = edges.selectExpr("a_id AS v").distinct().selectExpr("v", "v AS lab")
    for _ in range(iters):
        nl = (
            edges.selectExpr("a_id AS v", "b_id AS u")
            .join(lab.selectExpr("v AS u", "lab"), "u")
            .select("v", "lab")
        )
        lab = lab.unionByName(nl).groupBy("v").agg(F.min("lab").alias("lab"))
    return {r.v: r.lab for r in lab.collect()}


def test_chain_merges_what_three_passes_cannot(spark):
    """a-b-c-d-e adjacent near-dups (diameter 4): 3 passes leave two labels;
    the fixpoint path must produce ONE cluster with canon = min id."""
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    bounded = _bounded_lp(spark, chain)
    assert len(set(bounded.values())) == 2, (
        "fixture no longer demonstrates the under-merge — extend the chain"
    )
    fix = {
        r.doc_id: r.canon_id
        for r in cluster_pairs_fixpoint(_pairs_df(spark, chain)).collect()
    }
    assert fix == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_long_chain_converges_in_logarithmic_rounds(spark):
    """Pointer jumping: a 64-node chain (diameter 63) must converge well
    under 63 rounds — the cap would abort plain per-hop propagation."""
    n = 64
    chain = [(i, i + 1) for i in range(1, n)]
    out = cluster_pairs_fixpoint(_pairs_df(spark, chain), max_rounds=14)
    got = {r.doc_id: r.canon_id for r in out.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_multiple_components_stay_separate(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    got = {
        r.doc_id: r.canon_id
        for r in cluster_pairs_fixpoint(_pairs_df(spark, pairs)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_round_cap_aborts_loudly(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_pairs_fixpoint(
            _pairs_df(spark, [(i, i + 1) for i in range(1, 40)]), max_rounds=1
        )


def test_q43_empty_and_fixpoint_matches_q33_on_corpus(spark):
    """On the test corpus (cliquish clusters, diameter ≤ 3) the fixpoint and
    bounded paths must agree exactly — q43 empty, label maps identical."""
    assert q43_neardup_fixpoint_verify(spark, SF_DIR).count() == 0
    lp3 = {
        r.doc_id: r.canon_id for r in q33_neardup_clusters(spark, SF_DIR).collect()
    }
    assert lp3  # corpus has near-dup clusters; empty would vacuously pass
