"""Scale-property tests: page-level parallelism (skew), partitioning, and the
streaming windowed aggregation over events (watermark coverage)."""

from pyspark.sql import functions as F

from tableextraction_spark.fixtures import gen_corpus
from tableextraction_spark.pipeline import BLOBS_SCHEMA, detect_tables


def test_skew_doc_pages_spread_across_partitions(spark):
    # doc 5 is the 10-page skew doc; pages are the unit of parallelism, so
    # its pages must land in multiple decode partitions (SURVEY §4.3 — the
    # doc-level salting the reference would need is unnecessary by design)
    _, blobs, _ = gen_corpus(8)
    b = spark.createDataFrame(blobs, BLOBS_SCHEMA).repartition(8, "media_ref")
    parts = (
        detect_tables(b)
        .where((F.col("doc_id") == "doc-000005") & (F.col("obj_no") == -1))
        .select("partition_id")
        .distinct()
        .count()
    )
    assert parts > 1


def test_streaming_windowed_events_with_watermark(spark, tmp_path):
    # Structured-Streaming windowed agg with late-data watermark over the
    # driver's events table — the streaming counterpart of q06 sessionize;
    # results must equal the same aggregation run in batch.
    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    agg_stream = (
        spark.readStream.schema(schema)
        .parquet("/root/testdata/sf0.001")  # dir holds only parquet files; filter below
    )
    # restrict to the events file's columns (other tables differ in schema →
    # use the single-file glob instead)
    agg_stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")
    )
    # events.ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP (session TZ
    # pinned to UTC so the cast is lossless)
    agg_stream = agg_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    windowed = (
        agg_stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_windows")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    got = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["v"])
        for r in spark.sql("SELECT * FROM ev_windows").collect()
    }
    q.stop()
    exp = {
        (r["window"]["start"], r["event_type"]): (r["n"], r["v"])
        for r in (
            spark.read.parquet(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "1 day"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("v"))
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_lsh_bucket_sizes_bounded_at_sf01(spark):
    """The hot-bucket guard bounds per-task pair work: after the cap, every
    band's kept buckets are ≤ BUCKET_CAP members at sf0.1, and the total
    candidate-pair count is orders of magnitude below all-pairs N²/2."""
    from pyspark.sql.window import Window as W

    from tableextraction_spark.queries import vectorops as v

    sf = "/root/testdata/sf0.1"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    n = e.count()
    base = e.crossJoin(F.broadcast(v._bits_frame(e)))
    total_pairs = 0
    for band in range(v.N_BANDS):
        sizes = (
            base.selectExpr(f"{v._bucket_spark(band)} AS bucket")
            .groupBy("bucket")
            .count()
        )
        kept = sizes.where(F.col("count") <= v.BUCKET_CAP)
        agg = kept.agg(
            F.max("count").alias("mx"),
            F.sum(F.expr("count * (count - 1) / 2")).alias("pairs"),
        ).collect()[0]
        assert agg.mx <= v.BUCKET_CAP
        total_pairs += int(agg.pairs or 0)
    # bounded far below all-pairs (the round-1 scale-killer was ~N²/256)
    assert total_pairs < n * (n - 1) / 2 / 50


def test_ivf_centroid_broadcast_guard_aborts_loudly(spark, monkeypatch):
    """The 1-row centroid broadcast grows as K·DIM·8 bytes; over the cap the
    plan must abort with the sharding message, never silently broadcast."""
    import pytest

    from tableextraction_spark.queries import vectorops as v

    monkeypatch.setattr(v, "CENT_BCAST_MAX", 1024)
    with pytest.raises(Exception, match="centroid broadcast exceeds"):
        v.q26_ivf_ann(spark, "/root/testdata/sf0.001").count()


def test_ivf_recall_regression_canary(spark):
    """Recall canary at sf0.001 (N=600 → only ~50 centroids, so recall sits
    below the sf0.1 figure by nature; measured 0.70 with the tuned config vs
    0.48 with r2's).  The real ≥0.75 gate is the sf0.1 `ivf_recall_at10`
    the bench records each round — this pins against silent config decay."""
    from tableextraction_spark.queries.vectorops import q32_ivf_recall_at10

    rows = q32_ivf_recall_at10(spark, "/root/testdata/sf0.001").collect()
    mean = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean >= 0.65, f"recall fell to {mean:.3f}"


def test_lsh_bits_scale_with_corpus(spark):
    from tableextraction_spark.queries import vectorops as v

    e500 = spark.range(500).selectExpr("CAST(id AS INT) AS vec_id")
    bits = v._bits_frame(e500).collect()[0].bits
    assert bits == 9  # ceil(log2(500))
    e100k = spark.range(100_000)
    assert v._bits_frame(e100k).collect()[0].bits == 16  # capped at MAX_BITS
    e10 = spark.range(10)
    assert v._bits_frame(e10).collect()[0].bits == 8  # floored at MIN_BITS
