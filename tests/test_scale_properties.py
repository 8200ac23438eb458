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
