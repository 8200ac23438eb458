"""Distributed synthetic-corpus materialization: generation runs inside Spark
tasks (mapInPandas over a doc-number range), so bench-scale corpora never
flow through the driver.  Pure function of doc_num → identical corpus at any
parallelism (the property the scaling benchmark relies on).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..pipeline import BLOBS_SCHEMA, DOCS_SCHEMA
from .generate import gen_doc


def docs_dataframe(spark: SparkSession, n_docs: int, parts: int | None = None) -> DataFrame:
    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i), with_blobs=False)[0] for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(gen, DOCS_SCHEMA)


def blobs_dataframe(
    spark: SparkSession,
    n_docs: int,
    parts: int | None = None,
    codec: str = "img1",
) -> DataFrame:
    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                _, blobs, _ = gen_doc(int(i), with_blobs=True, codec=codec)
                out.extend(blobs)
            yield pd.DataFrame(
                out, columns=["media_ref", "doc_id", "page_no", "content"]
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(gen, BLOBS_SCHEMA)


def expected_dataframe(spark: SparkSession, n_docs: int, parts: int | None = None) -> DataFrame:
    """Golden output spans (plan-derived, independent of the kernel)."""
    parts = parts or min(n_docs, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i), with_blobs=False)[2] for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": [r["doc_id"] for r in rows], "spans": [r["spans"] for r in rows]}
            )

    return spark.range(n_docs).repartition(parts).mapInPandas(gen, DOCS_SCHEMA)


# Media tables must be WRITTEN with small row groups: the row group is the
# atomic scan split, and at ~0.5 MB per page the parquet default (128 MB)
# packs hundreds of pages into one split — parallelism collapses to
# #row-groups and a single split materializes GBs.  ~8 MB ≈ 14 pages keeps
# splits cheap and plentiful (same rule applies to production media tables).
MEDIA_ROW_GROUP_BYTES = 8 * 1024 * 1024


def write_blobs(df, path: str) -> None:
    df.write.option("parquet.block.size", MEDIA_ROW_GROUP_BYTES).mode(
        "overwrite"
    ).parquet(path)
