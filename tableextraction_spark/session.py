"""SparkSession factory with the engine's tuned defaults.

Local mode here stands in for a multi-executor cluster: parallelism is
``local[$SPARK_GRAFT_CPUS]`` (default 32), shuffle partitions sized to cores
(not the 200 default), AQE on for runtime coalesce/skew handling, Arrow
enabled with a bounded batch size so a batch of decoded pages (~0.5 MB each)
never blows executor memory (SURVEY.md §4.3 spill/memory budget).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 64  # pages per Arrow batch through mapInArrow


def get_spark(
    app: str = "tableextraction_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "16g",
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if n in ("", "*") else int(n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        # test-scale parquet is tiny but row-heavy (10 MB ≈ 600k rows) and
        # compute-per-row dominates; small splits keep all cores busy.  At
        # production scale (100 TB, 128 MB row groups) retune toward the
        # 128m default — the knob, not the plan, changes.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        # media blobs are ~0.5 MB binary cells; the vectorized parquet
        # reader's default 4096-row batch would reserve ~2.3 GB contiguous
        # per task (observed OutOfMemoryError at 14k pages).  256 rows
        # ≈ 140 MB worst-case per scan task — the SURVEY §4.3 page-pixel
        # budget applied to the scan side.
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    )
    return builder.getOrCreate()
