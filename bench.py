"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "extract_docs_per_sec": ..., "extract_pages_per_sec": ...}

The extraction corpus (BASELINE.json input_hint shape) is synthesized
deterministically and materialized to parquet once per scale (cached under
/tmp/tablex_bench), so the timed extraction run reads parquet → pipeline →
count, exactly like a production run reads Iceberg — generation cost is not
counted.  Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py and recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_segment_revenue",
    "q05_top2_orders_per_customer",
    "q06_sessionize",
    "q13_minhash_signature",
    "q14_minhash_band_pairs",
    "q20_ann_cosine_topk",
    "q22_embedding_near_dups",
    "q26_ivf_ann",
    "q27_winnow_fingerprint",
]

BENCH_ROOT = os.environ.get("TABLEX_BENCH_DIR", "/tmp/tablex_bench")


def _consume(df) -> None:
    """Force FULL computation of a DataFrame for timing.

    NOT ``count()``: Catalyst legitimately eliminates a left outer join with
    a unique right key (row count is preserved) and prunes unused aggregate
    expressions under a count, so ``extract_spans(...).count()`` never runs
    the decode stage at all.  The ``noop`` sink consumes every row end-to-end
    like a real write, minus the I/O.
    """
    df.write.format("noop").mode("overwrite").save()


def ensure_corpus(spark, n_docs: int) -> tuple[str, str]:
    """Materialize the synthetic corpus parquet once per (n_docs)."""
    base = os.path.join(BENCH_ROOT, f"n{n_docs}")
    docs_path, blobs_path = f"{base}/docs.parquet", f"{base}/blobs.parquet"
    marker = f"{base}/_READY"
    if not os.path.exists(marker):
        from tableextraction_spark.fixtures.spark_gen import (
            blobs_dataframe,
            docs_dataframe,
            write_blobs,
        )

        docs_dataframe(spark, n_docs).write.mode("overwrite").parquet(docs_path)
        write_blobs(blobs_dataframe(spark, n_docs), blobs_path)
        open(marker, "w").close()
    return docs_path, blobs_path


def bench_extraction(spark, n_docs: int) -> dict:
    from tableextraction_spark.pipeline import extract_spans

    docs_path, blobs_path = ensure_corpus(spark, n_docs)
    docs = spark.read.parquet(docs_path)
    n_pages = spark.read.parquet(blobs_path).count()  # metadata-only, untimed
    # One full untimed pass: warms the OS page cache on the blob parquet,
    # spins up + imports numpy in all 32 Python workers, and JITs the JVM
    # paths.  Measured: cold 16.5 s vs steady-state 4-5 s on the same corpus
    # — a production job runs for hours, so steady-state is the honest
    # throughput; best-of-2 timed passes filters host noise.
    _consume(extract_spans(spark, docs, blobs_path))
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _consume(extract_spans(spark, docs, blobs_path))
        dt = min(dt, time.time() - t0)
    n_rows = n_docs
    return {
        "sec": round(dt, 3),
        "n_docs": n_docs,
        "n_pages": n_pages,
        "out_rows": n_rows,
        "docs_per_sec": round(n_docs / dt, 2),
        "pages_per_sec": round(n_pages / dt, 2),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from tableextraction_spark.queries import REGISTRY
    from tableextraction_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()  # JVM warmup outside any timing

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        best = float("inf")
        for _ in range(2):  # best-of-2: first run pays scan/cache warmup
            t0 = time.time()
            _consume(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # the extraction corpus must be big enough that steady-state decode
    # dominates scheduling latency (~7k pages ≈ 6-12 s at local[32]);
    # generated once and cached under TABLEX_BENCH_DIR
    n_docs = int(os.environ.get("TABLEX_BENCH_DOCS", "0")) or max(
        64, int(round(sf * 30000))
    )
    ext = bench_extraction(spark, n_docs)
    timings["q00_extract_spans"] = ext["sec"]

    result = {
        "metric": "headline query suite wall time (extraction + relational/text/vector ops)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "extract_docs_per_sec": ext["docs_per_sec"],
        "extract_pages_per_sec": ext["pages_per_sec"],
        "extract_n_docs": ext["n_docs"],
        "extract_n_pages": ext["n_pages"],
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
