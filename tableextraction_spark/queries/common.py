"""Shared helpers for the query suite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def sf_of(sf_dir: str) -> float:
    """Scale factor parsed from the sf-dir name — ONE parsing rule for every
    fixture-sizing helper (per-module caps stay local)."""
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.001
