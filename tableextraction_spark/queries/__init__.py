"""Query registry for the driver contract (__spark_entry__.py).

Each entry: name → (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
Oracle SQL runs on DuckDB over the same parquet (views pre-registered by the
driver).  Column names/types and float rounding are aligned on both sides so
the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from .relational import QUERIES as _REL
from .textops import QUERIES as _TEXT
from .vectorops import QUERIES as _VEC
from .extraction import QUERIES as _EXTRACT
from .pipelineops import QUERIES as _PIPE
from .htmlops import QUERIES as _HTML
from .multimodalops import QUERIES as _MM
from .scrubops import QUERIES as _SCRUB
from .warcops import QUERIES as _WARC
from .icebergops import QUERIES as _ICE
from .rankops import QUERIES as _RANK

REGISTRY: dict = {}
for part in (
    _REL, _TEXT, _VEC, _EXTRACT, _PIPE, _HTML, _MM, _SCRUB, _WARC, _ICE,
    _RANK,
):
    overlap = REGISTRY.keys() & part.keys()
    if overlap:  # pragma: no cover
        raise AssertionError(f"duplicate query names: {overlap}")
    REGISTRY.update(part)

__all__ = ["REGISTRY"]
