"""HTML main-content extraction as driver-contract queries.

The north rule names "HTML boilerplate strip … DOM heuristics" as part of
the main-content pipeline; like the raster flagship (extraction.py), DOM
parsing is not ANSI-SQL-expressible, so every check is stated
**empty-on-success** with a ``WHERE 1=0`` oracle — rows/schema/hash match
exactly when extraction is perfect, any regression emits rows and flips the
driver's hard gate red:

* q37 — full golden verify: documents whose pipeline output spans differ
  from the plan-derived goldens under the (kind, text, media_ref, order)
  span-sequence invariant;
* q38 — per-(doc, kind) span-count invariant (the weaker structural check,
  mirroring q30 for the raster path);
* q39 — boilerplate no-leak: output spans containing the fixture sentinel
  token that occurs in every boilerplate chunk and no content word;
* q41 — object-row `<table>` harvest vs plan goldens (the relational form);
* q42 — outlink harvest (every anchor, boilerplate included, in document
  order) vs renderer-derived goldens — the link-graph / crawl-frontier op;
* q44 — crawl-frontier URL normalization (resolve `<base href>`, lowercase
  scheme/host, strip default port + fragment) vs an independent fixture-side
  oracle, plus a per-doc dedup-on-norm witness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..fixtures.html_gen import SENTINEL, html_docs_dataframe, html_expected_dataframe
from ..pipeline import extract_spans
from .extraction import _n_docs_for  # one corpus-sizing rule for all fixtures


def _output(spark, sf_dir):
    n = _n_docs_for(sf_dir)
    docs = html_docs_dataframe(spark, n)
    return extract_spans(spark, docs, None, html=True), n


def q37_html_extract_verify(spark, sf_dir):
    """Empty-on-success golden verify for the HTML main-content path."""
    out, n = _output(spark, sf_dir)
    exp = html_expected_dataframe(spark, n).withColumnRenamed("spans", "expected")
    return (
        out.join(exp, "doc_id", "full")
        .where(~F.col("spans").eqNullSafe(F.col("expected")))
        .selectExpr("doc_id", "size(spans) AS n_spans", "size(expected) AS n_expected")
    )


Q37_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id,
       CAST(NULL AS INT) AS n_spans,
       CAST(NULL AS INT) AS n_expected
WHERE 1 = 0
"""


def q38_html_count_invariant(spark, sf_dir):
    """Per-(doc, kind) span counts of the html pipeline output must equal the
    plan's counts (empty-on-success)."""
    out, n = _output(spark, sf_dir)
    got = (
        out.select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_out"))
    )
    exp = (
        html_expected_dataframe(spark, n)
        .select("doc_id", F.explode("spans").alias("s"))
        .groupBy("doc_id", F.col("s.kind").alias("kind"))
        .agg(F.count("*").alias("n_expected"))
    )
    return (
        got.join(exp, ["doc_id", "kind"], "full")
        .where(~F.col("n_out").eqNullSafe(F.col("n_expected")))
        .select("doc_id", "kind", "n_out", "n_expected")
    )


Q38_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS BIGINT) AS n_out, CAST(NULL AS BIGINT) AS n_expected
WHERE 1 = 0
"""


def q39_html_boilerplate_leak(spark, sf_dir):
    """No output span may contain the boilerplate sentinel (empty-on-success).

    Independent of the goldens: even if the plan and parser agreed on a wrong
    answer, a nav/ad/footer/script leak would surface here."""
    out, _n = _output(spark, sf_dir)
    return (
        out.select("doc_id", F.explode("spans").alias("s"))
        .where(
            F.col("s.text").contains(SENTINEL) | F.col("s.media_ref").contains(SENTINEL)
        )
        .select(
            "doc_id",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
        )
    )


Q39_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS INT) AS offset,
       CAST(NULL AS VARCHAR) AS kind
WHERE 1 = 0
"""


def q41_html_table_harvest_verify(spark, sf_dir):
    """The RELATIONAL html form (`extract_html_objects` — object rows, no
    document assembly) harvests exactly the plan's `<table>` structures:
    multiset difference of (doc_id, payload-md5) in both directions, stated
    empty-on-success.  Covers the corpus-wide-harvesting path the in-place
    rewrite (q37) does not exercise."""
    from ..fixtures.html_gen import html_docs_dataframe, html_expected_dataframe
    from ..operators.html_extract import extract_html_objects

    n = _n_docs_for(sf_dir)
    harvested = (
        extract_html_objects(html_docs_dataframe(spark, n))
        .where((F.col("kind") == "table") & F.col("error").isNull())
        .select("doc_id", F.md5("text").alias("payload_md5"))
    )
    expected = (
        html_expected_dataframe(spark, n)
        .select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "table")
        .select("doc_id", F.md5(F.col("s.text")).alias("payload_md5"))
    )
    return harvested.exceptAll(expected).unionAll(expected.exceptAll(harvested))


Q41_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS VARCHAR) AS payload_md5
WHERE 1 = 0
"""


QUERIES = {
    "q37_html_extract_verify": (q37_html_extract_verify, Q37_SQL),
    "q38_html_count_invariant": (q38_html_count_invariant, Q38_SQL),
    "q39_html_boilerplate_leak": (q39_html_boilerplate_leak, Q39_SQL),
    "q41_html_table_harvest_verify": (q41_html_table_harvest_verify, Q41_SQL),
}


def q42_html_outlinks_verify(spark, sf_dir):
    """Outlink harvest (link-graph / crawl-frontier view: EVERY anchor,
    boilerplate included, in document order) must equal the renderer-derived
    goldens — multiset difference over (doc_id, link_no, href, anchor-md5),
    both directions, empty-on-success."""
    from ..fixtures.html_gen import html_expected_links_dataframe
    from ..operators.html_extract import extract_outlinks

    n = _n_docs_for(sf_dir)
    harvested = (
        extract_outlinks(html_docs_dataframe(spark, n))
        .where(F.col("error").isNull())
        .select("doc_id", "link_no", "href", F.md5("anchor").alias("anchor_md5"))
    )
    expected = html_expected_links_dataframe(spark, n).select(
        "doc_id", "link_no", "href", F.md5("text").alias("anchor_md5")
    )
    return harvested.exceptAll(expected).unionAll(expected.exceptAll(harvested))


Q42_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS INT) AS link_no,
       CAST(NULL AS VARCHAR) AS href, CAST(NULL AS VARCHAR) AS anchor_md5
WHERE 1 = 0
"""

QUERIES["q42_html_outlinks_verify"] = (q42_html_outlinks_verify, Q42_SQL)


def q44_html_outlink_norm_verify(spark, sf_dir):
    """Crawl-frontier URL normalization, empty-on-success, two checks
    union'd: (a) multiset diff of (doc_id, link_no, norm) between the
    harvest and the fixture-side normalization oracle (an independent
    string-partition reimplementation — differential, not self-checking);
    (b) frontier-dedup witness: every fixture doc carries two raw-distinct /
    norm-equal footer links, so per doc ``countDistinct(norm)`` must be
    strictly below ``countDistinct(href)`` — if normalization degraded to
    identity, every doc emits a row here."""
    from ..fixtures.html_gen import html_expected_links_dataframe
    from ..operators.html_extract import extract_outlinks

    n = _n_docs_for(sf_dir)
    harvested = extract_outlinks(html_docs_dataframe(spark, n)).where(
        F.col("error").isNull()
    )
    got = harvested.select("doc_id", "link_no", "norm")
    exp = html_expected_links_dataframe(spark, n).select("doc_id", "link_no", "norm")
    mismatch = got.exceptAll(exp).unionAll(exp.exceptAll(got))
    undeduped = (
        harvested.groupBy("doc_id")
        .agg(
            F.countDistinct("href").alias("n_href"),
            F.countDistinct("norm").alias("n_norm"),
        )
        .where(F.col("n_norm") >= F.col("n_href"))
        .select(
            "doc_id",
            F.lit(-1).alias("link_no"),
            F.lit("frontier dedup on norm did not collapse").alias("norm"),
        )
    )
    return mismatch.unionAll(undeduped)


Q44_SQL = """
SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS INT) AS link_no,
       CAST(NULL AS VARCHAR) AS norm
WHERE 1 = 0
"""

QUERIES["q44_html_outlink_norm_verify"] = (q44_html_outlink_norm_verify, Q44_SQL)
