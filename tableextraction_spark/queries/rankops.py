"""Ranking ops a training-data pipeline runs at corpus scale, each with a
TRUE cross-engine oracle (value-hash compared, not empty-on-success):

- q57: TF-IDF top terms over the real ``documents`` table — tokenize →
  explode → two aggregations → join → per-doc window top-k.  The ranking
  key is (tf DESC, df ASC, term ASC): integer-deterministic, so the
  cross-engine hash cannot be broken by float ulps while keeping the
  tf-idf ordering semantics (idf is monotone decreasing in df).
- q58: PageRank, 3 damped power iterations over a deterministic edge
  lattice synthesized identically on both engines — the iterative
  shuffle-join shape (join ranks to edges on src, re-aggregate by dst)
  that stresses exactly what a 100 TB link graph stresses.

Scale shape: q57 is explode → map-side-combinable groupBys; the df join
shuffles on term (vocabulary-sized — NOT broadcastable at corpus scale,
deliberately a shuffle join).  q58's per-iteration plan is
edges ⋈ ranks (hash-partitioned on src) → groupBy(dst); at a real graph
scale the edges frame is pre-partitioned once and reused every iteration,
and lineage is truncated every few rounds (the q43 fixpoint precedent —
``localCheckpoint``); 3 fixed iterations need neither.

Float determinism: q58 rounds the final rank to 9 dp on BOTH engines
before the driver's 6-significant-digit normalization — per-node in-sums
span ≤4 addends, so cross-engine ulp drift is far below the rounding
grain.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

TOP_K = 3
_PR_N = 60
_PR_DAMP = 0.85
_PR_ITERS = 3


def q57_tfidf_top_terms(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
    ).where(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_, "term")
        .select("doc_id", "term", "tf", "df", F.row_number().over(w).alias("rank"))
        .where(F.col("rank") <= TOP_K)
    )


Q57_SQL = f"""
WITH tok AS (
  SELECT doc_id, t AS term
  FROM documents, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE t <> ''
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT doc_id, term, tf, df, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
         ) AS rank
  FROM tf JOIN df USING (term)
) WHERE rank <= {TOP_K}
"""


def _pr_edges(spark):
    """Deterministic lattice: every node emits 2-3 out-edges; no node is
    dangling ((7i+1) and (13i+3) mod 60 never coincide: 6i ≡ 2 (mod 60)
    has no solution), so no dangling-mass redistribution term is needed."""
    n = F.col("node")
    nodes = spark.range(_PR_N).select(F.col("id").cast("int").alias("node"))
    edges = (
        nodes.select(
            n.alias("src"),
            F.explode(
                F.array(
                    (n * 7 + 1) % _PR_N,
                    (n * 13 + 3) % _PR_N,
                    F.when(n % 3 == 0, (n + 1) % _PR_N),
                )
            ).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .distinct()
    )
    return nodes, edges


def q58_pagerank(spark, sf_dir):
    nodes, edges = _pr_edges(spark)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ew = edges.join(outdeg, "src")
    ranks = nodes.select("node", F.lit(1.0 / _PR_N).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit(0.15 / _PR_N)
                + F.lit(_PR_DAMP) * F.coalesce("contrib", F.lit(0.0))
            ).alias("pr"),
        )
    return ranks.select("node", F.round("pr", 9).alias("pr"))


_PR_ITER_SQL = """
r{k} AS (
  SELECT n.node, 0.15::DOUBLE / {n} + 0.85 * coalesce(s.contrib, 0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.pr / od.outdeg) AS contrib
    FROM e JOIN od USING (src) JOIN r{j} r ON r.node = e.src
    GROUP BY e.dst
  ) s USING (node)
)"""

Q58_SQL = (
    """
WITH nodes AS (SELECT unnest(range({n})) AS node),
raw AS (
  SELECT node AS src, (node * 7 + 1) % {n} AS dst FROM nodes
  UNION ALL SELECT node, (node * 13 + 3) % {n} FROM nodes
  UNION ALL SELECT node, (node + 1) % {n} FROM nodes WHERE node % 3 = 0
),
e AS (SELECT DISTINCT src, dst FROM raw),
od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, 1.0::DOUBLE / {n} AS pr FROM nodes),"""
    + ",".join(_PR_ITER_SQL.format(k=k, j=k - 1, n=_PR_N) for k in (1, 2, 3))
    + """
SELECT node, round(pr, 9) AS pr FROM r3
"""
).format(n=_PR_N)


QUERIES = {
    "q57_tfidf_top_terms": (q57_tfidf_top_terms, Q57_SQL),
    "q58_pagerank": (q58_pagerank, Q58_SQL),
}
