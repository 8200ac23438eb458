"""Similarity search over the `embeddings` table (array<float>, 64-dim):
brute-force cosine top-k (the exact baseline), bit-sampling LSH buckets
(the scale path), and LSH-bucketed near-duplicate pairs.

Pure Catalyst expressions: dot products via ``zip_with`` + ``aggregate``
(sequential fold — same FP association as DuckDB's ``list_sum`` over the same
order, so values match bit-for-bit before the defensive ROUND).  The query
side of the top-k is broadcast; at production scale the LSH bucket join
replaces the cross product (bucket count bounds the join fan-out).

A production ANN would use random-hyperplane SRP with a broadcast projection
matrix inside a pandas_udf (or IVF with k-means centroids); the bit-sampling
variant here keeps the exact same plan shape with an engine-portable hash so
the oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

_TO_D = "transform(embedding, x -> CAST(x AS DOUBLE))"

_DOT = "aggregate(zip_with(qv, ev, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate(transform({v}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"

N_QUERIES = 5
TOP_K = 10
N_LSH_BITS = 8
# production near-dup threshold is ~0.95; the synthetic embeddings have no
# true near-dups (max intra-bucket cosine ≈ 0.43 at sf0.01), so the test-scale
# τ is set where the operator provably returns rows
NEAR_DUP_TAU = 0.35


def _cos_spark() -> str:
    return (
        f"ROUND({_DOT} / ({_NORM.format(v='qv')} * {_NORM.format(v='ev')}), 4)"
    )


def _cos_duck(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
    norm = "sqrt(list_sum(list_transform({v}, x -> x * x)))"
    return f"ROUND({dot} / ({norm.format(v=a)} * {norm.format(v=b)}), 4)"


# --- q20: brute-force cosine top-k (exact ANN baseline) ---

def q20_ann_cosine_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_TO_D} AS ev"
    )
    q = (
        load(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_QUERIES)
        .selectExpr("vec_id AS q_id", f"{_TO_D} AS qv")
    )
    scored = F.broadcast(q).crossJoin(e).selectExpr(
        "q_id", "vec_id", f"{_cos_spark()} AS cos_sim"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rank")
    )


Q20_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
     q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {N_QUERIES}),
     scored AS (
       SELECT q_id, vec_id, {_cos_duck('qv', 'ev')} AS cos_sim
       FROM q CROSS JOIN e)
SELECT q_id, vec_id, cos_sim, rank FROM (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored) WHERE rank <= {TOP_K}
"""


# --- q21: bit-sampling LSH bucket assignment (the ANN scale path) ---

_BUCKET_SPARK = f"""
CAST(aggregate(sequence(0, {N_LSH_BITS - 1}), 0,
  (acc, k) -> acc + IF(element_at(embedding, k + 1) >= 0, shiftleft(1, k), 0)) AS INT)
"""
_BUCKET_DUCK = f"""
CAST(list_sum(list_transform(range(0, {N_LSH_BITS}),
  k -> CASE WHEN embedding[k + 1] >= 0 THEN (1 << k) ELSE 0 END)) AS INT)
"""


def q21_lsh_buckets(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.selectExpr("vec_id", "label", f"{_BUCKET_SPARK} AS bucket")


Q21_SQL = f"SELECT vec_id, label, {_BUCKET_DUCK} AS bucket FROM embeddings"


# --- q22: LSH-bucketed near-duplicate pairs (embedding-cosine dedup) ---

def q22_embedding_near_dups(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings").selectExpr(
        "vec_id", f"{_TO_D} AS ev", f"{_BUCKET_SPARK} AS bucket"
    )
    a = e.selectExpr("vec_id AS a_id", "ev AS qv", "bucket")
    b = e.selectExpr("vec_id AS b_id", "ev AS ev", "bucket")
    return (
        a.join(b, "bucket")
        .where(F.col("a_id") < F.col("b_id"))
        .selectExpr("a_id", "b_id", f"{_cos_spark()} AS cos_sim")
        .where(F.col("cos_sim") >= NEAR_DUP_TAU)
    )


Q22_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev, {_BUCKET_DUCK} AS bucket
           FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_cos_duck('a.ev', 'b.ev')} AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_cos_duck('a.ev', 'b.ev')} >= {NEAR_DUP_TAU}
"""


# --- q26: IVF (inverted-file) ANN — the centroid-probe scale path ---
#
# Deterministic IVF: every CENT_MOD-th vector is a coarse centroid (k-means
# init step; deterministic so the oracle can mirror it).  Assignment is a
# ZERO-SHUFFLE projection: the centroid set is reduced to ONE row holding an
# array<struct> and broadcast-cross-joined, so each vector computes its
# argmax-score centroid inside a Catalyst `aggregate` lambda — no N×K
# shuffle, no window.  Queries probe their NPROBE nearest centroids and
# score only those inverted lists (probe side broadcast), so at 100 TB the
# scored candidate set is ~NPROBE/K of the corpus instead of all of it.
# Scores compare dot/centroid_norm (argmax-equivalent to cosine: the query
# norm is constant per row) to keep the FP comparison identical on both
# engines; the reported cos_sim is the full cosine, rounded like q20.

CENT_MOD = 32
NPROBE = 2


def _dot2(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS DOUBLE), (s2, v2) -> s2 + v2)"
    )


def q26_ivf_ann(spark, sf_dir):
    e = (
        load(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", f"{_TO_D} AS ev")
        .selectExpr("vec_id", "ev", f"{_NORM.format(v='ev')} AS en")
    )
    cents = (
        e.where(F.col("vec_id") % CENT_MOD == 0)
        .selectExpr(
            "named_struct('cid', CAST(vec_id AS INT), 'cv', ev, 'cn', en) AS c"
        )
        .groupBy()
        .agg(F.expr("sort_array(collect_list(c))").alias("cents"))
    )
    score_c = f"{_dot2('c.cv', 'ev')} / c.cn"  # argmax-equivalent to cosine
    # score each centroid ONCE, then argmax via array_position(max): ties
    # resolve to the first (lowest-cid) occurrence, matching the oracle's
    # ORDER BY score DESC, cid ASC
    assign = (
        e.crossJoin(F.broadcast(cents))
        .selectExpr(
            "vec_id", "ev", "en", "cents",
            f"transform(cents, c -> {score_c}) AS scores",
        )
        .selectExpr(
            "vec_id", "ev", "en",
            "element_at(cents, CAST(array_position(scores, array_max(scores)) AS INT)).cid AS cid",
        )
    )
    probes = (
        e.where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cents))
        .selectExpr(
            "vec_id AS q_id",
            "ev AS qv",
            "en AS qn",
            f"""transform(slice(array_sort(transform(cents,
                   c -> named_struct('negs', -({score_c}), 'cid', c.cid))),
                 1, {NPROBE}), p -> p.cid) AS cids""",
        )
        .selectExpr("q_id", "qv", "qn", "explode(cids) AS cid")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cid")
        .selectExpr(
            "q_id",
            "vec_id",
            f"ROUND({_dot2('qv', 'ev')} / (qn * en), 4) AS cos_sim",
        )
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cos_sim", "rank")
    )


_DOT_DUCK = (
    "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
)
_NORM_DUCK = "sqrt(list_sum(list_transform({v}, x -> x * x)))"

Q26_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
     en AS (SELECT vec_id, ev, {_NORM_DUCK.format(v='ev')} AS en FROM e),
     cents AS (SELECT vec_id AS cid, ev AS cv, en AS cn
               FROM en WHERE vec_id % {CENT_MOD} = 0),
     assign AS (
       SELECT vec_id, ev, en, cid FROM (
         SELECT n.vec_id, n.ev, n.en, c.cid,
                ROW_NUMBER() OVER (
                  PARTITION BY n.vec_id
                  ORDER BY ({_DOT_DUCK.format(a='c.cv', b='n.ev')} / c.cn) DESC,
                           c.cid ASC) AS rn
         FROM en n CROSS JOIN cents c) WHERE rn = 1),
     probes AS (
       SELECT q_id, qv, qn, cid FROM (
         SELECT n.vec_id AS q_id, n.ev AS qv, n.en AS qn, c.cid,
                ROW_NUMBER() OVER (
                  PARTITION BY n.vec_id
                  ORDER BY ({_DOT_DUCK.format(a='c.cv', b='n.ev')} / c.cn) DESC,
                           c.cid ASC) AS rn
         FROM en n CROSS JOIN cents c WHERE n.vec_id < {N_QUERIES})
       WHERE rn <= {NPROBE}),
     cand AS (
       SELECT p.q_id, a.vec_id,
              ROUND({_DOT_DUCK.format(a='p.qv', b='a.ev')} / (p.qn * a.en), 4)
                AS cos_sim
       FROM probes p JOIN assign a ON p.cid = a.cid)
SELECT q_id, vec_id, cos_sim, rank FROM (
  SELECT q_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cand) WHERE rank <= {TOP_K}
"""


QUERIES = {
    "q20_ann_cosine_topk": (q20_ann_cosine_topk, Q20_SQL),
    "q21_lsh_buckets": (q21_lsh_buckets, Q21_SQL),
    "q22_embedding_near_dups": (q22_embedding_near_dups, Q22_SQL),
    "q26_ivf_ann": (q26_ivf_ann, Q26_SQL),
}
