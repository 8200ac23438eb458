"""Corpus-curation operators: the steps a training-data pipeline runs AFTER
detection — collapsing near-duplicate pairs into clusters (the actual
"drop duplicates" decision), deterministic stratified sampling, and corpus
shape statistics.  Pure Catalyst + exact DuckDB oracles, like textops.

Scale notes inline; the shared rule: everything derives from hashes or
bounded-iteration relational passes — no driver loops, no RNG (sampling is
hash-deterministic, so reruns and resumes agree).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load
from .textops import (
    _DUCK_SH_SUB,
    _SH_FROM_WORDS,
    _WORDS,
    _WORDS_DUCK,
    Q14_SQL,
    _with_shingles,
    q14_minhash_band_pairs,
)

# --- q33: near-duplicate clusters (bounded min-label propagation) ---
#
# q14 emits candidate PAIRS; dedup needs CLUSTERS with a canonical survivor.
# Min-label propagation over the pair graph: every doc starts labeled with
# itself; each pass takes the min label over {self} ∪ neighbors.  LP_ITERS
# fixed passes make it oracle-expressible (diameter ≤ LP_ITERS covered —
# near-dup clusters are cliques-ish, diameter 1-2 in practice).  The
# PRODUCTION dedup decision is `neardup_clusters_fixpoint` below (iterate to
# convergence with pointer jumping, loud abort at the round cap); this
# bounded form survives as the cross-engine oracle, and q43 pins the two
# paths equal wherever both are correct.

J_MIN = 0.8     # exact-Jaccard near-dup threshold on verified pairs
LP_ITERS = 3


def q33_neardup_clusters(spark, sf_dir):
    pairs = (
        q14_minhash_band_pairs(spark, sf_dir)
        .where(F.col("jaccard") >= J_MIN)
        .select("a_id", "b_id")
    )
    edges = pairs.unionByName(
        pairs.selectExpr("b_id AS a_id", "a_id AS b_id")
    )
    lab = edges.selectExpr("a_id AS v").distinct().selectExpr("v", "v AS lab")
    for _ in range(LP_ITERS):
        neighbor_labs = (
            edges.selectExpr("a_id AS v", "b_id AS u")
            .join(lab.selectExpr("v AS u", "lab"), "u")
            .select("v", "lab")
        )
        lab = (
            lab.unionByName(neighbor_labs)
            .groupBy("v")
            .agg(F.min("lab").alias("lab"))
        )
    return lab.selectExpr("v AS doc_id", "lab AS canon_id")


def _lp_iter_cte(i: int) -> str:
    return f"""
l{i + 1} AS (
  SELECT v, MIN(lab) AS lab FROM (
    SELECT v, lab FROM l{i}
    UNION ALL
    SELECT e.v, u.lab FROM edges e JOIN l{i} u ON u.v = e.u)
  GROUP BY v)"""


Q33_SQL = f"""
WITH q14 AS ({Q14_SQL}),
pairs AS (SELECT a_id, b_id FROM q14 WHERE jaccard >= {J_MIN}),
edges AS (SELECT a_id AS v, b_id AS u FROM pairs
          UNION ALL
          SELECT b_id AS v, a_id AS u FROM pairs),
l0 AS (SELECT DISTINCT v, v AS lab FROM edges),
{",".join(_lp_iter_cte(i) for i in range(LP_ITERS))}
SELECT v AS doc_id, lab AS canon_id FROM l{LP_ITERS}
"""


# --- fixpoint clustering (the PRODUCTION dedup decision) + q43 verify ---
#
# q33's LP_ITERS=3 bounded passes are oracle-expressible but under-merge any
# duplication CHAIN of diameter > 3 (a-b-c-d-e with adjacent pairs ≥ J_MIN:
# 3 passes leave two clusters where there is one — a silent wrong answer at
# 100 TB).  The production path iterates to convergence: min-label
# propagation PLUS pointer jumping (lab ← lab[lab], the classic shortcut
# from PRAM connectivity, same contraction idea as Kiveris et al.'s
# large-star — "Connected Components in MapReduce and Beyond", SoCC'14), so
# rounds grow as O(log diameter), not O(diameter); each round is one shuffle
# keyed on doc_id with map-side partial mins plus one label-table self-join.
# The driver loop stops at zero label changes and aborts LOUDLY at the
# round cap — never silently emitting half-merged clusters.

LP_MAX_ROUNDS = 25  # 2^25 ≫ any real chain; hitting this means a bug/attack


def cluster_pairs_fixpoint(pairs, max_rounds: int = LP_MAX_ROUNDS):
    """(a_id, b_id) near-dup pairs → (doc_id, canon_id) connected components,
    iterated to convergence.

    Per-round lineage is truncated with an eager ``localCheckpoint`` —
    iterative DataFrame algorithms otherwise grow an exponential plan (at
    deployment prefer ``spark.sparkContext.setCheckpointDir`` + reliable
    ``checkpoint()`` so a lost executor can't force a full recompute).
    Labels only ever decrease and every label is itself a vertex, so
    convergence ⇔ zero decreases in a round.
    """
    edges = (
        pairs.selectExpr("a_id AS v", "b_id AS u")
        .unionByName(pairs.selectExpr("b_id AS v", "a_id AS u"))
        .localCheckpoint()
    )
    lab = edges.select("v").distinct().selectExpr("v", "v AS lab").localCheckpoint()
    for _ in range(max_rounds):
        neighbor = edges.join(lab.selectExpr("v AS u", "lab"), "u").select("v", "lab")
        stepped = (
            lab.unionByName(neighbor).groupBy("v").agg(F.min("lab").alias("lab"))
        )
        # pointer jumping: lab[v] ← lab[lab[v]].  min-label keeps lab[x] ≤ x,
        # so the jump only shrinks; coalesce guards the (impossible) miss.
        jumped = (
            stepped.join(
                stepped.selectExpr("v AS lab", "lab AS lab2"), "lab", "left"
            )
            .selectExpr("v", "coalesce(lab2, lab) AS lab")
            .localCheckpoint()
        )
        changed = (
            jumped.join(lab.selectExpr("v", "lab AS prev"), "v")
            .where(F.col("lab") != F.col("prev"))
            .count()
        )
        lab = jumped
        if changed == 0:
            return lab.selectExpr("v AS doc_id", "lab AS canon_id")
    raise RuntimeError(
        f"near-dup clustering did not converge in {max_rounds} rounds — "
        "pair graph is pathological (adversarial chain or data bug); "
        "refusing to emit half-merged clusters"
    )


def neardup_clusters_fixpoint(spark, sf_dir):
    """Production near-dup clusters: same pair graph as q33, iterated to
    fixpoint.  Not ANSI-SQL-expressible (unbounded iteration); verified by
    q43 (≡ q33 on corpora whose clusters have diameter ≤ LP_ITERS) and by
    the chain fixture in tests/test_neardup_fixpoint.py (merges what the
    bounded form provably cannot)."""
    pairs = (
        q14_minhash_band_pairs(spark, sf_dir)
        .where(F.col("jaccard") >= J_MIN)
        .select("a_id", "b_id")
    )
    return cluster_pairs_fixpoint(pairs)


def q43_neardup_fixpoint_verify(spark, sf_dir):
    """Empty-on-success: the fixpoint clustering must agree with the bounded
    3-pass oracle query on the test corpus (whose near-dup clusters are
    cliquish, diameter ≤ 3 — exactly the regime where both are correct).
    Any row = a doc the two paths assign different canonical ids."""
    fix = neardup_clusters_fixpoint(spark, sf_dir).withColumnRenamed(
        "canon_id", "canon_fix"
    )
    lp3 = q33_neardup_clusters(spark, sf_dir).withColumnRenamed(
        "canon_id", "canon_lp3"
    )
    return (
        fix.join(lp3, "doc_id", "full")
        .where(~F.col("canon_fix").eqNullSafe(F.col("canon_lp3")))
        .select("doc_id", "canon_fix", "canon_lp3")
    )


Q43_SQL = """
SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS canon_fix,
       CAST(NULL AS BIGINT) AS canon_lp3
WHERE 1 = 0
"""


# --- q34: deterministic stratified sample ---
#
# RNG-free sampling: bucket = first 4 hex chars of md5(doc_id) as an int
# mod 100, keep rows whose bucket < the stratum's rate.  Identical on both
# engines (the hex→int is spelled out with strpos/instr so no engine-
# specific conv() is needed), idempotent across reruns/resumes, and joins
# with nothing — a zero-shuffle scan→filter at any scale.

SAMPLE_RATES = {"en": 20}   # percent per stratum
SAMPLE_DEFAULT = 50


def _hex4_pct(md5_expr: str, posfn: str) -> str:
    digits = " + ".join(
        f"({posfn}('0123456789abcdef', substring({md5_expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({digits}) % 100)"


def _rate_case(lang_col: str) -> str:
    whens = " ".join(
        f"WHEN {lang_col} = '{k}' THEN {v}" for k, v in SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_DEFAULT} END"


def q34_stratified_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    pct = _hex4_pct("md5(CAST(doc_id AS STRING))", "instr")
    return (
        d.selectExpr("doc_id", "lang", f"{pct} AS bucket")
        .where(F.expr(f"bucket < {_rate_case('lang')}"))
    )


Q34_SQL = f"""
SELECT doc_id, lang, bucket FROM (
  SELECT doc_id, lang,
         {_hex4_pct("md5(CAST(doc_id AS VARCHAR))", "strpos")} AS bucket
  FROM documents)
WHERE bucket < {_rate_case('lang')}
"""


# --- q35: document-length histogram (corpus shape stats) ---
#
# Fixed-width buckets over n_chars, counted per (lang, bucket) — one
# map-side-combined aggregation; the shape report every curation run emits.

BUCKET_CHARS = 500


def q35_length_histogram(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.selectExpr(
            "lang",
            f"CAST(FLOOR(n_chars / {BUCKET_CHARS}.0) AS INT) AS bucket",
            "n_chars",
        )
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("ROUND(AVG(n_chars), 2)").alias("avg_chars"),
        )
    )


Q35_SQL = f"""
SELECT lang, CAST(FLOOR(n_chars / {BUCKET_CHARS}.0) AS INT) AS bucket,
       COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents GROUP BY lang, bucket
"""


# --- q36: benchmark decontamination (shared-shingle overlap vs eval set) ---
#
# Before training, every corpus is screened for documents that leak the
# evaluation benchmarks.  Stand-in eval set: doc_id % EVAL_MOD == EVAL_REM
# (deterministic, oracle-mirrorable).  A corpus doc is contaminated when it
# shares ≥ CONTAM_T distinct word-3-gram shingles with an eval doc —
# measured separation on this corpus: genuine near-dups share 37 shingles,
# background noise ≤ 2.  Scale shape: the eval side of the shingle join is
# a benchmark suite (tiny), so it broadcasts; the corpus side is one
# scan→explode with no pre-shuffle, and the (doc, eval) count is a single
# map-side-combined aggregation.

EVAL_MOD, EVAL_REM = 100, 7
CONTAM_T = 5


def verbatim_contamination_pairs(docs, eval_mod=EVAL_MOD, eval_rem=EVAL_REM):
    """(doc_id, text) frame → verbatim-tier contamination pairs (q36's body,
    factored so the paraphrase fixture tests can run it on a tiny frame)."""
    sh = docs.selectExpr("doc_id", f"{_WORDS} AS words").selectExpr(
        "doc_id", f"{_SH_FROM_WORDS} AS sh"
    )
    grams = sh.selectExpr("doc_id", "explode(array_distinct(sh)) AS g")
    ev = grams.where(F.col("doc_id") % eval_mod == eval_rem).selectExpr(
        "doc_id AS eval_id", "g"
    )
    corpus = grams.where(F.col("doc_id") % eval_mod != eval_rem)
    return (
        corpus.join(F.broadcast(ev), "g")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))  # grams pre-distinct per doc
        .where(F.col("n_shared") >= CONTAM_T)
    )


def q36_benchmark_contamination(spark, sf_dir):
    return verbatim_contamination_pairs(load(spark, sf_dir, "documents"))


Q36_SQL = f"""
WITH g AS (SELECT doc_id, UNNEST(list_distinct(sh)) AS g FROM {_DUCK_SH_SUB}),
ev AS (SELECT doc_id AS eval_id, g FROM g WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
co AS (SELECT doc_id, g FROM g WHERE doc_id % {EVAL_MOD} != {EVAL_REM})
SELECT doc_id, eval_id, COUNT(*) AS n_shared
FROM co JOIN ev USING (g) GROUP BY doc_id, eval_id
HAVING COUNT(*) >= {CONTAM_T}
"""


# --- q45: fuzzy-tier decontamination (MinHash-banded, paraphrase-robust) ---
#
# q36 demands ≥ CONTAM_T shared VERBATIM word-3-grams, so a paraphrased eval
# doc (scattered word substitutions — every 3rd word swapped leaves ZERO
# intact 3-grams) sails through.  The fuzzy tier works on word BIGRAMS —
# period-k substitution still leaves ~(k-2)/k of bigrams intact — and uses
# q14's MinHash-band machinery against the eval set: r=1 bands (band key =
# one seeded minhash of the bigram set), FUZZY_BANDS-way OR construction, so
# a candidate surfaces with prob 1-(1-J)^16 (0.97 at J=0.2, >0.999 at 0.4);
# banded candidates are then verified with EXACT bigram Jaccard ≥ FUZZY_J.
# Unigrams are deliberately NOT used: on small-vocab corpora their background
# Jaccard is huge (measured 0.60 mean here) — bigram background is 0.027
# mean / 0.10 p99.9 vs ≥ 0.35 for true near-dups, so FUZZY_J = 0.2 separates.
#
# Scale shape (the reason for banding instead of q36's inverted index): the
# eval side is a benchmark suite → its 16 band rows/doc broadcast; the corpus
# side explodes to 16 band rows per doc — constant, vs one row per SHINGLE
# (~doc length) for the inverted-index shape — then broadcast-joins with no
# shuffle; only the O(candidates) dedup aggregates.  At 1000-word real-world
# docs that is ~60× less join traffic per corpus doc.

FUZZY_J = 0.2
FUZZY_BANDS = 16

_BG_FROM_WORDS = """
CASE WHEN size(words) >= 2
     THEN transform(sequence(0, size(words) - 2),
                    i -> concat_ws(' ', words[i], words[i+1]))
     ELSE array(array_join(words, ' ')) END
"""
_BG_FROM_WORDS_DUCK = """
CASE WHEN len(words) >= 2
     THEN list_transform(range(1, len(words)),
                         i -> words[i] || ' ' || words[i+1])
     ELSE [array_to_string(words, ' ')] END
"""


def fuzzy_contamination_pairs(docs, eval_mod=EVAL_MOD, eval_rem=EVAL_REM):
    """(doc_id, text) frame → (doc_id, eval_id, bg_jaccard) fuzzy-tier
    contamination pairs.  See the block comment above for the design."""
    base = (
        docs.selectExpr("doc_id", f"{_WORDS} AS words")
        .selectExpr("doc_id", f"{_BG_FROM_WORDS} AS bg")
        .selectExpr("doc_id", "array_distinct(bg) AS bgd")
    )
    bands = ",".join(
        f"concat('{k}:', array_min(transform(bgd, s -> md5(concat('f{k}', s)))))"
        for k in range(FUZZY_BANDS)
    )
    banded = base.selectExpr("doc_id", "bgd", f"explode(array({bands})) AS band")
    ev = banded.where(F.col("doc_id") % eval_mod == eval_rem).selectExpr(
        "doc_id AS eval_id", "bgd AS ev_bgd", "band"
    )
    co = banded.where(F.col("doc_id") % eval_mod != eval_rem)
    return (
        co.join(F.broadcast(ev), "band")
        .selectExpr(
            "doc_id",
            "eval_id",
            "size(array_intersect(bgd, ev_bgd)) AS inter",
            "size(bgd) AS nc",
            "size(ev_bgd) AS ne",
        )
        .selectExpr(
            "doc_id",
            "eval_id",
            "ROUND(CAST(inter AS DOUBLE) / (nc + ne - inter), 4) AS bg_jaccard",
        )
        .where(F.col("bg_jaccard") >= FUZZY_J)
        .distinct()  # one row per (doc, eval) pair however many bands hit
    )


def q45_fuzzy_contamination(spark, sf_dir):
    return fuzzy_contamination_pairs(load(spark, sf_dir, "documents"))


_Q45_BANDS_DUCK = ",".join(
    f"'{k}:' || list_aggregate(list_transform(bgd, s -> md5('f{k}' || s)), 'min')"
    for k in range(FUZZY_BANDS)
)

Q45_SQL = f"""
WITH w AS (SELECT doc_id, {_WORDS_DUCK} AS words FROM documents),
bg AS (SELECT doc_id, list_distinct({_BG_FROM_WORDS_DUCK}) AS bgd FROM w),
banded AS (SELECT doc_id, bgd, UNNEST([{_Q45_BANDS_DUCK}]) AS band FROM bg),
ev AS (SELECT doc_id AS eval_id, bgd AS ev_bgd, band FROM banded
       WHERE doc_id % {EVAL_MOD} = {EVAL_REM}),
co AS (SELECT doc_id, bgd, band FROM banded WHERE doc_id % {EVAL_MOD} != {EVAL_REM}),
cand AS (SELECT co.doc_id, ev.eval_id,
                len(list_filter(co.bgd, x -> list_contains(ev.ev_bgd, x))) AS inter,
                len(co.bgd) AS nc, len(ev.ev_bgd) AS ne
         FROM co JOIN ev ON co.band = ev.band)
SELECT DISTINCT doc_id, eval_id, bg_jaccard FROM (
  SELECT doc_id, eval_id,
         ROUND(CAST(inter AS DOUBLE) / (nc + ne - inter), 4) AS bg_jaccard
  FROM cand)
WHERE bg_jaccard >= {FUZZY_J}
"""


QUERIES = {
    "q33_neardup_clusters": (q33_neardup_clusters, Q33_SQL),
    "q43_neardup_fixpoint_verify": (q43_neardup_fixpoint_verify, Q43_SQL),
    "q34_stratified_sample": (q34_stratified_sample, Q34_SQL),
    "q35_length_histogram": (q35_length_histogram, Q35_SQL),
    "q36_benchmark_contamination": (q36_benchmark_contamination, Q36_SQL),
    "q45_fuzzy_contamination": (q45_fuzzy_contamination, Q45_SQL),
}
