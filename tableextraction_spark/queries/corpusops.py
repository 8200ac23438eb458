"""Corpus-level hygiene passes, part 2: exact duplicated-substring spans
(the suffix-array-dedup shape) and LM-based quality bucketing (the CCNet
head/middle/tail shape).

Like textops/scrubops: pure Catalyst expressions — no Python UDFs — each
with an exact DuckDB oracle over the same parquet.

Public sources for the semantics (patterns only, re-derived here):

- Substring-level dedup: Lee et al., "Deduplicating Training Data Makes
  Language Models Better" (arXiv:2107.06499) — ExactSubstr finds character
  spans repeated verbatim anywhere in the corpus via a suffix array.  A
  suffix array is a single-machine data structure; the distributed
  re-expression indexes every K-token rolling window (fingerprinted, so the
  shuffle moves 32-hex digests, not text), marks windows whose fingerprint
  occurs >= SPAN_MIN_OCC times corpus-wide, and merges overlapping/adjacent
  duplicated windows per document into maximal spans with a gaps-and-islands
  window pass.  Every token covered by a reported span is covered by a
  duplicated K-window — the same guarantee ExactSubstr's span merge gives
  at its threshold length.
- Quality bucketing: Wenzek et al., "CCNet" (arXiv:1911.00359) §4.3 — score
  each document with a language-model negative log-likelihood, sort, and
  split the corpus into head/middle/tail thirds.  The LM here is the
  corpus's own token-bigram distribution (deterministic, no external data,
  matching the repo's no-external-weights rule); the per-bigram NLL is
  rounded to integer milli-nats BEFORE summing so the per-document sum is
  order-independent (exact BIGINT arithmetic) and the Spark/DuckDB hash
  gate cannot be broken by float summation order.

100-TB plan shapes:

- q60: explode K-windows (rows ~= token count, each a doc_id + digest),
  occurrence counts via groupBy(digest) — NOT a COUNT(*) OVER
  (PARTITION BY digest) window, which has no partial aggregation: a hot
  digest (a boilerplate 8-token window duplicated across a large corpus
  fraction) would buffer its entire occurrence set in ONE window
  partition, the q14-round-3 failure class.  The groupBy's map-side
  combine collapses hot keys to one row per mapper, and the join back to
  positions is AQE-skew-splittable.  Cost: the corpus is scanned twice
  (once per branch) — scans are the cheap part at 100 TB, skewed
  single-task buffers are not.  Nothing corpus-sized is broadcast;
  digests are 32-hex strings, never text.
- q61: explode bigrams -> groupBy(bigram) counts (map-side combine; the
  same skew reasoning — "of the" is a percent-scale key) -> join counts
  back -> doc_id groupBy.  The counts frame is vocabulary-sized (bounded,
  far smaller than the corpus) and branch-shared, so it is cached.  The
  tertile cutoffs use exact `percentile` here because it is bit-identical
  to DuckDB's `quantile_cont` (both interpolate between the same two
  order statistics), which the oracle gate needs; at production scale
  swap in `percentile_approx` (a mergeable sketch, fully distributed) —
  the plan downstream is unchanged, a 2-element broadcast join.  There is
  deliberately NO global row_number/ntile window: bucketing compares each
  row against broadcast cutoffs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import load
from .textops import _WORDS, _WORDS_DUCK

SPAN_K = 8        # tokens per rolling window (Lee et al. use 50 BPE tokens)
SPAN_MIN_OCC = 2  # a window is "duplicated" at >= 2 occurrences corpus-wide
BG_FREQ_MIN = 2   # corpus count at/above which a bigram is "familiar"


# --- q60: exact duplicated-substring spans (ExactSubstr, distributed) ---

def q60_dup_substring_spans(spark, sf_dir):
    """Maximal per-document spans of text duplicated >= SPAN_MIN_OCC times
    corpus-wide (within- or cross-document), as token ranges.

    Reference semantics: arXiv:2107.06499 §3.1 (ExactSubstr); the reference
    repo has no corpus-dedup stage — this is part of the LLM-pipeline
    surface built beyond it.
    """
    w = (
        load(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_WORDS} AS words")
        .where(f"size(words) >= {SPAN_K}")
    )
    pos = w.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(words) - {SPAN_K}), "
                f"i -> md5(concat_ws(' ', slice(words, i + 1, {SPAN_K}))))"
            )
        ).alias("pos", "fp"),
    )
    # groupBy, not a fp-partitioned COUNT window: map-side combine keeps a
    # hot digest from buffering its whole occurrence set in one task (see
    # module docstring); AQE skew-splits the join back if a key is hot
    dup = (
        pos.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .where(F.col("n_occ") >= SPAN_MIN_OCC)
        .select("fp")
    )
    dpos = pos.join(dup, "fp").select("doc_id", "pos")
    # gaps-and-islands: a new island starts when the previous duplicated
    # window ends before this one begins (windows at p, q overlap or touch
    # iff q - p <= SPAN_K)
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    lagged = dpos.withColumn("prev", F.lag("pos").over(by_doc))
    flagged = lagged.withColumn(
        "new_island",
        F.when(
            F.col("prev").isNull() | (F.col("pos") - F.col("prev") > SPAN_K),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            by_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(SPAN_K - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(SPAN_K)).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("island")
    )


Q60_SQL = f"""
WITH w0 AS (SELECT doc_id, {_WORDS_DUCK} AS words FROM documents),
w AS (SELECT doc_id, words FROM w0 WHERE len(words) >= {SPAN_K}),
pos AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos,
         md5(array_to_string(words[u.i + 1 : u.i + {SPAN_K}], ' ')) AS fp
  FROM w, UNNEST(range(0, len(words) - {SPAN_K} + 1)) AS u(i)
),
dup AS (SELECT fp FROM pos GROUP BY fp HAVING COUNT(*) >= {SPAN_MIN_OCC}),
dpos AS (SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (fp)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER dw IS NULL
                OR pos - lag(pos) OVER dw > {SPAN_K} THEN 1 ELSE 0 END
           AS new_island
  FROM dpos
  WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)
),
islands AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {SPAN_K} - 1 AS span_end,
       MAX(pos) - MIN(pos) + {SPAN_K} AS span_tokens,
       COUNT(*) AS n_windows
FROM islands
GROUP BY doc_id, island
"""


# --- q61: LM quality buckets (CCNet head/middle/tail) ---

def q61_lm_quality_buckets(spark, sf_dir):
    """Per-document corpus-bigram-LM negative log-likelihood (integer
    milli-nats, order-independent sum), familiar-bigram ratio, and the
    CCNet head/middle/tail bucket by NLL tertile.

    Reference semantics: arXiv:1911.00359 §4.3; LM = the corpus's own
    bigram distribution (no external model), so every observed bigram has
    count >= 1 and no smoothing is needed.
    """
    w = (
        load(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_WORDS} AS words")
        .where("size(words) >= 2")
    )
    grams = w.selectExpr(
        "doc_id",
        "explode(transform(sequence(0, size(words) - 2), "
        "i -> concat(words[i], ' ', words[i+1]))) AS bg",
    )
    # groupBy, not a bg-partitioned COUNT window — same skew rationale as
    # q60; cached because the totals branch and the scoring join both
    # consume it (vocabulary-sized: bounded, far smaller than the corpus)
    counts = (
        grams.groupBy("bg").agg(F.count(F.lit(1)).alias("cnt")).cache()
    )
    tot = counts.agg(F.sum("cnt").alias("n_total"))
    scored = (
        grams.join(counts, "bg")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "doc_id",
            "CAST(ROUND(-LN(cnt / CAST(n_total AS DOUBLE)) * 1000, 0) "
            "AS BIGINT) AS mnat",
            f"CASE WHEN cnt >= {BG_FREQ_MIN} THEN 1 ELSE 0 END AS fam",
        )
    )
    doc = (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("mnat").alias("nll_sum"),
            F.sum("fam").alias("n_fam"),
        )
        .selectExpr(
            "doc_id",
            "n_bigrams",
            "ROUND(nll_sum / CAST(n_bigrams AS DOUBLE), 2) AS avg_nll_mnat",
            "ROUND(n_fam / CAST(n_bigrams AS DOUBLE), 4) AS familiar_ratio",
        )
        # cache: the cutoff branch and the final bucket join both consume
        # this frame; uncached, each re-derives the full explode+window
        # pipeline (3 corpus scans instead of 1).  One ~40-byte row per doc
        # — bounded, the same pattern as q14's signature cache.
        .cache()
    )
    cuts = doc.agg(
        F.expr(
            "percentile(avg_nll_mnat, "
            "array(0.3333333333333333, 0.6666666666666666))"
        ).alias("c")
    )
    return doc.crossJoin(F.broadcast(cuts)).selectExpr(
        "doc_id",
        "n_bigrams",
        "avg_nll_mnat",
        "familiar_ratio",
        "CASE WHEN avg_nll_mnat <= c[0] THEN 'head' "
        "WHEN avg_nll_mnat <= c[1] THEN 'middle' ELSE 'tail' END AS bucket",
    )


Q61_SQL = f"""
WITH w0 AS (SELECT doc_id, {_WORDS_DUCK} AS words FROM documents),
w AS (SELECT doc_id, words FROM w0 WHERE len(words) >= 2),
grams AS (
  SELECT doc_id, words[u.i] || ' ' || words[u.i + 1] AS bg
  FROM w, UNNEST(range(1, len(words))) AS u(i)
),
counts AS (SELECT bg, COUNT(*) AS cnt FROM grams GROUP BY bg),
tot AS (SELECT SUM(cnt) AS n_total FROM counts),
scored AS (
  SELECT doc_id,
         CAST(ROUND(-LN(cnt / CAST(n_total AS DOUBLE)) * 1000, 0)
              AS BIGINT) AS mnat,
         CASE WHEN cnt >= {BG_FREQ_MIN} THEN 1 ELSE 0 END AS fam
  FROM grams JOIN counts USING (bg) CROSS JOIN tot
),
doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         ROUND(SUM(mnat) / CAST(COUNT(*) AS DOUBLE), 2) AS avg_nll_mnat,
         ROUND(SUM(fam) / CAST(COUNT(*) AS DOUBLE), 4) AS familiar_ratio
  FROM scored GROUP BY doc_id
),
cuts AS (
  SELECT quantile_cont(avg_nll_mnat,
                       [0.3333333333333333, 0.6666666666666666]) AS c
  FROM doc
)
SELECT doc_id, n_bigrams, avg_nll_mnat, familiar_ratio,
       CASE WHEN avg_nll_mnat <= c[1] THEN 'head'
            WHEN avg_nll_mnat <= c[2] THEN 'middle' ELSE 'tail' END AS bucket
FROM doc CROSS JOIN cuts
"""


QUERIES = {
    "q60_dup_substring_spans": (q60_dup_substring_spans, Q60_SQL),
    "q61_lm_quality_buckets": (q61_lm_quality_buckets, Q61_SQL),
}
