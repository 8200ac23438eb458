"""Classifier parity tests (recognition.py:37-75 semantics)."""

from tableextraction_spark.kernel.classify import (
    KEYWORDS,
    classify_table,
    partial_compare,
)


def test_partial_compare_positional_not_levenshtein():
    # 1 error over max-length 5 = 0.2 → match
    assert partial_compare("марка", "морка")
    # insertion shifts everything — positional errors explode (unlike
    # Levenshtein distance 1): "maarka" vs "марка"
    assert not partial_compare("abcde", "aXbcd")  # 4/5 positional errors
    assert partial_compare("стали", "стали")
    assert not partial_compare("", "")


def test_partial_compare_length_asymmetry():
    # reference quirk preserved: zip truncates at the shorter string and the
    # length gap itself is NOT counted as errors, so a clean short prefix of
    # a long keyword matches (0 errors / max_length = 0 ≤ 0.2)
    assert partial_compare("сопро", "сопротивление")
    # but a prefix with differing chars fails on the positional ratio
    assert not partial_compare("хохох", "сопротивление")


def test_classify_table_threshold():
    # 2 of 8 keywords ⇒ confidence 0.8·0.25 = 0.2 ≥ 0.2 → True
    assert classify_table("марка стали prime beam")
    # 1 of 8 ⇒ 0.1 < 0.2 → False (words chosen with no ≤2-char tokens:
    # the reference quirk makes ANY 1-2 char word match long keywords,
    # see test below)
    assert not classify_table("марка apples banana")
    assert not classify_table("")
    # case-insensitive on the document side
    assert classify_table("МАРКА СТАЛИ")


def test_classify_short_word_quirk_preserved():
    # reference behavior: zip truncation means a 2-char word scores at most
    # 2 errors against a 13-char keyword → 2/13 ≤ 0.2 → "match"; so 'of'
    # alone hits both 13-char keywords (сопротивление, относительное)
    assert partial_compare("сопротивление", "of")
    assert classify_table("of junkwords junkwords")  # 2 keywords ⇒ 0.2


def test_classify_table_fuzzy_ocr_noise():
    # one OCR error per word still classifies (ratio ≤ 0.2)
    assert classify_table("мерка стели")
    assert len(KEYWORDS) == 8


def test_pipeline_classify_flag(spark):
    from pyspark.sql import functions as F

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans

    docs, blobs, _ = gen_corpus(6)
    d = spark.createDataFrame(docs, DOCS_SCHEMA)
    b = spark.createDataFrame(blobs, BLOBS_SCHEMA)

    def n_tables(df):
        return (
            df.select(F.explode("spans").alias("s"))
            .where(F.col("s.kind") == "table")
            .count()
        )

    kept = n_tables(extract_spans(spark, d, b, classify=True))
    total = n_tables(extract_spans(spark, d, b))
    # fixture vocab includes сталь/Марка which legitimately fuzzy-match the
    # steel keywords, so classify keeps SOME tables — but only a strict
    # subset (most fixture tables carry no steel terms)
    assert 0 < kept < total
