"""Python-native media scan (sources/media_parquet.py): parity with the JVM
scan path, and the broadcast todo-set resume prune — a completed job's rerun
must decode zero pages (the verify-skill 'rerun = resume no-op' claim)."""

import pytest

from tableextraction_spark.fixtures import gen_corpus
from tableextraction_spark.pipeline import BLOBS_SCHEMA, DOCS_SCHEMA, extract_spans
from tableextraction_spark.sources import detect_tables_python_scan

N_DOCS = 8


@pytest.fixture(scope="module")
def corpus_on_disk(spark, tmp_path_factory):
    docs, blobs, expected = gen_corpus(N_DOCS)
    path = str(tmp_path_factory.mktemp("scan") / "blobs.parquet")
    blobs_df = spark.createDataFrame(blobs, BLOBS_SCHEMA).repartition(4)
    blobs_df.write.parquet(path)
    return spark.createDataFrame(docs, DOCS_SCHEMA), blobs_df, path, expected


def _tuples(rows):
    return {
        r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in sorted(map(lambda x: x.asDict(), r.spans),
                                   key=lambda s: s["offset"])]
        for r in rows
    }


def test_python_scan_parity_with_jvm_scan(spark, corpus_on_disk):
    docs_df, blobs_df, path, expected = corpus_on_disk
    via_path = _tuples(extract_spans(spark, docs_df, path).collect())
    via_df = _tuples(extract_spans(spark, docs_df, blobs_df).collect())
    assert via_path == via_df
    assert via_path == {
        e["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in e["spans"]]
        for e in expected
    }


def test_keep_doc_ids_prunes_before_decode(spark, corpus_on_disk):
    _docs, _blobs, path, _expected = corpus_on_disk
    # empty todo set → nothing is decoded at all
    assert detect_tables_python_scan(spark, path, keep_doc_ids=set()).count() == 0
    # singleton todo set → only that doc's pages decode
    one = detect_tables_python_scan(
        spark, path, keep_doc_ids={"doc-000001"}
    )
    assert {r.doc_id for r in one.select("doc_id").distinct().collect()} == {
        "doc-000001"
    }


def test_row_group_stats_pruning_skips_reads(spark, corpus_on_disk, tmp_path):
    # doc_id-clustered table with small row groups → a singleton todo set
    # must prune most row groups at the metadata level (skip the READ)
    import pyarrow.parquet as pq
    from tableextraction_spark.sources.media_parquet import list_row_groups

    _docs, blobs_df, _path, _expected = corpus_on_disk
    clustered = str(tmp_path / "clustered.parquet")
    pdf = blobs_df.toPandas().sort_values(["doc_id", "page_no"])
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   clustered, row_group_size=4)
    all_splits = list_row_groups(clustered)
    assert len(all_splits) > 2
    pruned = list_row_groups(clustered, keep_doc_ids={"doc-000001"})
    assert 0 < len(pruned) < len(all_splits)
    # and the pruned scan still returns exactly that doc's pages
    out = detect_tables_python_scan(spark, clustered,
                                    keep_doc_ids={"doc-000001"})
    assert {r.doc_id for r in out.select("doc_id").distinct().collect()} == {
        "doc-000001"
    }


def test_path_form_resume_skips_committed(spark, corpus_on_disk):
    docs_df, _blobs, path, expected = corpus_on_disk
    from pyspark.sql import functions as F

    committed = extract_spans(
        spark, docs_df.where(F.col("doc_id") < "doc-000003"), path
    )
    remaining = extract_spans(spark, docs_df, path, committed=committed)
    done = {r.doc_id for r in committed.select("doc_id").collect()}
    rem = {r.doc_id for r in remaining.select("doc_id").collect()}
    assert rem == {e["doc_id"] for e in expected} - done
    assert _tuples(committed.collect() + remaining.collect()) == {
        e["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in e["spans"]]
        for e in expected
    }
    # fully-committed rerun is a decode no-op AND an output no-op
    again = extract_spans(
        spark, docs_df, path,
        committed=spark.createDataFrame(
            [(d,) for d in {e["doc_id"] for e in expected}], "doc_id string"
        ),
    )
    assert again.count() == 0


def test_arbitrary_garbage_payloads_are_row_errors(spark):
    """Fuzz: any byte soup in the blobs table must surface as per-row error
    rows — never a task/job failure (the pipeline's failure-isolation rule)."""
    import numpy as np

    from tableextraction_spark.pipeline import BLOBS_SCHEMA, detect_tables

    rng = np.random.default_rng(7)
    rows = []
    # random payloads + adversarial prefixes: truncated IMG1/PNG/JPEG/PDF
    payloads = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8)) for n in (0, 1, 3, 17, 400)]
    payloads += [
        b"IMG1" + b"\x00" * 3,                      # truncated header
        b"IMG1" + (255).to_bytes(4, "little") * 2,  # header claims huge size
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8,         # PNG, no chunks
        b"\xff\xd8\xff\xe0" + b"\x00" * 10,         # JPEG, no SOF/SOS
        b"%PDF-1.4\n%%EOF",                          # PDF (stub or renderer)
    ]
    for i, p in enumerate(payloads):
        rows.append({"media_ref": f"fz{i}", "doc_id": f"fz{i}", "page_no": 0, "content": p})
    out = detect_tables(spark.createDataFrame(rows, BLOBS_SCHEMA)).collect()
    assert len(out) == len(payloads)
    assert all(r.error is not None for r in out)


def test_empty_part_file_is_skipped(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import list_row_groups

    _, blobs, _ = gen_corpus(2)
    path = str(tmp_path / "blobs")
    spark.createDataFrame(blobs, BLOBS_SCHEMA).coalesce(1).write.parquet(path)
    # drop an EMPTY part file (zero row groups) into the dataset
    schema = pa.schema(
        [("media_ref", pa.string()), ("doc_id", pa.string()),
         ("page_no", pa.int32()), ("content", pa.binary())]
    )
    pq.ParquetWriter(f"{path}/part-empty.parquet", schema).close()
    splits = list_row_groups(path)
    assert splits and all("part-empty" not in p for p, *_rest in splits)


def test_estimate_scan_splits_bin_packs_small_files(spark, tmp_path):
    from tableextraction_spark.pipeline import _estimate_scan_splits

    # 16 small files must NOT estimate as 16 partitions — Spark bin-packs
    # them; the estimate must stay within 2x of the real scan partitioning
    p = str(tmp_path / "many")
    spark.range(100_000).repartition(16).write.parquet(p)
    df = spark.read.parquet(p)
    est = _estimate_scan_splits(df)
    real = df.rdd.getNumPartitions()
    assert est is not None and est <= max(2 * real, real + 2), (est, real)


def test_coarse_row_groups_subsplit_with_identical_output(spark, tmp_path):
    """A few row-heavy row groups (the small-payload-PDF shape) must expand
    into sub-row-group slices — more tasks than row groups — while the scan
    output stays exactly equal to the unsliced JVM-path result."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.pipeline import BLOBS_SCHEMA
    from tableextraction_spark.sources.media_parquet import (
        detect_tables_python_scan,
        list_row_groups,
    )

    _docs, blobs, _exp = gen_corpus(24, codec="pdf")  # small payloads
    path = str(tmp_path / "coarse.parquet")
    pdf = spark.createDataFrame(blobs, BLOBS_SCHEMA).toPandas()
    pdf = pdf.sort_values(["doc_id", "page_no"])
    # ONE row group holding every page: maximally coarse
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), path,
        row_group_size=len(pdf),
    )
    splits = list_row_groups(path)
    assert len(splits) == 1 and splits[0][2] == len(pdf)
    out = detect_tables_python_scan(spark, path)
    # the stage must have had >1 partition (sub-splits), not 1 coarse task
    n_parts = out.select("partition_id").distinct().count()
    assert n_parts > 1
    # per-page results equal the INDEPENDENT JVM-scan path as a MULTISET
    # (a set compare would hide double-decoded pages from overlapping
    # slice windows)
    rows = sorted((r.media_ref, r.obj_no) for r in out.collect())
    from tableextraction_spark.pipeline import detect_tables

    jvm = detect_tables(spark.read.parquet(path))
    want = sorted((r.media_ref, r.obj_no) for r in jvm.collect())
    assert rows == want
    assert len({r for r, _t in rows}) == len(pdf)  # every page decoded


def test_extract_spans_equality_over_mixed_corpus(spark):
    """The web-crawl shape: ONE corpus interleaving every payload format
    (IMG1/PNG/JPEG/GIF/BMP/%PDF/%PDF-scanned/TIFF rotating per doc) plus
    html-markup docs, through ONE extract_spans call — golden span
    equality end-to-end."""
    from tableextraction_spark.fixtures import gen_corpus
    from tableextraction_spark.fixtures.html_gen import gen_html_doc
    from tableextraction_spark.pipeline import (
        BLOBS_SCHEMA,
        DOCS_SCHEMA,
        extract_spans,
    )

    docs, blobs, expected = gen_corpus(12, codec="mixed")
    # 8 distinct magics: pdf and pdfscan share %PDF; tiff adds b"II",
    # jp2 adds the JP2 signature box
    assert len({bytes(b["content"][:2]) for b in blobs}) == 8  # all formats
    hdocs, hexp = zip(*(gen_html_doc(i) for i in range(4)))
    docs_df = spark.createDataFrame(docs + list(hdocs), DOCS_SCHEMA).repartition(8)
    blobs_df = spark.createDataFrame(blobs, BLOBS_SCHEMA).repartition(8)
    out = {
        r.doc_id: r
        for r in extract_spans(spark, docs_df, blobs_df, html=True).collect()
    }
    for e in expected + list(hexp):
        got = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in sorted(out[e["doc_id"]].spans, key=lambda s: s.offset)
        ]
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in e["spans"]]
        assert got == exp, f"span mismatch in {e['doc_id']}"
