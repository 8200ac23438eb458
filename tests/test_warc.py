"""From-scratch WARC reader (ISO 28500; Common Crawl per-record-gzip
layout): round-trips, HTTP payload decoding (chunked / gzip / charset),
hostile-input bounds, and the distributed warc_to_docs stage."""

import zlib

import pytest

from tableextraction_spark.sources.warc import (
    encode_http_response,
    encode_warc,
    encode_warc_record,
    gunzip_members,
    html_text,
    iter_warc_docs,
    parse_http_response,
    parse_warc_records,
    warc_to_docs,
)

HTML = b"<html><head><title>T</title></head><body>hello world</body></html>"


def _fixture_records():
    return [
        encode_warc_record("warcinfo", b"software: fixture"),
        encode_warc_record(
            "response", encode_http_response(HTML),
            url="http://a.example/x", record_id="1",
        ),
        encode_warc_record(
            "response",
            encode_http_response(HTML * 40, chunked=True, gzip_body=True),
            url="http://a.example/big", record_id="2",
        ),
        encode_warc_record(
            "response",
            encode_http_response(b"nope", status=404, content_type="text/plain"),
            url="http://a.example/404", record_id="3",
        ),
        encode_warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                           url="http://a.example/x"),
    ]


def test_member_walk_finds_every_record():
    buf = encode_warc(_fixture_records())
    members = gunzip_members(buf)
    assert len(members) == 5
    # offsets strictly advance and tile the buffer exactly
    assert members[0][0] == 0
    assert all(
        members[i][0] + members[i][1] == members[i + 1][0]
        for i in range(len(members) - 1)
    )
    assert members[-1][0] + members[-1][1] == len(buf)
    # each member is one whole record
    for _o, _l, data in members:
        assert len(parse_warc_records(data)) == 1


def test_response_rows_with_decoded_payloads():
    docs = list(iter_warc_docs(encode_warc(_fixture_records())))
    assert len(docs) == 3  # warcinfo/request records don't emit rows
    by_url = {d[0]: d for d in docs}
    assert by_url["http://a.example/x"][5] == HTML
    assert by_url["http://a.example/big"][5] == HTML * 40  # chunked+gzip
    assert by_url["http://a.example/404"][3] == 404
    assert all(d[7] is None for d in docs)


def test_plain_and_gzip_layouts_agree():
    recs = _fixture_records()
    assert list(iter_warc_docs(encode_warc(recs, per_record_gzip=False))) == \
        list(iter_warc_docs(encode_warc(recs)))


def test_truncated_gzip_contains_damage_to_one_member():
    buf = encode_warc(_fixture_records())
    # strict member walk raises …
    with pytest.raises(ValueError):
        gunzip_members(buf[: len(buf) // 2])
    # … the doc iterator instead loses ONLY the truncated member: earlier
    # records still yield, plus exactly one error row, and it terminates
    rows = list(iter_warc_docs(buf[: len(buf) // 2]))
    errs = [r for r in rows if r[7] is not None]
    good = [r for r in rows if r[7] is None]
    assert len(errs) == 1 and good  # warcinfo precedes; first response survives
    assert good[0][0] == "http://a.example/x"


def test_one_corrupt_member_mid_file_spares_the_rest():
    recs = _fixture_records()
    members = [encode_warc([r]) for r in recs]
    members[2] = members[2][:10]  # truncate the big response's member
    rows = list(iter_warc_docs(b"".join(members)))
    good_urls = {r[0] for r in rows if r[7] is None}
    # records 1 (x) and 3 (404) survive; record 2 (big) is the error row
    assert good_urls == {"http://a.example/x", "http://a.example/404"}
    assert sum(1 for r in rows if r[7] is not None) == 1


def test_malformed_record_in_plain_warc_resyncs():
    recs = _fixture_records()
    plain = encode_warc(recs, per_record_gzip=False)
    # corrupt the first response's version line
    bad = plain.replace(b"WARC/1.1\r\nWARC-Type: response", b"GARB/1.1\r\nWARC-Type: response", 1)
    rows = list(iter_warc_docs(bad))
    good_urls = {r[0] for r in rows if r[7] is None}
    assert "http://a.example/big" in good_urls
    assert "http://a.example/404" in good_urls
    assert any(r[7] is not None for r in rows)


def test_lying_content_length_is_clamped():
    rec = encode_warc_record(
        "response", encode_http_response(HTML), url="u", record_id="9"
    )
    rec = rec.replace(b"Content-Length: ", b"Content-Length: 99999", 1)
    rows = list(iter_warc_docs(rec))
    assert len(rows) == 1  # clamped to the buffer; no overrun, no spin


def test_garbage_http_block_yields_error_row():
    rec = encode_warc_record("response", b"\x00\x01not http", url="u")
    (row,) = list(iter_warc_docs(rec))
    assert row[3] is None and "ValueError" in row[7]


def test_bad_chunk_size_is_error_row_not_hang():
    body = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nx"
    rec = encode_warc_record("response", body, url="u")
    (row,) = list(iter_warc_docs(rec))
    assert row[7] is not None


def test_deflate_content_encoding_both_wrappings():
    raw = b"payload-bytes" * 10
    # zlib-wrapped
    body = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + zlib.compress(raw))
    assert parse_http_response(body)[2] == raw
    # raw-deflate (spec-tolerated server bug)
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
            + co.compress(raw) + co.flush())
    assert parse_http_response(body)[2] == raw


def test_charset_decode():
    assert html_text("héllo".encode("latin-1"),
                     "text/html; charset=latin-1") == "héllo"
    assert html_text(b"\xff\xfe", "text/html") == "��"  # replace


def test_bare_lf_headers_tolerated():
    rec = (b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://lf\n"
           b"Content-Length: " + str(len(encode_http_response(b"x"))).encode()
           + b"\n\n" + encode_http_response(b"x", content_type="text/plain"))
    (row,) = list(iter_warc_docs(rec))
    assert row[0] == "http://lf" and row[5] == b"x"


def test_warc_to_docs_distributed(spark):
    files = [
        (f"part-{i}.warc.gz", bytearray(encode_warc([
            encode_warc_record(
                "response",
                encode_http_response(HTML.replace(b"hello", b"doc%03d" % i)),
                url=f"http://site{i}.example/", record_id=str(i),
            )
            for _ in range(3)
        ])))
        for i in range(4)
    ] + [("broken.warc.gz", bytearray(b"\x1f\x8bgarbage"))]
    df = spark.createDataFrame(files, "path string, content binary")
    out = warc_to_docs(spark, df)
    rows = out.collect()
    good = [r for r in rows if r.error is None]
    bad = [r for r in rows if r.error is not None]
    assert len(good) == 12 and len(bad) == 1
    assert bad[0].warc_path == "broken.warc.gz"
    assert {r.url for r in good} == {f"http://site{i}.example/" for i in range(4)}
    assert all(bytes(r.payload).startswith(b"<html>") for r in good)


def test_warc_crawl_to_main_content_spans(spark):
    """Crawl-file → spans end-to-end: WARC files holding the html fixture
    markup (mixed plain and chunked+gzipped responses) must extract to
    EXACTLY the spans the parquet-corpus path extracts from the same
    markup — ingestion must be transparent to the pipeline."""
    from tableextraction_spark.fixtures.html_gen import gen_html_doc
    from tableextraction_spark.pipeline import DOCS_SCHEMA, extract_spans
    from tableextraction_spark.sources.warc import warc_html_docs

    n = 6
    markup = {}
    for i in range(n):
        doc, _exp = gen_html_doc(i)
        h = next(s for s in doc["spans"] if s["kind"] == "html")
        markup[f"http://crawl.example/{doc['doc_id']}"] = h["text"]
    files = [
        (
            f"p{j}.warc.gz",
            bytearray(encode_warc([
                encode_warc_record(
                    "response",
                    encode_http_response(
                        m.encode(), chunked=bool(j % 2), gzip_body=bool(j % 2)
                    ),
                    url=url, record_id=str(j),
                )
            ])),
        )
        for j, (url, m) in enumerate(sorted(markup.items()))
    ]
    fdf = spark.createDataFrame(files, "path string, content binary")
    docs = warc_html_docs(spark, fdf)

    def tuples(rows):
        return {
            r["doc_id"]: [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]
            ]
            for r in rows
        }

    got = tuples(extract_spans(spark, docs, None, html=True).collect())
    ref_rows = [
        {"doc_id": url,
         "spans": [{"kind": "html", "text": m, "media_ref": "", "offset": 0}]}
        for url, m in markup.items()
    ]
    ref_docs = spark.createDataFrame(ref_rows, DOCS_SCHEMA)
    want = tuples(extract_spans(spark, ref_docs, None, html=True).collect())
    assert got == want and len(got) == n
    for spans in got.values():  # markup never leaks through
        assert all(k != "html" for k, _t, _m, _o in spans)


def test_bogus_charset_label_falls_back_not_errors():
    """charset=utf8mb4 and friends are ubiquitous in real crawls: the doc
    must survive with a utf-8/replace decode, not become an error row."""
    rec = encode_warc_record(
        "response",
        encode_http_response(HTML, content_type="text/html; charset=utf8mb4"),
        url="http://bogus.example/", record_id="1",
    )
    (row,) = list(iter_warc_docs(rec))
    assert row[7] is None and row[3] == 200
    assert row[6] == HTML.decode()  # text populated via the fallback


def test_non_html_text_rows_skip_decode():
    rec = encode_warc_record(
        "response",
        encode_http_response(b"body { color: red }",
                             content_type="text/css"),
        url="http://css.example/", record_id="1",
    )
    (row,) = list(iter_warc_docs(rec))
    assert row[4] == "text/css" and row[6] is None  # payload only, no str copy


def test_warc_html_docs_dedups_repeated_captures(spark):
    from tableextraction_spark.sources.warc import warc_html_docs

    recs = [
        encode_warc_record(
            "response",
            encode_http_response(b"<html><body>OLD</body></html>"),
            url="http://a.example/x", record_id="1",
            date="2024-01-01T00:00:00Z",
        ),
        encode_warc_record(
            "response",
            encode_http_response(b"<html><body>NEW</body></html>"),
            url="http://a.example/x", record_id="2",
            date="2024-02-01T00:00:00Z",
        ),
    ]
    df = spark.createDataFrame(
        [("f.warc.gz", bytearray(encode_warc(recs)))],
        "path string, content binary",
    )
    rows = warc_html_docs(spark, df).collect()
    assert len(rows) == 1  # one doc_id per URL
    assert "NEW" in rows[0].spans[0].text  # the latest capture wins


# --- byte-range splits within one .warc.gz (r3 verdict item 5) ---

def _big_warc(tmp_path, n=120, name="big.warc.gz"):
    from tableextraction_spark.sources.warc import encode_http_response

    recs = []
    for i in range(n):
        body = (f"<html><body>doc {i} " + "filler " * (20 + i % 67)
                + "</body></html>").encode()
        recs.append(encode_warc_record(
            "response", encode_http_response(body),
            url=f"http://ex.org/{i}", record_id=str(i),
        ))
    p = tmp_path / name
    p.write_bytes(encode_warc(recs))
    return str(p), n


def test_range_splits_tile_file_exactly(tmp_path):
    """Union of per-range walks == whole-file walk, for MANY split sizes
    (boundaries land inside members, on members, inside gzip headers)."""
    from tableextraction_spark.sources.warc import (
        iter_warc_docs_range,
        list_warc_splits,
    )
    import os

    path, n = _big_warc(tmp_path)
    whole = sorted(r[0] for r in iter_warc_docs(open(path, "rb").read())
                   if r[0])
    assert len(whole) == n
    for split_bytes in (999, 4096, 17001, os.path.getsize(path) * 2):
        splits = list_warc_splits([path], split_bytes)
        got = []
        for p, s, e in splits:
            got.extend(r[0] for r in iter_warc_docs_range(p, s, e) if r[0])
        assert sorted(got) == whole, f"split_bytes={split_bytes}"


def test_range_split_corruption_contained(tmp_path):
    """A corrupt member inside one range costs one error unit; every other
    record in every range survives."""
    from tableextraction_spark.sources.warc import (
        gunzip_members,
        iter_warc_docs_range,
        list_warc_splits,
    )

    path, n = _big_warc(tmp_path, n=40, name="corrupt.warc.gz")
    buf = bytearray(open(path, "rb").read())
    members = gunzip_members(bytes(buf))
    off, clen, _ = members[7]
    buf[off + clen // 2] ^= 0xFF  # flip a payload bit mid-member
    open(path, "wb").write(bytes(buf))
    urls, errors = [], 0
    for p, s, e in list_warc_splits([path], 4096):
        for r in iter_warc_docs_range(p, s, e):
            if r[-1] is not None:
                errors += 1
            elif r[0]:
                urls.append(r[0])
    assert errors >= 1
    assert len(urls) >= n - 2  # at most the corrupt record (+1 resync) lost


def test_plain_warc_not_splittable_single_owner(tmp_path):
    from tableextraction_spark.sources.warc import (
        iter_warc_docs_range,
        list_warc_splits,
    )

    recs = _fixture_records()
    p = tmp_path / "plain.warc"
    p.write_bytes(encode_warc(recs, per_record_gzip=False))
    splits = list_warc_splits([str(p)], 256)
    assert len(splits) > 1
    rows = []
    for path, s, e in splits:
        rows.extend(r for r in iter_warc_docs_range(path, s, e))
    assert len([r for r in rows if r[0]]) == 3  # split 0 owns the file


def test_warc_scan_docs_matches_whole_file_stage(spark, tmp_path):
    """The distributed byte-range scan returns exactly warc_to_docs' rows
    (same file handed as one blob) and actually ran multiple tasks."""
    from tableextraction_spark.sources.warc import warc_scan_docs

    path, n = _big_warc(tmp_path, n=80)
    out = warc_scan_docs(spark, [path], split_bytes=2048)
    got = sorted(r.url for r in out.collect() if r.url)
    files_df = spark.createDataFrame(
        [(path, open(path, "rb").read())], "path string, content binary"
    )
    want = sorted(r.url for r in warc_to_docs(spark, files_df).collect()
                  if r.url)
    assert got == want and len(got) == n
    from tableextraction_spark.sources.warc import list_warc_splits
    assert len(list_warc_splits([path], 2048)) > 4


def test_range_member_starting_at_window_edge_not_lost(tmp_path):
    """Review regression: the magic scan bounded its END at `window`, so a
    member starting at local offset window-1/-2 of an unsynced split was
    found by NO split and its record silently lost."""
    from tableextraction_spark.sources.warc import iter_warc_docs_range

    path, n = _big_warc(tmp_path, n=12, name="edge.warc.gz")
    members = gunzip_members(open(path, "rb").read())
    off = members[5][0]  # member 5's absolute start
    # split A: starts mid-member-4, ends 1 byte past member 5's start
    start_a = members[4][0] + 3
    cuts = [(start_a, off + 1), (off + 1, members[-1][0] + members[-1][1])]
    got = []
    for s, e in cuts:
        got.extend(r[0] for r in iter_warc_docs_range(path, s, e) if r[0])
    # members 5..11 are owned by exactly one of the two splits
    assert sorted(got) == sorted(f"http://ex.org/{i}" for i in range(5, 12))
    assert len(got) == 7


# --- warc-zstd (IIPC layout: concatenated zstd frames) ---

def _zst_fixture(records=None):
    return encode_warc(records or _fixture_records(), compression="zstd")


def test_zstd_layout_agrees_with_gzip_and_plain():
    recs = _fixture_records()
    plain = [r for r in iter_warc_docs(encode_warc(recs, per_record_gzip=False))]
    gz = [r for r in iter_warc_docs(encode_warc(recs))]
    zst = [r for r in iter_warc_docs(_zst_fixture(recs))]
    assert zst == plain == gz
    assert sum(1 for r in zst if r[0]) == 3  # the three response records


def test_zstd_frame_walk_no_decompression():
    """Frame boundaries resolve from headers alone and tile the file."""
    from tableextraction_spark.sources.warc import _zstd_frame_end

    buf = _zst_fixture()
    mv = memoryview(buf)
    pos, frames = 0, 0
    while pos < len(buf):
        pos = _zstd_frame_end(mv, pos)
        frames += 1
    assert pos == len(buf) and frames == 5


def test_zstd_skippable_frame_skipped_dict_refused():
    import struct

    recs = _fixture_records()
    body = _zst_fixture(recs)
    pad = struct.pack("<II", 0x184D2A50, 7) + b"padding"  # benign skippable
    rows = list(iter_warc_docs(pad + body))
    assert sum(1 for r in rows if r[0]) == 3
    assert not any(r[-1] for r in rows)
    # the warc-zstd DICTIONARY skippable frame refuses loudly, per frame
    dic = struct.pack("<II", 0x184D2A5D, 4) + b"DICT"
    rows = list(iter_warc_docs(dic + body))
    errs = [r[-1] for r in rows if r[-1]]
    assert errs and "python-zstandard" in errs[0]
    # the frames themselves are dict-less here, so the records still decode
    assert sum(1 for r in rows if r[0]) == 3


def test_zstd_dictionary_flagged_frame_refused():
    """A frame whose descriptor demands a dictionary (did_flag != 0) is a
    named per-frame error, never a silent misdecode."""
    buf = bytearray(_zst_fixture())
    buf[4] |= 0x01  # set Dictionary_ID_flag on the first frame
    rows = list(iter_warc_docs(bytes(buf)))
    errs = [r[-1] for r in rows if r[-1]]
    assert errs and "dictionary" in errs[0]


def test_zstd_corrupt_frame_contained():
    recs = _fixture_records()
    buf = bytearray(_zst_fixture(recs))
    from tableextraction_spark.sources.warc import _zstd_frame_end

    mv = memoryview(bytes(buf))
    first_end = _zstd_frame_end(mv, 0)
    second_end = _zstd_frame_end(mv, first_end)
    buf[first_end + 20] ^= 0xFF  # corrupt the second frame's body
    rows = list(iter_warc_docs(bytes(buf)))
    errs = [r for r in rows if r[-1]]
    oks = [r for r in rows if r[0]]
    assert len(errs) >= 1  # the damaged record errors...
    assert len(oks) >= 2  # ...the rest survive the resync
    assert second_end > first_end


def test_zstd_range_splits_tile_file_exactly(tmp_path):
    """Byte-range ownership over .warc.zst == whole-file walk, across
    split sizes that land inside frames, on frames, and past EOF."""
    import os

    from tableextraction_spark.sources.warc import (
        iter_warc_docs_range,
        list_warc_splits,
    )

    recs = []
    for i in range(120):
        body = (f"<html><body>zdoc {i} " + "filler " * (20 + i % 67)
                + "</body></html>").encode()
        recs.append(encode_warc_record(
            "response", encode_http_response(body),
            url=f"http://zex.org/{i}", record_id=str(i),
        ))
    path = tmp_path / "big.warc.zst"
    path.write_bytes(encode_warc(recs, compression="zstd"))
    path = str(path)
    whole = sorted(r[0] for r in iter_warc_docs(open(path, "rb").read())
                   if r[0])
    assert len(whole) == 120
    for split_bytes in (999, 4096, 17001, os.path.getsize(path) * 2):
        splits = list_warc_splits([path], split_bytes)
        got = []
        for p, s, e in splits:
            got.extend(r[0] for r in iter_warc_docs_range(p, s, e) if r[0])
        assert sorted(got) == whole, f"split_bytes={split_bytes}"


def test_zstd_hostile_truncations_never_hang():
    buf = _zst_fixture()
    for cut in (3, 4, 5, 9, 30, len(buf) - 1):
        rows = list(iter_warc_docs(buf[:cut]))  # error rows, no exception
        assert all(len(r) == 8 for r in rows)


def test_brotli_and_zstd_content_encoding_bodies():
    """Content-Encoding: br / zstd payloads decode (pyarrow codecs); an
    unknown encoding is a per-row error, not silently-raw bytes."""
    from tableextraction_spark.sources.warc import parse_http_response

    for enc in ("br", "zstd"):
        resp = encode_http_response(HTML, encoding=enc, chunked=bool(enc == "br"))
        status, headers, payload = parse_http_response(resp)
        assert (status, payload) == (200, HTML)
        assert headers["content-encoding"] == enc
    rows = list(iter_warc_docs(encode_warc([
        encode_warc_record(
            "response", encode_http_response(HTML, encoding="zstd"),
            url="http://z.example/", record_id="z1",
        )
    ])))
    assert [r[0] for r in rows if r[0]] == ["http://z.example/"]
    bogus = encode_http_response(HTML).replace(
        b"Content-Type:", b"Content-Encoding: sdch\r\nContent-Type:", 1
    )
    rows = list(iter_warc_docs(encode_warc([
        encode_warc_record("response", bogus, url="http://s.example/",
                           record_id="s1")
    ])))
    assert rows and rows[0][-1] and "sdch" in rows[0][-1]


def test_cdx_index_rows(spark):
    """warc_cdx_index over a crawl fixture: one CDX row per response
    record, urlkey canonicalized, 14-digit timestamp, sha1 digest."""
    import hashlib

    from tableextraction_spark.sources.warc import warc_cdx_index, warc_to_docs

    recs = [
        encode_warc_record(
            "response", encode_http_response(HTML),
            url="http://www.Example.COM:80/A/B?b=2&a=1", record_id="c1",
        ),
        encode_warc_record(
            "response", encode_http_response(b"x", content_type="text/plain"),
            url="https://sub.ex.org:8080/", record_id="c2",
        ),
        encode_warc_record("request", b"GET / HTTP/1.1\r\n\r\n",
                           url="http://www.example.com/"),
    ]
    files = spark.createDataFrame(
        [("p.warc.gz", encode_warc(recs))], "path string, content binary"
    )
    rows = {r["urlkey"]: r for r in warc_cdx_index(warc_to_docs(spark, files)).collect()}
    assert set(rows) == {"com,example)/a/b?a=1&b=2", "org,ex,sub:8080)/"}
    r = rows["com,example)/a/b?a=1&b=2"]
    assert r["timestamp14"] == "20240101000000"
    assert r["mime"] == "text/html"
    assert r["status"] == 200
    assert r["digest_sha1"] == hashlib.sha1(HTML).hexdigest()
    assert r["length"] == len(HTML)


def test_cdx_urlkey_ip_hosts_pass_through_unreversed(spark):
    """pywb parity: dotted-quad IPv4 and bracketed IPv6 hosts are NOT
    dot-reversed, and the port rule still applies (default 80/443 drop,
    others append) — a reversed IP would produce garbage keys."""
    from pyspark.sql import functions as F

    from tableextraction_spark.sources.warc import cdx_urlkey

    cases = {
        "http://192.168.0.1/Path": "192.168.0.1)/path",
        "http://192.168.0.1:80/": "192.168.0.1)/",
        "https://192.168.0.1:8080/x?b=2&a=1": "192.168.0.1:8080)/x?a=1&b=2",
        "http://[2001:DB8::1]/": "[2001:db8::1])/",
        "http://[2001:DB8::1]:8080/a": "[2001:db8::1]:8080)/a",
        # hostnames still reverse — the IP lane must not leak
        "http://www.Example.COM:80/A": "com,example)/a",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["k"] for r in
           df.select("url", cdx_urlkey(F.col("url")).alias("k")).collect()}
    assert got == cases


@pytest.mark.parametrize("compression", ["gzip", "zstd"])
def test_range_member_overrunning_eager_margin_rereads(tmp_path, monkeypatch, compression):
    """A trailing owned member/frame larger than the eager read margin
    triggers the bounded re-read instead of erroring (both container
    layouts; the zstd path reports the overrun as 'overruns buffer')."""
    import tableextraction_spark.sources.warc as w

    big_body = b"<html><body>" + b"x" * 300_000 + b"</body></html>"
    recs = [
        encode_warc_record(
            "response", encode_http_response(big_body),
            url="http://m.example/big", record_id="m1",
        ),
        encode_warc_record(
            "response", encode_http_response(HTML),
            url="http://m.example/small", record_id="m2",
        ),
    ]
    path = tmp_path / f"m.warc.{'gz' if compression == 'gzip' else 'zst'}"
    path.write_bytes(encode_warc(recs, compression=compression))
    monkeypatch.setattr(w, "_SPLIT_READ_MARGIN", 64)  # force the overrun
    size = path.stat().st_size
    got = []
    for s, e in ((0, 10), (10, size)):  # split 0 owns the big member
        got.extend(r[0] for r in w.iter_warc_docs_range(str(path), s, e) if r[0])
    assert sorted(got) == ["http://m.example/big", "http://m.example/small"]
