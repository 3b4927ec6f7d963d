"""WARC ingestion: stdlib parser over binaryFile + mapInPandas."""

from themis_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    read_warc,
    warc_responses,
    write_warc_fixture,
)

RECS = [
    {"url": "https://a.example.com/x", "ts": "2024-01-02T03:04:05Z",
     "html": "<html><body><p>hello world</p></body></html>"},
    {"url": "https://b.example.com/y", "ts": "2024-02-02T03:04:05Z",
     "html": "<html><body><p>second page</p></body></html>"},
    {"url": "https://c.example.com/z", "ts": "2024-03-02T03:04:05Z",
     "html": "gone", "status": 404},
]


def test_iter_warc_records_plain_and_gzip():
    for compress in (False, True):
        got = list(iter_warc_records(build_warc_bytes(RECS, compress)))
        assert [r["url"] for r in got] == [r["url"] for r in RECS]
        assert all(r["record_type"] == "response" for r in got)
        assert got[0]["http_status"] == 200 and got[2]["http_status"] == 404
        # HTTP envelope stripped: payload is the raw html
        assert got[0]["payload"] == RECS[0]["html"].encode()
        assert got[0]["content_type"] == "text/html"


def test_iter_warc_records_tolerates_trailing_garbage():
    raw = build_warc_bytes(RECS[:1]) + b"NOT A WARC RECORD"
    got = list(iter_warc_records(raw))
    assert len(got) == 1


def test_read_warc_distributed(spark, tmpdir_path):
    write_warc_fixture(f"{tmpdir_path}/a.warc", RECS[:2])
    write_warc_fixture(f"{tmpdir_path}/b.warc.gz", RECS[2:], compress=True)
    df = read_warc(spark, tmpdir_path)
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {r["url"] for r in RECS}
    assert rows["https://c.example.com/z"]["http_status"] == 404
    # two source files -> two src_file values
    assert len({r["src_file"] for r in rows.values()}) == 2


def test_warc_responses_feeds_text_extraction(spark, tmpdir_path):
    from pyspark.sql import functions as F

    from themis_spark.operators.text import extracted_text_col

    write_warc_fixture(f"{tmpdir_path}/c.warc", RECS)
    pages = warc_responses(spark, tmpdir_path)
    got = {r["url"]: r for r in pages.select(
        "url", "warc_ts",
        extracted_text_col(F.col("html")).alias("text")).collect()}
    # the 404 record is filtered; 200s flow into native text extraction
    assert set(got) == {RECS[0]["url"], RECS[1]["url"]}
    assert got[RECS[0]["url"]]["text"] == "hello world"
    assert got[RECS[0]["url"]]["warc_ts"].year == 2024


def test_warc_to_validation_end_to_end(spark, tmpdir_path):
    # the whole ingestion story: WARC bytes -> pages shape -> native
    # text extraction -> compiled draft-4 validation -> violation triples
    from pyspark.sql import functions as F

    from themis_spark.operators.text import extracted_text_col
    from themis_spark.operators.validate import annotate, violations_df
    from themis_spark.plans.compiler import compile_plan

    bad = {"url": "not-a-url", "ts": "2024-01-01T00:00:00Z",
           "html": "<html><body><p>x</p></body></html>"}
    write_warc_fixture(f"{tmpdir_path}/d.warc", RECS[:2] + [bad])
    pages = warc_responses(spark, tmpdir_path).select(
        "url", "warc_ts",
        extracted_text_col(F.col("html")).alias("text"))
    schema = {
        "id": "warc-pages", "type": "object",
        "required": ["url", "warc_ts", "text"],
        "properties": {
            "url": {"type": "string", "pattern": "^https?://"},
            "text": {"type": "string", "minLength": 8},
        },
    }
    plan = compile_plan(schema, pages.schema)
    ann = annotate(pages, plan, keep=["url"])
    viol = {(r["url"], r["keyword"]) for r in violations_df(ann).collect()}
    assert ("not-a-url", "pattern") in viol
    # the short-text page ("x", 1 char) violates minLength
    assert ("not-a-url", "minLength") in viol
    # clean pages produce no violations
    assert not any(u == RECS[0]["url"] for (u, _) in viol)


def test_iter_warc_records_gzip_trailing_garbage_and_truncation():
    # trailing non-gzip bytes after complete members: all records parse
    gz = build_warc_bytes(RECS, compress=True)
    got = list(iter_warc_records(gz + b"JUNK TRAILER BYTES"))
    assert [r["url"] for r in got] == [r["url"] for r in RECS]
    # truncated final member: earlier records still come through
    got = list(iter_warc_records(gz[: len(gz) - 20]))
    assert len(got) == len(RECS) - 1
    # corrupt middle member: stops cleanly at the last good record
    head = build_warc_bytes(RECS[:1], compress=True)
    corrupt = bytearray(build_warc_bytes(RECS[1:2], compress=True))
    corrupt[len(corrupt) // 2] ^= 0xFF
    got = list(iter_warc_records(head + bytes(corrupt)))
    assert [r["url"] for r in got] == [RECS[0]["url"]]


def test_iter_warc_records_streams_large_member_in_chunks():
    # one member that inflates past the 1 MiB chunk size must round-trip
    # byte-exactly through the incremental inflate path
    big = [{"url": "https://big.example.com/x",
            "ts": "2024-01-02T03:04:05Z",
            "html": "<html>" + "x" * (3 << 20) + "</html>"}]
    got = list(iter_warc_records(build_warc_bytes(big, compress=True)))
    assert len(got) == 1
    assert got[0]["payload"] == big[0]["html"].encode()


def test_wet_conversion_records(spark, tmpdir_path):
    import os

    from themis_spark.sources.warc import build_warc_bytes, wet_documents

    recs = [
        {"url": "http://a.example/x", "ts": "2026-01-01T00:00:00Z",
         "html": "extracted text one é", "type": "conversion"},
        {"url": "http://b.example/y", "ts": "2026-01-02T00:00:00Z",
         "html": b"bad \xff bytes here", "type": "conversion"},
        {"url": "http://c.example/z", "ts": "2026-01-03T00:00:00Z",
         "html": "<html>resp</html>", "type": "response"},
    ]
    with open(os.path.join(tmpdir_path, "f.warc.wet.gz"), "wb") as f:
        f.write(build_warc_bytes(recs, compress=True))
    out = {r["url"]: r for r in wet_documents(spark, tmpdir_path).collect()}
    # response records are excluded; both conversion records survive
    assert sorted(out) == ["http://a.example/x", "http://b.example/y"]
    assert out["http://a.example/x"]["text"] == "extracted text one é"
    # a mis-encoded byte substitutes U+FFFD instead of failing the task
    assert "�" in out["http://b.example/y"]["text"]
    assert out["http://a.example/x"]["warc_ts"] is not None


def test_warc_parser_never_raises_on_garbage():
    """iter_warc_records' documented contract: hostile/truncated/
    corrupt bytes stop the iterator cleanly at the last good record —
    NEVER an exception (a crawl job must not die on one bad segment)."""
    import gzip as _gzip

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from themis_spark.sources.warc import build_warc_bytes, iter_warc_records

    valid = build_warc_bytes(RECS)
    valid_gz = build_warc_bytes(RECS, compress=True)

    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(mode=st.integers(0, 3), pos=st.integers(0, 10_000),
           val=st.integers(0, 255), body=st.binary(max_size=300))
    def prop(mode, pos, val, body):
        if mode == 0:
            payload = body
        elif mode == 1:
            payload = b"WARC/1.0\r\n" + body
        elif mode == 2:
            m = bytearray(valid)
            m[pos % len(m)] = val
            payload = bytes(m)
        else:
            m = bytearray(valid_gz)
            m[pos % len(m)] = val
            payload = bytes(m)
        for rec in iter_warc_records(payload):
            assert isinstance(rec, dict)

    prop()


def test_warc_gzip_member_bomb_is_streamed_not_materialized():
    """a gzip member expanding hugely must not blow memory before the
    record length check: the incremental inflate yields chunks and the
    header walk bails on a bogus Content-Length instead of expanding
    everything."""
    from themis_spark.sources.warc import iter_warc_records

    # a record CLAIMING a 10 GB body, backed by a highly compressible
    # gzip member: parsing must stop (truncated body) without trying to
    # allocate the claimed size
    head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"Content-Length: 10000000000\r\n\r\n")
    import gzip as _gzip

    payload = _gzip.compress(head + b"x" * 1_000_000)
    assert list(iter_warc_records(payload)) == []
