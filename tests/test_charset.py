"""Charset detection + per-row decode (operators/text.py)."""

from pyspark.sql import functions as F

from themis_spark.operators import text as T


def _df(spark, payloads):
    rows = [(i, bytearray(b)) for i, b in enumerate(payloads)]
    return spark.createDataFrame(rows, "doc_id long, html binary")


def test_detect_charset_precedence(spark):
    payloads = [
        "plain ascii page".encode("ascii"),                       # 0 → utf-8
        b"\xef\xbb\xbf" + "bom utf8".encode("utf-8"),             # 1 → utf-8
        "x".encode("utf-16"),                                      # 2 → LE BOM
        "x".encode("utf-16-be"),                                   # 3 → no BOM!
        b"\xfe\xff" + "x".encode("utf-16-be"),                     # 4 → BE BOM
        b'<meta charset="ISO-8859-1"><body>caf\xe9</body>',        # 5 → meta
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=windows-1252">hi',           # 6 → meta
        # BOM wins over a lying meta tag
        b"\xef\xbb\xbf" + b'<meta charset="iso-8859-1">x',         # 7 → utf-8
    ]
    got = {r.doc_id: r.c for r in _df(spark, payloads)
           .select("doc_id", T.detect_charset_col("html").alias("c"))
           .collect()}
    assert got == {0: "utf-8", 1: "utf-8", 2: "utf-16le", 3: "utf-8",
                   4: "utf-16be", 5: "iso-8859-1", 6: "windows-1252",
                   7: "utf-8"}


def test_decode_roundtrip(spark):
    cases = [
        ("héllo wörld", "utf-8", "héllo wörld".encode("utf-8")),
        ("café crème", "iso-8859-1",
         b'<meta charset="iso-8859-1">' + "café crème".encode("iso-8859-1")),
        ("unicode ✓ page", "utf-16", "unicode ✓ page".encode("utf-16")),
        ("bom page", "utf-8", b"\xef\xbb\xbf" + "bom page".encode("utf-8")),
    ]
    df = _df(spark, [c[2] for c in cases])
    out = {r.doc_id: (r.charset, r.decoded_text)
           for r in T.with_decoded_text(df).collect()}
    assert out[0] == ("utf-8", "héllo wörld")
    assert out[1][1] == '<meta charset="iso-8859-1">café crème'
    assert "café crème" in out[1][1]
    assert out[2] == ("utf-16le", "unicode ✓ page")
    assert out[3] == ("utf-8", "bom page")       # BOM stripped


def test_decode_unknown_label_falls_back_to_utf8(spark):
    df = _df(spark, [b'<meta charset="koi8-r">abc'])
    out = T.with_decoded_text(df).collect()[0]
    assert out.charset == "koi8-r"
    assert out.decoded_text.endswith("abc")


def test_charset_is_scan_stage(spark):
    df = _df(spark, [b"x"])
    plan = T.with_decoded_text(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
