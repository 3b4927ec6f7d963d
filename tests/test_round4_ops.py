"""Round-4 operator tests: Unicode script profiling, document chunking,
and jusText-lite main-content extraction (operators/text.py).

Each operator also has an oracle row (text_script / text_chunks /
text_main_content) — these tests pin the SEMANTICS on hand-built edge
cases the synthetic corpus can't exercise, plus the plan shape (pure
scan-stage native: no shuffle, no Python).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from themis_spark.operators import text as T


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------- script profile

def test_script_profile_counts_and_dominant(spark):
    rows = [
        (0, "hello world"),                    # pure latin
        (1, "привет мир"),                     # pure cyrillic
        (2, "日本語のテキスト and latin here"),  # cjk+kana+latin, latin wins
        (3, "   "),                            # whitespace only -> und
        (4, "1234 !!"),                        # no script chars -> und
        (5, "ab мир"),                         # 2 latin vs 3 cyrillic
        (6, "αβγ"),                            # greek
        (7, "שלום"),                           # hebrew
        (8, "مرحبا"),                          # arabic
        (9, "안녕하세요"),                      # hangul
        (10, "नमस्ते"),                         # devanagari
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in T.script_profile(df).collect()}

    assert out[0]["dominant_script"] == "latin" and out[0]["n_latin"] == 10
    assert out[1]["dominant_script"] == "cyrillic" and out[1]["n_cyrillic"] == 9
    assert out[2]["n_cjk"] == 3 and out[2]["n_kana"] == 5
    assert out[2]["dominant_script"] == "latin"  # 13 latin chars win
    assert out[3]["dominant_script"] == "und"
    assert out[3]["n_script_chars"] == 0
    assert out[4]["dominant_script"] == "und"
    assert out[5]["dominant_script"] == "cyrillic"
    for doc, script in [(6, "greek"), (7, "hebrew"), (8, "arabic"),
                        (9, "hangul"), (10, "devanagari")]:
        assert out[doc]["dominant_script"] == script, (doc, out[doc])


def test_script_profile_tie_breaks_to_first_range(spark):
    # 3 latin vs 3 cyrillic: latin is earlier in SCRIPT_RANGES
    df = spark.createDataFrame([(0, "abc мир")], "doc_id long, text string")
    row = T.script_profile(df).collect()[0]
    assert row["n_latin"] == row["n_cyrillic"] == 3
    assert row["dominant_script"] == "latin"


def test_script_profile_is_scan_stage(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = _plan(T.script_profile(df))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


# ----------------------------------------------------------- chunk_spans

def test_chunk_spans_disjoint_default_stride(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g")], "doc_id long, text string")
    rows = T.chunk_spans(df, size=3).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["token_start"], r["token_end"], r["chunk_text"])
            for r in rows] == [
        (0, 0, 3, "a b c"), (1, 3, 6, "d e f"), (2, 6, 7, "g")]


def test_chunk_spans_overlap(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    rows = T.chunk_spans(df, size=4, stride=2).orderBy("chunk_id").collect()
    assert [r["chunk_text"] for r in rows] == ["a b c d", "c d e", "e"]
    # every token is covered by at least one chunk; spans are consistent
    for r in rows:
        assert r["token_end"] - r["token_start"] == r["n_chunk_tokens"]
    assert rows[0]["token_start"] == 0 and rows[-1]["token_end"] == 5


def test_chunk_spans_empty_and_null_docs_yield_no_chunks(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "one")],
        "doc_id long, text string")
    rows = T.chunk_spans(df, size=8).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(3, "one")]


def test_chunk_spans_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.chunk_spans(df, size=0)
    with pytest.raises(ValueError):
        T.chunk_spans(df, size=4, stride=0)


def test_chunk_spans_is_scan_stage(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = _plan(T.chunk_spans(df, size=2))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


# ---------------------------------------------------------- main content

def _pages(spark, pages: list[tuple[int, str]]):
    return spark.createDataFrame(pages, "doc_id long, page string").select(
        "doc_id", F.encode("page", "UTF-8").alias("html"))


def test_main_content_drops_nav_ads_footer(spark):
    html = ('<html><body>'
            '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
            '<p>This is the real article body with many plain words.</p>'
            '<div><a href="x">click</a> <a href="y">win now</a></div>'
            '<footer>copyright foo</footer>'
            '</body></html>')
    row = T.main_content(_pages(spark, [(0, html)])).collect()[0]
    assert row["main_text"] == (
        "This is the real article body with many plain words.")
    assert row["n_blocks"] == 4 and row["n_kept"] == 1
    # nav(2 anchor words) + ads(3 words) + footer(2 words)
    assert row["n_boiler_words"] == 7


def test_main_content_script_style_do_not_leak(spark):
    html = ('<html><body>'
            '<script>var x = "<p>decoy words that must never appear</p>";'
            '</script>'
            '<style>p { color: red } /* more decoy */</style>'
            '<p>Real sentence with enough words here.</p>'
            '</body></html>')
    row = T.main_content(_pages(spark, [(0, html)])).collect()[0]
    assert row["main_text"] == "Real sentence with enough words here."
    assert "decoy" not in row["main_text"]
    assert row["n_blocks"] == 1


def test_main_content_link_density_boundary(spark):
    # 1 anchor word of 3 total = 33.(3)% <= 34% -> kept;
    # 2 anchor words of 3 total -> dropped
    kept = '<p><a href="x">linked</a> plain words</p>'
    dropped = '<p><a href="x">two linked</a> words</p>'
    out = {r["doc_id"]: r for r in T.main_content(_pages(spark, [
        (0, f"<html><body>{kept}</body></html>"),
        (1, f"<html><body>{dropped}</body></html>"),
    ])).collect()}
    assert out[0]["n_kept"] == 1 and out[0]["main_text"] == "linked plain words"
    assert out[1]["n_kept"] == 0 and out[1]["main_text"] == ""


def test_main_content_min_words(spark):
    out = T.main_content(_pages(spark, [
        (0, "<html><body><p>too short</p></body></html>"),
    ])).collect()[0]
    assert out["n_kept"] == 0 and out["n_boiler_words"] == 2


def test_main_content_multiple_kept_blocks_join_in_order(spark):
    html = ('<html><body><h1>First heading stays here</h1>'
            '<p>Second paragraph also stays put.</p></body></html>')
    row = T.main_content(_pages(spark, [(0, html)])).collect()[0]
    assert row["main_text"] == (
        "First heading stays here Second paragraph also stays put.")
    assert row["n_kept"] == 2


def test_main_content_no_body_is_empty(spark):
    row = T.main_content(_pages(spark, [(0, "<html>no body tag</html>")])
                         ).collect()[0]
    assert row["main_text"] == "" and row["n_blocks"] == 0


def test_main_content_is_scan_stage(spark):
    df = _pages(spark, [(0, "<html><body><p>words here now</p></body></html>")])
    plan = _plan(T.main_content(df))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
