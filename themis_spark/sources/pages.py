"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Shape pinned by BASELINE.json input_hint:
``url string, warc_ts timestamp, html binary, text string, lang string``
plus an engine-added ``meta`` JSON column (exercises the cyclic-$ref Arrow
path) and a ``part_id`` partition column.

Everything is generated DISTRIBUTED from ``spark.range(n)`` with pure
native expressions keyed on ``xxhash64(id, seed)`` — no Python UDFs, no
``rand()`` (checkpoint/resume and the byte-identical-text-per-url
invariant require full determinism; SURVEY.md §7.3.8). Skew is real:
hosts and langs follow power-law mixes so the uniqueness/referential
benchmarks exercise the salted/AQE paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["en", "zh", "es", "de", "fr", "ja", "ru", "pt", "it", "nl"]
# power-law-ish lang mix (en-heavy, like the web)
_LANG_CUM = [400, 550, 670, 770, 850, 905, 945, 975, 992, 1000]

_VOCAB = (
    "the of data web page crawl text spark scale table index fast slow "
    "query join merge sort hash scan filter group count value key row "
    "column batch stream node edge graph link href title body head meta "
    "content language token word char byte block file part run pass check"
).split()


def _h(seed: int) -> F.Column:
    """Deterministic uniform int from the row id and a stream seed."""
    return F.xxhash64(F.col("id"), F.lit(seed))


def _u(seed: int, m: int) -> F.Column:
    """Uniform integer in [0, m)."""
    return F.pmod(_h(seed), F.lit(m))


def _url_of(id_col: F.Column, seed: int, n_hosts: int) -> F.Column:
    """Canonical url for a row id — host drawn Zipf-ish (cubed uniform)
    from the id's own hash, so ANY expression that needs 'the url row X
    got' (dup planting, FK child tables) derives the identical string."""
    u = F.pmod(F.xxhash64(id_col, F.lit(seed + 1)), F.lit(1_000_000)) / 1_000_000.0
    host_idx = F.floor(F.pow(u, F.lit(3.0)) * n_hosts).cast("int")
    return F.concat(
        F.lit("https://host"), host_idx.cast("string"), F.lit(".example.com/p/"),
        id_col.cast("string"),
    )


def generate_pages(
    spark: SparkSession,
    n_rows: int,
    n_partitions: int = 8,
    seed: int = 42,
    n_hosts: int = 1000,
    drift: bool = False,
) -> DataFrame:
    """Build the pages DataFrame with planted anomalies at fixed rates.

    Anomaly rates (FIXTURES.md): dup url 0.5%, bad lang 1%, bad url
    pattern 0.5%, NULL text 1%, NULL warc_ts 0.2%, short text 1%,
    duplicate meta tags 2%.
    """
    df = spark.range(n_rows).repartition(max(n_partitions * 4, 32))

    # ---- url: Zipf-ish host skew via cubed uniform (mass piles on host 0)
    base_url = _url_of(F.col("id"), seed, n_hosts)
    # planted dup urls (0.5%): re-emit the exact url of row id-7 (clamped)
    dup_url = _url_of(F.greatest(F.col("id") - 7, F.lit(0)), seed, n_hosts)
    url = F.when(_u(seed + 2, 200) == 0, dup_url).otherwise(base_url)
    # planted bad scheme (0.5%)
    url = F.when(_u(seed + 3, 200) == 0, F.regexp_replace(url, "^https", "htp")).otherwise(url)

    # ---- text: 20–120 words from a fixed vocab, keyed on the URL so that
    # re-crawls of a duplicated url reproduce byte-identical text — the
    # per-row invariant (BASELINE.json input_hint)
    def _uu(s: int, m: int) -> F.Column:
        return F.pmod(F.xxhash64(url, F.lit(s)), F.lit(m))

    n_words = (_uu(seed + 4, 101) + 20).cast("int")
    n_words = F.when(_uu(seed + 5, 100) == 0, F.lit(2)).otherwise(n_words)  # short 1%
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(vocab, (F.pmod(F.xxhash64(url, i, F.lit(seed)), F.lit(len(_VOCAB))) + 1).cast("int")),
    )
    text = F.array_join(words, " ")
    text = F.when(_uu(seed + 6, 100) == 0, F.lit(None).cast("string")).otherwise(text)  # null 1%

    # ---- warc_ts: uniform over 2024 (+90d when drifted); 0.2% NULL
    ts_base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    offset_s = _u(seed + 7, 365 * 86400)
    if drift:
        offset_s = offset_s + F.lit(90 * 86400)
    warc_ts = F.timestamp_seconds(F.unix_timestamp(ts_base) + offset_s)
    warc_ts = F.when(_u(seed + 8, 500) == 0, F.lit(None).cast("timestamp")).otherwise(warc_ts)

    # ---- lang: skewed categorical via cumulative thresholds; 1% invalid
    lr = _u(seed + 9, 1000)
    lang = F.lit(LANGS[-1])
    for cum, code in zip(reversed(_LANG_CUM[:-1]), reversed(LANGS[:-1])):
        lang = F.when(lr < cum, F.lit(code)).otherwise(lang)
    if drift:  # re-weight: push mass off 'en'
        lang = F.when(_u(seed + 12, 3) == 0, F.lit("zh")).otherwise(lang)
    lang = F.when(_u(seed + 10, 100) == 0, F.lit("xx")).otherwise(lang)

    # ---- meta JSON (cyclic-$ref exercise): tags array, 2% duplicate tags
    tag1 = F.element_at(vocab, (_u(seed + 11, len(_VOCAB)) + 1).cast("int"))
    tag2 = F.element_at(vocab, (_u(seed + 13, len(_VOCAB)) + 1).cast("int"))
    dup_tags = _u(seed + 14, 50) == 0
    meta = F.concat(
        F.lit('{"tags": ["'), tag1, F.lit('", "'),
        F.when(dup_tags, tag1).otherwise(tag2),
        F.lit('"], "parent": {"tags": []}}'),
    )

    html = F.encode(F.concat(F.lit("<html><body>"), F.coalesce(text, F.lit("")), F.lit("</body></html>")), "UTF-8")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        meta.alias("meta"),
        F.pmod(F.xxhash64(url), F.lit(n_partitions)).cast("int").alias("part_id"),
    )


def generate_links(spark: SparkSession, n_rows: int, pages_n: int, seed: int = 42) -> DataFrame:
    """Child table: src_url FK → pages.url with ~1% planted orphans."""
    df = spark.range(n_rows)
    src_id = F.pmod(F.xxhash64("id", F.lit(seed + 21)), F.lit(pages_n))
    src = _url_of(src_id, seed, 1000)
    # orphans: host ids that generate_pages never produces
    orphan = F.concat(F.lit("https://orphan"), F.col("id").cast("string"), F.lit(".example.org/"))
    src = F.when(F.pmod(F.xxhash64("id", F.lit(seed + 22)), F.lit(100)) == 0, orphan).otherwise(src)
    dst_id = F.pmod(F.xxhash64("id", F.lit(seed + 23)), F.lit(pages_n))
    dst = F.concat(F.lit("https://host0.example.com/p/"), dst_id.cast("string"))
    return df.select(src.alias("src_url"), dst.alias("dst_url"))


PAGES_SCHEMA_JSON = {
    "id": "pages",
    "type": "object",
    "required": ["url", "text", "lang"],
    "properties": {
        "url": {"type": "string", "pattern": "^https?://", "minLength": 10, "maxLength": 2048},
        "text": {"type": "string", "minLength": 20},
        "lang": {"enum": LANGS},
        "warc_ts": {"type": "string", "format": "date-time"},
        "meta": {"$ref": "#/definitions/meta"},
    },
    "definitions": {
        "meta": {
            "type": "object",
            "properties": {
                "tags": {"type": "array", "items": {"type": "string"}, "uniqueItems": True},
                "parent": {"$ref": "#/definitions/meta"},
            },
        }
    },
}


def write_pages_dataset(spark: SparkSession, out_dir: str, n_rows: int,
                        n_partitions: int = 8, seed: int = 42,
                        files_per_partition: int = 1) -> None:
    """Materialize pages + links (+ drifted pages) as partitioned Parquet.

    Rows are re-shuffled onto their partition key before the write so each
    partition directory holds a few LARGE files instead of
    (#tasks × #partitions) slivers — small files would cap the Parquet
    vectorized-reader batch and with it the Arrow batch size feeding the
    Python validators (measured: ~200-row batches → 6× slower pass).
    """
    def _layout(df: DataFrame) -> DataFrame:
        return df.repartition(n_partitions * files_per_partition, F.col("part_id"))

    pages = _layout(generate_pages(spark, n_rows, n_partitions, seed))
    pages.write.mode("overwrite").partitionBy("part_id").parquet(f"{out_dir}/pages")
    generate_links(spark, max(n_rows // 2, 100), n_rows, seed).write.mode("overwrite").parquet(f"{out_dir}/links")
    _layout(generate_pages(spark, n_rows, n_partitions, seed + 1000, drift=True)).write.mode(
        "overwrite"
    ).partitionBy("part_id").parquet(f"{out_dir}/pages_drift")
