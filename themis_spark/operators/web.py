"""Web-corpus operators: URL feature extraction and per-domain profiling.

Common-Crawl-style pipelines filter, group, and sample by URL structure
constantly (domain-level quality lists, per-host crawl budgets, TLD
allowlists). Everything here is a pure native Column expression
(regexp_extract / split — scan-stage, whole-stage codegen, zero shuffle,
zero Python) and deliberately SQL-portable so the DuckDB oracle replays
it exactly.

Reference parity note: the reference (playlyfe/themis, SURVEY.md §2(a))
has no URL operators — this module belongs to the §2(b)-style dataflow
layer the north rule adds on top (training-data pipeline ops).

Scale shape: ``url_features_cols`` adds O(1) regex work per row inside
the scan projection; ``domain_stats`` is one partial+final hash
aggregation whose exchange carries (domain, partial-agg) rows — O(distinct
domains), never O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC-3986-ish split, kept simple enough to replay in any regex engine:
# scheme://host[:port]/path?query#fragment
_SCHEME_RE = r"^([a-z][a-z0-9+.-]*):"
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/?#:]+)"
_PATH_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def scheme_col(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _SCHEME_RE, 1)


def host_col(url: Column | str) -> Column:
    """Hostname (no port, no userinfo handling — crawl URLs don't carry
    credentials; a row that does simply yields the raw authority)."""
    return F.regexp_extract(_c(url), _HOST_RE, 1)


def registered_domain_col(url: Column | str) -> Column:
    """Last two host labels — the standard cheap approximation of the
    registrable domain. A real pipeline swaps in the public-suffix list
    (a broadcast lookup keyed by the last 1-3 labels); the column
    signature stays the same.
    """
    labels = F.split(host_col(url), r"\.")
    n = F.size(labels)
    return F.when(n >= 2, F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))).otherwise(
        F.element_at(labels, 1)
    )


def tld_col(url: Column | str) -> Column:
    labels = F.split(host_col(url), r"\.")
    return F.when(F.size(labels) >= 1, F.element_at(labels, -1)).otherwise(F.lit(""))


def path_depth_col(url: Column | str) -> Column:
    """Number of non-empty path segments (``/a/b/c`` -> 3, ``/`` -> 0)."""
    path = F.regexp_extract(_c(url), _PATH_RE, 1)
    segs = F.filter(F.split(path, "/"), lambda s: F.length(s) > 0)
    return F.size(segs)


def n_query_params_col(url: Column | str) -> Column:
    """Count of ``&``-separated non-empty parameters in the query string."""
    q = F.regexp_extract(_c(url), _QUERY_RE, 1)
    params = F.filter(F.split(q, "&"), lambda s: F.length(s) > 0)
    return F.size(params)


def url_features_cols(url: Column | str) -> list[Column]:
    """The full per-URL feature bundle as aliased columns, composable
    into any scan projection (one pass, codegen)."""
    return [
        scheme_col(url).alias("scheme"),
        host_col(url).alias("host"),
        registered_domain_col(url).alias("registered_domain"),
        tld_col(url).alias("tld"),
        path_depth_col(url).alias("path_depth"),
        n_query_params_col(url).alias("n_query_params"),
    ]


# Query parameters dropped by canonicalization: tracking/session noise
# that fragments crawl URLs into spurious variants of the same page.
_TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def canonical_url_col(url: Column | str) -> Column:
    """Canonical form of a crawl URL — the key for URL-level dedup.

    Contract (each step a native regexp/array expression, replayable in
    RE2 so the DuckDB oracle matches byte-for-byte — no lookaround, no
    backrefs in patterns):

    1. drop the ``#fragment``;
    2. lowercase the scheme+authority (path/query case is preserved —
       paths are case-sensitive on most origin servers);
    3. drop default ports ``:80`` (http) and ``:443`` (https);
    4. drop a single trailing ``/`` from the path (root ``https://h/``
       normalizes to ``https://h``);
    5. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
       ``ref``), preserving the relative order of the rest, and drop the
       ``?`` when nothing survives.

    Pure scan-stage projection: zero shuffle, zero Python; pair with
    ``canonical_duplicates`` for the grouping pass.
    """
    u = _c(url)
    u = F.regexp_replace(u, r"#.*$", "")
    head = F.regexp_extract(u, r"^((?i)[a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(F.lower(head), F.substr(u, F.length(head) + F.lit(1)))
    u = F.regexp_replace(u, r"^(http://[^/:?#]*):80($|[/?#])", r"$1$2")
    u = F.regexp_replace(u, r"^(https://[^/:?#]*):443($|[/?#])", r"$1$2")
    base = F.regexp_replace(F.regexp_replace(u, r"\?.*$", ""), r"/$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    new_q = F.array_join(kept, "&")
    return F.when(F.length(new_q) > 0, F.concat(base, F.lit("?"), new_q)).otherwise(base)


def canonical_duplicates(df: DataFrame, url: str = "url", min_count: int = 2) -> DataFrame:
    """URL-level duplicate groups after canonicalization:
    ``(canonical_url, n_variants, n_rows)`` for every canonical form hit
    by ``min_count``+ raw rows. One partial+final aggregation keyed on
    the canonical string — the exchange carries one row per canonical
    URL, and a hot canonical (front page linked everywhere) combines
    map-side, so skew cannot flood the shuffle.
    """
    canon = canonical_url_col(F.col(url)).alias("canonical_url")
    return (
        df.select(canon, F.col(url))
        .groupBy("canonical_url")
        .agg(
            F.countDistinct(url).alias("n_variants"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .where(F.col("n_rows") >= min_count)
    )


def domain_stats(
    df: DataFrame,
    url: str = "url",
    n_chars: str | None = None,
    lang: str | None = None,
) -> DataFrame:
    """Per-registered-domain corpus profile: page count, host count, and
    (optionally) mean document length and distinct-language count.

    One partial+final hash aggregation; the exchange carries one row per
    distinct domain. Skewed mega-domains are safe: Catalyst's partial
    aggregation combines map-side, so a domain with 10^9 pages still
    ships one partial row per task, not 10^9 rows.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(host_col(F.col(url))).alias("n_hosts"),
    ]
    if n_chars is not None:
        aggs.append(F.round(F.avg(F.col(n_chars)), 4).alias("avg_chars"))
    if lang is not None:
        aggs.append(F.countDistinct(F.col(lang)).alias("n_langs"))
    return df.groupBy(registered_domain_col(F.col(url)).alias("registered_domain")).agg(*aggs)


def top_pages_per_domain(
    df: DataFrame,
    url: str = "url",
    order_by: str = "quality",
    k: int = 10,
    descending: bool = True,
) -> DataFrame:
    """Grouped top-k: the k best pages per registered domain (crawl-budget
    / per-domain sampling shape) — ``(registered_domain, url, <order_by>,
    rank)``.

    A ranking window with a ``rank <= k`` filter, which Spark executes as
    WindowGroupLimit: each task keeps only its per-group top-k BEFORE the
    exchange, so the shuffle carries at most k rows per (task, domain),
    never the corpus — the grouped analogue of TakeOrderedAndProject.
    Ties break on url for determinism.
    """
    from pyspark.sql.window import Window

    dom = registered_domain_col(F.col(url)).alias("registered_domain")
    o = F.col(order_by).desc() if descending else F.col(order_by).asc()
    w = Window.partitionBy("registered_domain").orderBy(o, F.col(url).asc())
    return (
        df.select(dom, F.col(url), F.col(order_by))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def latest_revisions(df: DataFrame, url: str = "url", ts: str = "fetched_at",
                     key: str | None = None) -> DataFrame:
    """Crawl-snapshot consolidation: ONE row per canonical URL — the
    newest fetch wins (re-crawls, tracking-param variants, http/https and
    trailing-slash twins all collapse). Input rows pass through with two
    added columns: ``canonical_url`` and ``n_revisions`` — the TOTAL
    raw fetches of that canonical URL, survivor included (so
    ``n_revisions - 1`` rows were dropped; the re-crawl-depth signal).

    Deterministic: ties on the timestamp break on ``key`` ascending (or
    the raw URL string when no key column is given), so resume/re-runs
    and the SQL oracle pick the identical survivor.

    Plan shape: canonicalize map-side (scan-stage projection), then ONE
    exchange on the canonical string for the ranking window; the rank
    and the revision count share the same WindowExec partitioning (no
    second shuffle). A hot canonical URL means a big window partition,
    not quadratic work — the window scan is linear.
    """
    from pyspark.sql.window import Window

    tie = F.col(key) if key else F.col(url)
    base = df.withColumn("canonical_url", canonical_url_col(F.col(url)))
    w = Window.partitionBy("canonical_url")
    wo = w.orderBy(F.col(ts).desc(), tie.asc())
    return (
        base.withColumn("__rn", F.row_number().over(wo))
        .withColumn("n_revisions", F.count(F.lit(1)).over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping_num: int = 85, damping_den: int = 100,
             scale: int = 10**6) -> DataFrame:
    """Link-graph PageRank in FIXED-POINT integer arithmetic — the crawl
    harvest-quality / spam-demotion signal, computed so two engines (and
    two cluster sizes) agree BIT-FOR-BIT: every rank is an integer in
    ``scale`` units, per-edge contributions are integer floor divisions
    and per-node sums are integer additions — order-independent, so the
    result is partitioning-insensitive and the DuckDB oracle unrolls the
    same iterations exactly (float PageRank can't promise either: float
    summation order varies by plan).

    Semantics: ``rank0 = scale`` for every node (any endpoint of any
    edge); each iteration ``rank' (n) = floor(scale*(den-num)/den) +
    Σ_{e: src->n} floor(rank(src)*num / (den*outdeg(src)))``. Dangling
    mass evaporates (documented simplification — this is a per-node
    quality SIGNAL, not the normalized eigenvector; ordering is what
    downstream filters consume). Multi-edges count once per edge.

    Plan shape per iteration: edges⋈deg⋈ranks (all equi-joins on the
    node id, map-side combinable contribution agg — the exchange
    carries one row per in-linked node) + a left join back to the node
    set for no-in-link nodes. The rank frame ``localCheckpoint``s every
    third iteration (same lineage-truncation contract as
    ``dedup.duplicate_clusters``): without it the nested-join plan
    grows per round and analyzer/optimizer cost dominates past ~10
    iterations. Integer fixed-point means the checkpointed values are
    bit-exact, so truncation cannot change the result.
    Overflow headroom: rank ≤ scale·N concentrates only pathologically;
    with scale 10⁶ and ranks < 2⁵⁰, ``rank*num`` stays far inside int64.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node"))).distinct())
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    base = (scale * (damping_den - damping_num)) // damping_den

    def idiv(a, b):  # exact integer floor division for non-negative a, b
        return ((a - F.pmod(a, b)) / b).cast("long")

    for i in range(iters):
        contribs = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                idiv(F.col("rank") * damping_num,
                     F.col("outdeg") * damping_den).alias("c"),
            )
            .groupBy("node").agg(F.sum("c").alias("insum"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("insum"), F.lit(0)))
            .cast("long").alias("rank"),
        )
        if (i + 1) % 3 == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def blocked_col(url: Column | str,
                host_suffixes: list[str] | None = None,
                path_prefixes: list[str] | None = None) -> Column:
    """The blocklist verdict as a reusable boolean Column (shared by
    :func:`blocklist_filter` and ``pipeline.curate``'s funnel rule).

    Hostnames are case-insensitive (RFC 4343) — the parsed host is
    lowercased before the suffix comparison, and the scheme match is
    case-insensitive, so ``HTTPS://Ads.Example.com`` cannot evade a
    lowercase blocklist entry. Paths stay case-sensitive (they are on
    most origin servers). NULL/unparseable urls pin to ``false`` —
    (false OR NULL) is NULL under SQL three-valued logic, and an
    unparseable row is the quality filters' problem, not a blocklist
    hit."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, r"^(?i)[a-z][a-z0-9+.-]*://([^/?#:]+)", 1))
    path = F.regexp_extract(u, r"^(?i)[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    blocked = F.lit(False)
    for sfx in host_suffixes or []:
        s = sfx.lower().lstrip(".")
        blocked = blocked | (host == s) | host.endswith("." + s)
    for pfx in path_prefixes or []:
        blocked = blocked | path.startswith(pfx)
    return F.coalesce(blocked, F.lit(False))


def blocklist_filter(df: DataFrame, url: str = "url",
                     host_suffixes: list[str] | None = None,
                     path_prefixes: list[str] | None = None,
                     mode: str = "flag") -> DataFrame:
    """Blocklist curation (the RefinedWeb/Dolma-style URL filter): flag
    or drop rows whose host matches a blocked registrable suffix or
    whose path starts with a blocked prefix.

    ``host_suffixes`` match whole label boundaries (``"ads.example"``
    blocks ``ads.example`` and ``*.ads.example``, never
    ``bads.example``), case-insensitively; ``path_prefixes`` are
    literal case-sensitive path prefixes (``"/tracker/"``). Both lists
    fold into ONE scan-stage boolean column at compile time (a
    when/ends-with chain over the parsed host — no join, no shuffle,
    no regex escaping pitfalls from user strings). Blocklists of
    production size (10⁴–10⁶ entries) should use the broadcast-join
    form instead: join host against a blocked-suffix table on the
    host's registrable domain — this literal form is for the common
    curated-list case (≤ a few hundred entries).

    ``mode="flag"`` appends a ``blocked`` boolean (for funnel
    attribution via filter_funnel); ``mode="drop"`` returns survivors.
    """
    blocked = blocked_col(F.col(url), host_suffixes, path_prefixes)
    if mode == "drop":
        return df.where(~blocked)
    if mode != "flag":
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    return df.withColumn("blocked", blocked)


def snapshot_diff(old: DataFrame, new: DataFrame, key: str = "url",
                  digest: str = "content_digest") -> DataFrame:
    """Crawl-to-crawl incremental diff: which keys were added, removed,
    changed, or unchanged between two snapshots —
    ``(key, status, old_digest, new_digest)``. The bookkeeping step an
    incremental 10¹²-row pipeline runs before revalidating anything:
    only ``added``/``changed`` rows need the expensive passes.

    Each side must be key-unique (run :func:`latest_revisions` first on
    multi-revision crawls); ``digest`` is any per-row content hash
    (e.g. ``hash60(text)``) and must be NON-NULL — a NULL digest is
    indistinguishable from the row being absent on that side (coalesce
    NULL text to a sentinel before hashing).

    Plan shape: union-tag, ONE exchange — both sides project
    ``(key, digest, side)`` and a single groupBy(key) aggregation
    computes per-side digests with conditional max (map-side combined);
    no join, no second shuffle, and the diff status is a stateless
    projection of the agg output. The exchange carries fixed-width
    (key, hash, byte) rows, never the documents.
    """
    a = old.select(F.col(key), F.col(digest).alias("__d"),
                   F.lit(0).alias("__side"))
    b = new.select(F.col(key), F.col(digest).alias("__d"),
                   F.lit(1).alias("__side"))
    agg = a.unionByName(b).groupBy(key).agg(
        F.max(F.when(F.col("__side") == 0, F.col("__d"))).alias("old_digest"),
        F.max(F.when(F.col("__side") == 1, F.col("__d"))).alias("new_digest"),
    )
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return agg.select(key, status.alias("status"), "old_digest", "new_digest")


# href extraction regex: double-quoted hrefs only — crawl-extracted
# markup is normalized upstream; single-quoted/bare forms are a
# documented non-goal (swap the pattern in via the parameter).
_HREF_RE = r'href="([^"]*)"'


def extract_links(df: DataFrame, key: str = "url", html: str = "html",
                  href_re: str = _HREF_RE) -> DataFrame:
    """Outlink edges from raw page markup: one ``(key, link)`` row per
    href occurrence (document order, duplicates preserved — the caller
    decides whether multiplicity matters). ``html`` may be the raw
    ``binary`` crawl payload (cast to UTF-8 string in-plan) or an
    already-decoded string column.

    Plan shape: ``regexp_extract_all`` + ``explode`` inside the scan
    stage — zero shuffle, zero Python; output rows ≈ total hrefs, and
    the page bytes themselves never leave the scan projection (only the
    extracted link strings flow downstream).
    """
    c = F.col(html)
    s = c.cast("string")
    links = F.regexp_extract_all(s, F.lit(href_re), F.lit(1))
    return df.select(F.col(key), F.explode(links).alias("link"))


def host_graph(links: DataFrame, src_url: str = "url",
               link: str = "link", drop_self: bool = True) -> DataFrame:
    """Host-level link graph from :func:`extract_links` output:
    ``(src_host, dst_host, n_links)`` — the edge list
    :func:`pagerank` and per-domain crawl-budget policies consume.

    ``drop_self`` removes same-host edges (intra-site navigation, which
    otherwise dominates every crawl graph). Links whose host does not
    parse (relative hrefs, fragments) are dropped — host-graph edges
    need two resolvable endpoints.

    Plan shape: host parsing is scan-stage regex on both endpoints; ONE
    hash aggregation whose exchange carries (host-pair, partial count)
    rows — O(distinct host pairs), never O(links). Hub hosts skew the
    GROUPS' sizes, not the exchange (counts partial-aggregate map-side).
    """
    src_h = host_col(F.col(src_url))
    dst_h = host_col(F.col(link))
    edges = links.select(src_h.alias("src_host"), dst_h.alias("dst_host"))
    edges = edges.where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_self:
        edges = edges.where(F.col("src_host") != F.col("dst_host"))
    return edges.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"))


def revision_intervals(df: DataFrame, key: str = "url",
                       ts: str = "fetched_at",
                       digest: str = "content_digest") -> DataFrame:
    """SCD2-style content-version intervals per key: consecutive
    revisions with the same digest collapse into one row
    ``(key, version, digest, valid_from, valid_to, n_revisions)``,
    ``valid_to`` NULL for the currently-open version. This is the
    content-change ledger an incremental crawl keeps so "when did this
    page last change?" is an index lookup, not a scan.

    Digest comparison is null-safe: consecutive NULL digests belong to
    one version (a fetch that yielded no content is itself a state).
    Ties on ``ts`` within a key are broken by ``digest`` so the version
    numbering is deterministic.

    Plan shape: one key exchange shared by the lag window and the
    running-sum window (same partitioning + ordering — Spark plans ONE
    sort), a (key, version) aggregation, and a final lead window back on
    the key partitioning for ``valid_to``. Every exchange carries
    fixed-width (key, ts, digest) rows; per-key cost is the key's own
    revision count.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts, digest)
    prev = F.lag(digest).over(w)
    # the first row of a key always opens version 1 — lag() returns NULL
    # both for "no previous row" and "previous digest was NULL", so the
    # null-safe compare alone would number NULL-first keys from 0
    first = F.row_number().over(w) == 1
    chg = F.when(first, F.lit(1)) \
           .when(F.col(digest).eqNullSafe(prev), F.lit(0)) \
           .otherwise(F.lit(1))
    # two selects: window functions cannot nest in one projection; the
    # partitioning + ordering are identical so Spark plans ONE sort
    marked = df.select(F.col(key), F.col(ts), F.col(digest),
                       chg.alias("__chg"))
    staged = marked.select(
        F.col(key), F.col(ts), F.col(digest),
        F.sum("__chg").over(w).alias("version"))
    agg = staged.groupBy(key, "version").agg(
        F.min(ts).alias("valid_from"),
        F.max(digest).alias("digest"),  # constant within a version
        F.count(F.lit(1)).alias("n_revisions"))
    w2 = Window.partitionBy(key).orderBy("version")
    return agg.select(
        key, "version", "digest", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"), "n_revisions")


def parse_robots(df: DataFrame, host: str = "host",
                 body: str = "robots_txt") -> DataFrame:
    """Parse per-host robots.txt bodies into a rules table:
    ``(host, agent, directive 'allow'|'disallow', path_prefix)`` — one
    row per (user-agent, rule) pair, the broadcastable input of
    :func:`robots_verdicts`.

    Implements the original REP subset (documented simplifications):
    ``#`` comments stripped, field names case-insensitive, consecutive
    ``User-agent`` lines share the rules that follow (a rule belongs to
    the nearest preceding user-agent block; blank/other lines do not
    close a block), agents lowercased, empty-path rules dropped (RFC
    9309: an empty pattern matches nothing). ``*``/``$`` wildcards are
    kept verbatim in ``path_prefix`` — :func:`robots_verdicts` compiles
    them to anchored regexes per RFC 9309 §2.2.3.

    Plan shape: line split + classification are scan-stage; block
    assignment is a lag + running-sum pair over ONE per-host sort
    (robots bodies are small — the window partition is a file's own
    lines); the ua×rules join is per-(host, block) equi-join that AQE
    broadcasts at real sizes. Everything is O(robots corpus), which is
    O(hosts) — negligible next to the page corpus.
    """
    from pyspark.sql.window import Window

    lines = F.posexplode(F.split(F.col(body), "\n"))
    raw = df.select(F.col(host).alias("host"), lines.alias("pos", "line"))
    t = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    lt = F.lower(t)
    ty = (
        F.when(lt.startswith("user-agent:"), F.lit("ua"))
        .when(lt.startswith("allow:"), F.lit("allow"))
        .when(lt.startswith("disallow:"), F.lit("disallow"))
        .otherwise(F.lit("other"))
    )
    classified = raw.select("host", "pos", t.alias("t"), ty.alias("ty"))
    w = Window.partitionBy("host").orderBy("pos")
    st = F.when(
        (F.col("ty") == "ua")
        & (F.coalesce(F.lag("ty").over(w), F.lit("x")) != "ua"),
        F.lit(1)).otherwise(F.lit(0))
    marked = classified.select("host", "pos", "t", "ty", st.alias("__st"))
    grouped = marked.select(
        "host", "pos", "t", "ty",
        F.sum("__st").over(w).alias("grp"))
    value = F.trim(F.regexp_extract(F.col("t"), "^[^:]*:(.*)$", 1))
    ua = grouped.where(F.col("ty") == "ua").select(
        "host", "grp", F.lower(value).alias("agent"))
    rules = grouped.where(F.col("ty").isin("allow", "disallow")) \
        .where(value != "") \
        .select("host", "grp", F.col("ty").alias("directive"),
                value.alias("path_prefix"))
    return ua.join(rules, ["host", "grp"]).select(
        "host", "agent", "directive", "path_prefix")


def robots_verdicts(df: DataFrame, rules: DataFrame, key: str = "url",
                    url: str = "url", agent: str = "*") -> DataFrame:
    """Robots-exclusion verdict per page:
    ``(key, robots_blocked, matched_directive, matched_prefix)`` for
    EVERY input row — the crawl-politeness filter a Common-Crawl-style
    pipeline applies before anything else touches a page.

    Group selection follows REP: if a host has any rules for exactly
    ``agent`` (lowercased), ONLY those apply; otherwise the host's
    ``*`` rules apply; a host with neither allows everything. Among
    matching rules the LONGEST rule pattern wins (RFC 9309 "most
    octets", counted on the pattern as written, wildcards included); on
    a length tie, allow wins (the Google tie-break). No matching rule =
    allowed. Rules match against the PATH + QUERY of the URL (fragment
    excluded) — RFC 9309 §2.2.2 / the Google matcher, which is what
    makes ``Disallow: /*?sessionid=`` rules work. An empty URL path
    (``https://example.com``) is ``/`` per RFC 3986 §6.2.3 — so
    ``Disallow: /`` blocks root pages.

    Wildcards (RFC 9309 §2.2.3): ``*`` in a rule matches any character
    run (including ``/``); a trailing ``$`` anchors the rule at the end
    of the path; a non-trailing ``$`` is a literal (the de-facto
    interpretation of Google's matcher). Each wildcard rule compiles —
    NATIVELY, inside the broadcast-side projection — to an anchored
    Java regex (literals escaped, ``*``→``.*``), matched with
    ``regexp_like``; wildcard-FREE rules (the overwhelming majority of
    real robots lines) keep the cheap ``startswith`` path, so the
    per-row regex compile only runs for rules that need it.

    Plan shape: the rules table is O(hosts) and enters via a broadcast
    equi-join on host (hinted); the page↔rule fan-out is each page's
    applicable-rule count, filtered to prefix matches in the same
    stage; ONE key aggregation (max over a (prefix-length, is-allow,
    directive, prefix) struct — map-side combined) picks the winning
    rule, and a left join re-attaches no-rule pages. The corpus rows
    cross exactly that one aggregation exchange and the final key join.
    """
    raw_path = F.regexp_extract(
        F.col(url), r"^(?i)[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    pages = df.select(
        F.col(key).alias("__k"),
        F.lower(F.regexp_extract(
            F.col(url), r"^(?i)[a-z][a-z0-9+.-]*://([^/?#:]+)", 1))
        .alias("host"),
        # empty path -> '/', and a bare '?query' gets the implicit '/'
        F.when(raw_path.startswith("/"), raw_path)
        .otherwise(F.concat(F.lit("/"), raw_path))
        .alias("__path"))
    a = agent.lower()
    scoped = rules.select(
        F.col("host"), F.lower(F.col("agent")).alias("agent"),
        "directive", "path_prefix")
    # per-host REP group selection: exact-agent rules if any, else '*'
    specific_hosts = scoped.where(F.col("agent") == a) \
        .select("host").distinct()
    applicable = (
        scoped.where(F.col("agent").isin(a, "*"))
        .join(F.broadcast(specific_hosts.withColumnRenamed("host", "__sh")),
              F.col("host") == F.col("__sh"), "left")
        .where((F.col("agent") == a) |
               (F.col("__sh").isNull() & (F.col("agent") == "*")))
        .select("host", "directive", "path_prefix")
    )
    # RFC 9309 §2.2.3 wildcard compile (broadcast side, O(rules) rows):
    # a trailing '$' anchors; every Java-regex special in the remaining
    # pattern is escaped EXCEPT '*', which then becomes '.*'
    p = F.col("path_prefix")
    anchored = p.endswith("$")
    body = F.when(anchored, F.substring(p, 1, F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([\\^$.|?+()\[\]{}])", r"\\$1")
    rx = F.concat(F.lit("^"), F.regexp_replace(esc, r"\*", ".*"),
                  F.when(anchored, F.lit("$")).otherwise(F.lit("")))
    wild = p.contains("*") | anchored
    applicable = applicable.select(
        "host", "directive", "path_prefix", wild.alias("__wild"),
        F.when(wild, rx).alias("__rx"))
    matched = F.when(F.col("__wild"),
                     F.regexp_like(F.col("__path"), F.col("__rx"))) \
               .otherwise(F.col("__path").startswith(F.col("path_prefix")))
    hits = (
        pages.join(F.broadcast(applicable), "host")
        .where(matched)
        .groupBy("__k")
        .agg(F.max(F.struct(
            F.length("path_prefix").alias("l"),
            (F.col("directive") == "allow").alias("is_allow"),
            F.col("directive").alias("directive"),
            F.col("path_prefix").alias("prefix"))).alias("__win"))
    )
    out = df.select(F.col(key).alias("__k")).join(hits, "__k", "left")
    return out.select(
        F.col("__k").alias(key),
        F.coalesce(F.col("__win.directive") == "disallow", F.lit(False))
        .alias("robots_blocked"),
        F.col("__win.directive").alias("matched_directive"),
        F.col("__win.prefix").alias("matched_prefix"))


def host_mirrors(df: DataFrame, url: str = "url",
                 digest: Column | str = "content_digest",
                 min_shared: int = 3,
                 max_hosts_per_digest: int | None = 16) -> DataFrame:
    """Mirror-site detection: host pairs that serve the same content —
    ``(host_a, host_b, shared_digests)`` for pairs sharing at least
    ``min_shared`` distinct content digests (``host_a < host_b``). The
    dedup planner's host-level view: a mirrored site is cheaper to drop
    at the HOST level than to near-dup every page pair.

    ``digest`` is a per-row content hash column or Column expression
    (e.g. ``hashing.hash60(text)``); NULL digests are ignored.
    ``max_hosts_per_digest`` is the boilerplate guard (same contract as
    the LSH ``_bucket_pairs`` cap): a digest served by hundreds of
    hosts is boilerplate (empty pages, soft-404s), not mirroring —
    unbounded it would explode quadratically. Pass None to disable.

    Plan shape: one (digest, host) distinct-style aggregation (map-side
    combined — the corpus collapses to its distinct digest-host pairs
    before the exchange), capped in-bucket pair explode (reuses the
    LSH machinery), then ONE (host_a, host_b) count agg. No corpus
    row ever crosses more than the first fixed-width exchange.
    """
    from themis_spark.operators.dedup import _bucket_pairs

    d = F.col(digest) if isinstance(digest, str) else digest
    host = F.lower(F.regexp_extract(
        F.col(url), r"^(?i)[a-z][a-z0-9+.-]*://([^/?#:]+)", 1))
    pairs = _bucket_pairs(
        df.where(d.isNotNull())
          .select(d.alias("__digest"), host.alias("__host"))
          .where(F.col("__host") != ""),
        ["__digest"], F.col("__host"), max_hosts_per_digest)
    return (
        pairs.groupBy(F.col("a").alias("host_a"), F.col("b").alias("host_b"))
        .agg(F.count(F.lit(1)).alias("shared_digests"))
        .where(F.col("shared_digests") >= min_shared)
    )


# ------------------------------------------------- crawl infrastructure

def robots_directives(df: DataFrame, host: str = "host",
                      body: str = "robots_txt") -> DataFrame:
    """Non-rule robots.txt directives: ``(host, agent, directive,
    value)`` with directive ∈ {'sitemap', 'crawl-delay'}.

    ``Sitemap:`` is agent-independent per RFC 9309 §2.3 / the sitemaps
    protocol — its rows carry agent ``'*'`` regardless of position.
    ``Crawl-delay`` (the de-facto extension honored by most crawlers,
    never standardized) binds to the nearest preceding user-agent
    block, exactly like allow/disallow in :func:`parse_robots`.

    Plan shape mirrors parse_robots: scan-stage line classification,
    one per-host window pair for block assignment, per-(host, block)
    equi-join of agents × delay rules. Sitemap rows skip the block
    machinery entirely (pure scan-stage filter). O(robots corpus).
    """
    from pyspark.sql.window import Window

    lines = F.posexplode(F.split(F.col(body), "\n"))
    raw = df.select(F.col(host).alias("host"), lines.alias("pos", "line"))
    t = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    lt = F.lower(t)
    value = F.trim(F.regexp_extract(F.col("t"), "^[^:]*:(.*)$", 1))

    sitemaps = (
        raw.select("host", t.alias("t"), lt.alias("lt"))
        .where(F.col("lt").startswith("sitemap:"))
        .select("host", F.lit("*").alias("agent"),
                F.lit("sitemap").alias("directive"),
                F.trim(F.regexp_extract("t", "^[^:]*:(.*)$", 1))
                .alias("value"))
        .where(F.col("value") != "")
    )

    ty = (
        F.when(lt.startswith("user-agent:"), F.lit("ua"))
        .when(lt.startswith("crawl-delay:"), F.lit("delay"))
        .otherwise(F.lit("other"))
    )
    classified = raw.select("host", "pos", t.alias("t"), ty.alias("ty"))
    w = Window.partitionBy("host").orderBy("pos")
    st = F.when(
        (F.col("ty") == "ua")
        & (F.coalesce(F.lag("ty").over(w), F.lit("x")) != "ua"),
        F.lit(1)).otherwise(F.lit(0))
    grouped = classified.select(
        "host", "pos", "t", "ty", st.alias("__st")) \
        .select("host", "pos", "t", "ty",
                F.sum("__st").over(w).alias("grp"))
    ua = grouped.where(F.col("ty") == "ua").select(
        "host", "grp", F.lower(value).alias("agent"))
    delays = grouped.where(F.col("ty") == "delay") \
        .where(value != "") \
        .select("host", "grp", F.lit("crawl-delay").alias("directive"),
                value.alias("value"))
    bound = ua.join(delays, ["host", "grp"]).select(
        "host", "agent", "directive", "value")
    return sitemaps.unionByName(bound)


_SITEMAP_BLOCK_RE = r"(?is)<(url|sitemap)>(.*?)</\1>"


def parse_sitemaps(df: DataFrame, host: str = "host",
                   xml: str = "sitemap_xml") -> DataFrame:
    """Parse sitemap / sitemap-index XML bodies into ``(host, kind,
    loc, lastmod)`` rows — kind ``'url'`` for page entries,
    ``'sitemap'`` for index entries pointing at child sitemaps (the
    crawler recurses on those). ``lastmod`` is the raw string (W3C
    datetime, many real-world shapes) or NULL when absent.

    Plan shape: one regexp_extract_all over the XML body pulls the
    <url>/<sitemap> blocks, per-block loc/lastmod extraction runs
    inside the same scan-stage transform, and the explode emits only
    the parsed rows — the XML bytes never leave the scan projection.
    Entries without a <loc> are dropped (spec: loc is required).
    """
    s = F.col(xml).cast("string")
    blocks = F.regexp_extract_all(s, F.lit(_SITEMAP_BLOCK_RE), F.lit(0))
    parsed = F.transform(blocks, lambda b: F.struct(
        F.lower(F.regexp_extract(b, r"(?is)^<(url|sitemap)>", 1))
        .alias("kind"),
        F.trim(F.regexp_extract(b, r"(?is)<loc>\s*([^<]*?)\s*</loc>", 1))
        .alias("loc"),
        F.trim(F.regexp_extract(
            b, r"(?is)<lastmod>\s*([^<]*?)\s*</lastmod>", 1))
        .alias("lastmod"),
    ))
    out = df.select(F.col(host).alias("host"),
                    F.explode(parsed).alias("e"))
    return out.select(
        "host", F.col("e.kind").alias("kind"), F.col("e.loc").alias("loc"),
        F.when(F.col("e.lastmod") == "", F.lit(None))
        .otherwise(F.col("e.lastmod")).alias("lastmod"),
    ).where(F.col("loc") != "")


_ANCHOR_RE = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def extract_anchors(df: DataFrame, key: str = "url",
                    html: str = "html") -> DataFrame:
    """Outlinks WITH their anchor text: ``(key, link, anchor)`` — one
    row per <a href> element; ``anchor`` is the element's inner text
    with nested tags stripped and whitespace collapsed (may be empty:
    image links). The input of :func:`anchor_text_index`.

    Plan shape: regexp_extract_all of whole <a> elements + per-element
    href/inner-text extraction inside one scan-stage transform; the
    page bytes never cross an exchange. Anchor text is the classic
    web-scale training signal (it describes the TARGET page), so rows
    flow keyed by link downstream.
    """
    s = F.col(html).cast("string")
    elems = F.regexp_extract_all(s, F.lit(_ANCHOR_RE), F.lit(0))
    parsed = F.transform(elems, lambda e: F.struct(
        F.regexp_extract(e, r'(?is)href="([^"]*)"', 1).alias("link"),
        F.trim(F.regexp_replace(F.regexp_replace(
            F.regexp_extract(e, r"(?is)>(.*)</a>$", 1),
            r"(?s)<[^>]*>", " "), r"\s+", " ")).alias("anchor"),
    ))
    return (
        df.select(F.col(key), F.explode(parsed).alias("e"))
        .select(F.col(key), F.col("e.link").alias("link"),
                F.col("e.anchor").alias("anchor"))
        .where(F.col("link") != "")
    )


def anchor_text_index(anchors: DataFrame, link: str = "link",
                      anchor: str = "anchor", k: int = 5) -> DataFrame:
    """Aggregated anchor-text index: for each link target, the top-k
    distinct anchor strings by frequency — ``(link, anchor, n, rank)``.
    This is how web corpora synthesize target-page descriptions
    (anchor-text corpus construction). Empty anchors are dropped.

    Plan shape: ONE (link, anchor) count aggregation (map-side
    combined), then a per-link rank window that WindowGroupLimit
    prunes to k per task before the per-link exchange. Output is
    O(targets × k), never O(anchor occurrences).
    """
    from pyspark.sql.window import Window

    counted = (
        anchors.where(F.col(anchor) != "")
        .groupBy(link, anchor).agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(link).orderBy(F.desc("n"), F.asc(anchor))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hits(edges: DataFrame, iters: int = 2, src: str = "src",
         dst: str = "dst") -> DataFrame:
    """HITS hubs & authorities (Kleinberg) over a link graph, integer
    form: starting from hub=1 on every node, each iteration computes
    ``auth(v) = Σ_{(u,v)∈E} hub(u)`` then ``hub(u) = Σ_{(u,v)∈E}
    auth(v)``. Scores stay UNNORMALIZED integers — for ranking only
    relative order matters, iterations are few, and integer sums are
    exact under any partitioning (same design as :func:`pagerank`'s
    integer arithmetic), so the result replays bit-for-bit in the SQL
    oracle. Returns ``(node, hub, auth)`` — nodes with no in-links
    have auth 0, no out-links hub 0.

    Plan shape per iteration: edges ⋈ scores on src (broadcast when
    scores are small; sort-merge co-partitioned otherwise) → one
    groupBy(dst) agg, then the mirror pass. The edge list never
    crosses more than these keyed exchanges; nothing is quadratic.
    At web scale, run on the HOST graph (host_graph output) where
    nodes are 10⁷–10⁸, not on raw pages.
    """
    nodes = (edges.select(F.col(src).alias("node"))
             .union(edges.select(F.col(dst).alias("node")))
             .distinct())
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for i in range(iters):
        auth = (
            edges.join(hub.withColumnRenamed("node", src), src)
            .groupBy(dst).agg(F.sum("hub").alias("auth"))
            .withColumnRenamed(dst, "node")
        )
        if iters > 2 and i < iters - 1:
            # deep runs: cut the doubling lineage per round (the final
            # hub⋈auth select otherwise re-executes each level twice) —
            # same localCheckpoint pattern as dedup's label propagation
            auth = auth.localCheckpoint(eager=False)
        hub = (
            edges.join(auth.withColumnRenamed("node", dst), dst)
            .groupBy(src).agg(F.sum("auth").alias("hub"))
            .withColumnRenamed(src, "node")
        )
    return (
        nodes.join(hub, "node", "left").join(auth, "node", "left")
        .select("node",
                F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
                F.coalesce("auth", F.lit(0)).cast("long").alias("auth"))
    )


def crawl_budgets(ranks: DataFrame, delays: DataFrame | None = None,
                  host: str = "host", rank: str = "rank",
                  delay: str = "crawl_delay",
                  horizon_s: int = 86400, default_delay: float = 1.0,
                  max_budget: int = 100_000,
                  total_budget: int | None = None) -> DataFrame:
    """Per-host fetch budget for one politeness horizon:
    ``(host, politeness_cap, share, budget)``.

    * ``politeness_cap = floor(horizon_s / crawl_delay)`` — the hard
      REP bound (one fetch per delay); hosts absent from ``delays``
      use ``default_delay``.
    * ``share`` — when ``total_budget`` is set, the host's
      rank-proportional allocation ``floor(total_budget · rank / Σrank)``
      (integer arithmetic over the integer PageRank/HITS scores this
      module produces — exact in both engines); otherwise unlimited.
    * ``budget = least(politeness_cap, share, max_budget)``.

    Plan shape: delays join is per-host (broadcast at real sizes — the
    frame is O(hosts with robots files)); Σrank is a ONE-ROW broadcast
    agg; everything else is scan-stage arithmetic. O(hosts) end to end
    — this operator never touches the page corpus.
    """
    r = ranks.select(F.col(host).alias("host"),
                     F.col(rank).cast("long").alias("__rank"))
    if delays is not None:
        d = delays.select(F.col(host).alias("host"),
                          F.col(delay).cast("double").alias("__delay"))
        r = r.join(F.broadcast(d), "host", "left")
    else:
        r = r.withColumn("__delay", F.lit(None).cast("double"))
    eff_delay = F.greatest(
        F.coalesce(F.col("__delay"), F.lit(float(default_delay))),
        F.lit(1e-3))
    cap = F.floor(F.lit(float(horizon_s)) / eff_delay).cast("long")
    r = r.withColumn("politeness_cap", cap)
    if total_budget is not None:
        tot = r.agg(F.sum("__rank").alias("__tot"))
        r = r.join(F.broadcast(tot))
        # integer floor of (total·rank)/Σrank in long arithmetic (DIV),
        # no double rounding — exact in both engines
        r = r.withColumn(
            "share",
            F.expr(f"CAST({int(total_budget)} AS BIGINT) * __rank"
                   " DIV __tot"))
    else:
        r = r.withColumn("share", F.lit(None).cast("long"))
    budget = F.least(
        F.col("politeness_cap"),
        F.coalesce(F.col("share"), F.col("politeness_cap")),
        F.lit(int(max_budget)))
    return r.select("host", "politeness_cap", "share",
                    budget.alias("budget"))


def crawl_frontier(pages: DataFrame, budgets: DataFrame,
                   url: str = "url", host_out: str = "host",
                   priority: str = "priority") -> DataFrame:
    """Prioritized crawl frontier under per-host budgets: for each
    host, the top-``budget`` URLs by priority — ``(host, url,
    priority, rank)`` with rank 1..budget.

    The variable per-host k comes from joining ``budgets`` (O(hosts),
    broadcast) before the rank filter; the ranking window is
    WindowGroupLimit-prunable only for constant k, so the budget cap
    is applied as a post-window filter — the exchange still carries
    one row per candidate page, which is the frontier input, not the
    corpus (callers pre-filter to uncrawled/stale candidates).
    Ties break on url ascending for determinism.
    """
    from pyspark.sql.window import Window

    h = host_col(F.col(url)).alias(host_out)
    w = Window.partitionBy(host_out).orderBy(
        F.col(priority).desc(), F.col(url).asc())
    ranked = (
        pages.select(h, F.col(url), F.col(priority))
        .withColumn("rank", F.row_number().over(w))
    )
    b = budgets.select(F.col("host").alias(host_out),
                       F.col("budget"))
    return (
        ranked.join(F.broadcast(b), host_out)
        .where(F.col("rank") <= F.col("budget"))
        .select(host_out, url, priority, "rank")
    )


# --------------------------------------------------- URL template mining
#
# Crawl-structure discovery: collapse volatile id segments out of URL
# paths ("/item/8823491/review" -> "/item/{n}/review") and profile the
# surviving templates per host — which page GENERATORS a site has, how
# many instances each has, and where crawl budget actually went.
# Variable-segment rules (applied in this order, each one native
# regexp_replace, RE2-portable for the oracle): long hex runs (ids,
# hashes) -> {h}, digit runs -> {n}, uuid-ish dash-hex handled by the
# hex rule per segment.


def url_templates(df, url: str = "url", min_count: int = 1):
    """(host, template, n_urls, n_distinct, example) per (host,
    collapsed-path template). ``example`` = min(url) — deterministic.
    One scan-stage projection then a partial-combined aggregation; the
    exchange carries one row per (host, template)."""
    u = F.col(url)
    host = F.parse_url(u, F.lit("HOST"))
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("/"))
    t = F.regexp_replace(path, "[0-9a-fA-F]{8,}", "{h}")
    t = F.regexp_replace(t, "[0-9]+", "{n}")
    return (
        df.where(u.isNotNull())
        .select(host.alias("host"), t.alias("template"), u.alias("__u"))
        .where(F.col("host").isNotNull())
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.countDistinct("__u").alias("n_distinct"),
             F.min("__u").alias("example"))
        .where(F.col("n_urls") >= min_count)
    )
