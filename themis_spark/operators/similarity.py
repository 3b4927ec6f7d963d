"""Similarity search over embedding columns (``array<float>``).

Two paths:

* brute-force cosine top-k — the correctness baseline: broadcast the
  query set, native ``zip_with``/``aggregate`` dot products (JVM-side,
  no Python), window rank per query. Exact; cost O(|Q|·|corpus|), fine
  when |Q| is small or as the final re-rank.
* LSH-bucketed ANN — the scale path: sign-of-projection onto fixed
  random hyperplanes (seeded, generated driver-side, shipped as
  literals) buckets the corpus; queries probe only their bucket. At
  10¹² rows the bucket join is an equi-join on a 16–32-bit code and the
  per-bucket re-rank is the brute-force kernel above.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a: Column, b: Column) -> Column:
    """Native dot product of two float-array columns (zip_with + aggregate
    — whole-stage codegen, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbours per query: (query_key, neighbor_key, cosine,
    rank). Queries are broadcast — the corpus never shuffles."""
    # norms are hoisted to one-per-row columns: cosine_col inline would
    # recompute BOTH norms per (query, corpus) candidate — O(pairs·dim)
    # HOF work for values that are per-row constants. Same expression
    # (dot / (n_q · n_c)), same evaluation order → bit-identical cosines.
    q = F.broadcast(
        queries.select(F.col(key).alias("query_key"), F.col(vec).alias("q_vec"),
                       norm_col(F.col(vec)).alias("__qn"))
    )
    c = corpus.select(F.col(key).alias("neighbor_key"), F.col(vec).alias("c_vec"),
                      norm_col(F.col(vec)).alias("__cn"))
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_key") != F.col("query_key"))
        .select(
            "query_key",
            "neighbor_key",
            F.round(dot_col(F.col("q_vec"), F.col("c_vec"))
                    / (F.col("__qn") * F.col("__cn")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_key").orderBy(
        F.col("cosine").desc(), F.col("neighbor_key").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _embedding_dim(df: DataFrame, vec: str, dim: int | None) -> int:
    """Resolve the embedding dimensionality for hyperplane generation.

    Pass ``dim`` explicitly in production plans — the fallback probe is a
    driver-side one-row job DURING plan construction (round-1 verdict
    item 3: fine interactively, an extra job per call in pipelines).
    ArrayType carries no length, so the schema alone cannot answer."""
    if dim is not None:
        return dim
    row = df.select(F.size(F.col(vec)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError(f"cannot infer dim of empty {vec!r}; pass dim=")
    return int(row[0]["d"])


def lsh_code_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH code: bit i = sign(vec · plane_i). Planes are
    compile-time literals — pure codegen, no shuffle, deterministic."""
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        # single array literal per plane — see _centroid_lits on why
        proj = dot_col(vec, F.lit([float(x) for x in p]))
        code = code + F.shiftleft((proj > 0).cast("long"), i)
    return code


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    n_probes: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket the corpus by LSH code; each query
    multi-probes its own bucket plus every hamming-1 neighbour bucket
    (probing is on the tiny broadcast query side — the corpus is coded
    once and never duplicated). Exact cosine re-ranks inside buckets."""
    dim = _embedding_dim(corpus, vec, dim)
    planes = _hyperplanes(dim, n_planes, seed)
    if n_probes is None:
        n_probes = n_planes  # all hamming-1 flips
    c = corpus.select(
        F.col(key).alias("neighbor_key"), F.col(vec).alias("c_vec"),
        lsh_code_col(F.col(vec), planes).alias("code"),
        norm_col(F.col(vec)).alias("__cn"),
    )
    base = lsh_code_col(F.col(vec), planes)
    probe_codes = F.array(base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_probes)])
    q = F.broadcast(
        queries.select(
            F.col(key).alias("query_key"), F.col(vec).alias("q_vec"),
            norm_col(F.col(vec)).alias("__qn"),
            F.explode(probe_codes).alias("code"),
        )
    )
    scored = (
        # norms hoisted per row (see cosine_topk) — bit-identical cosines
        c.join(q, "code")
        .where(F.col("neighbor_key") != F.col("query_key"))
        .select("query_key", "neighbor_key",
                F.round(dot_col(F.col("q_vec"), F.col("c_vec"))
                        / (F.col("__qn") * F.col("__cn")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_key").orderBy(F.col("cosine").desc(), F.col("neighbor_key").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ----------------------------------------------------------------- IVF ANN
#
# Inverted-file index: a small set of coarse centroids partitions the
# corpus into cells; each query probes only its n_probe nearest cells.
# This is the classic scale path beside LSH bucketing: the corpus is
# coded ONCE (map-side, shuffle-free argmax over centroid literals), the
# candidate join is an equi-join on the cell id, and the exact cosine
# kernel re-ranks inside cells. Centroids are metadata (n_cells ≤ a few
# thousand rows), held driver-side and folded into codegen expressions —
# at 10¹² corpus rows the plan shape is unchanged.


def _matrix_lit(matrix: list[list[float]]) -> Column:
    """array<array<double>> literal via ONE SQL expression string.

    ``F.lit`` on a nested Python list goes through py4j per element
    (measured 6.7 s for a 256×64 matrix); a single ``F.expr`` string is
    one py4j call and one driver-side parse (~0.1 s). ``repr`` round-
    trips float64 exactly and Spark parses exponent-form literals as
    DOUBLE (plain decimals get the explicit D suffix)."""
    def d(x: float) -> str:
        s = repr(float(x))
        return s if ("e" in s or "E" in s) else s + "D"

    rows = ",".join("array(" + ",".join(d(x) for x in row) + ")" for row in matrix)
    return F.expr(f"array({rows})")


def _cell_sims_col(vec: Column, centroids: list[list[float]]) -> Column:
    """Array of cosine(vec, centroid_i), rounded to 6 dp so the argmax /
    top-n_probe ordering is replayable bit-for-bit by the SQL oracle
    (same rounding + first-on-tie rule on both engines).

    The centroid matrix ships as ONE nested-array literal and the sims
    come from a single ``transform`` lambda — expression size (and
    driver-side plan-build time) is CONSTANT in n_cells. The unrolled
    per-cell alternative (one 64-literal cosine tree per cell) measured
    3-4 s of py4j/analysis time at a tiny 16×64 index and grows
    linearly; this form stays ~0.1 s and scales to thousand-cell
    indexes. Cosine here is already higher-order-function territory
    (aggregate/zip_with), so nesting it in transform costs no codegen
    regression."""
    matrix = _matrix_lit(centroids)
    nv = norm_col(vec)
    return F.transform(matrix, lambda c: F.round(dot_col(vec, c) / (nv * norm_col(c)), 6))


def ivf_cell_col(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id (0-based; ties -> lowest cell id):
    array_position of the max over the rounded-sims array."""
    sims = _cell_sims_col(vec, centroids)
    return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")


def ivf_probe_cells_col(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """The n_probe nearest cell ids, best first (ties -> lowest cell id).
    array_sort over (-sim, cell) structs — native, deterministic."""
    sims = _cell_sims_col(vec, centroids)
    ranked = F.array_sort(F.transform(
        sims, lambda s, i: F.struct((-s).alias("ns"), i.cast("int").alias("cell"))))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cell"])


def collect_centroids(centroids_df: DataFrame, vec: str = "embedding",
                      key: str = "vec_id", max_cells: int = 4096) -> list[list[float]]:
    """Materialize a (small) centroid table driver-side, ordered by key
    for determinism. Centroids are index metadata, like the LSH
    hyperplanes — the guard keeps the codegen expression bounded."""
    rows = centroids_df.select(key, vec).orderBy(key).limit(max_cells + 1).collect()
    if len(rows) > max_cells:
        raise ValueError(f"centroid table exceeds max_cells={max_cells}")
    return [[float(x) for x in r[vec]] for r in rows]


def train_ivf_centroids(
    df: DataFrame, vec: str = "embedding", key: str = "vec_id",
    n_cells: int = 16, iters: int = 2,
) -> list[list[float]]:
    """Distributed Lloyd k-means for the coarse quantizer. Deterministic
    init (first n_cells rows by key); each iteration is one Spark job:
    assign (native argmax over current centroid literals) -> posexplode
    -> partial+final avg per (cell, dim) — the shuffle carries only
    n_cells x dim aggregate rows, never vectors. Empty cells keep their
    previous centroid. iters=0 returns the init (what the SQL oracle
    replays); iterated centroids are float-summation-order dependent and
    therefore for quality, not for oracle-exact plans."""
    init = df.select(key, vec).orderBy(key).limit(n_cells).collect()
    cents = [[float(x) for x in r[vec]] for r in init]
    for _ in range(iters):
        assigned = df.select(ivf_cell_col(F.col(vec), cents).alias("cell"),
                             F.posexplode(F.col(vec)).alias("pos", "v"))
        means = assigned.groupBy("cell", "pos").agg(F.avg("v").alias("m")).collect()
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = [
            [by_cell[c][p] for p in range(len(cents[c]))] if c in by_cell else cents[c]
            for c in range(len(cents))
        ]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 10,
    centroids: list[list[float]] | DataFrame | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: (query_key, neighbor_key, cosine, rank).
    The corpus is assigned to cells map-side; broadcast queries explode
    into their n_probe probe cells; candidates meet on an equi-join on
    the cell id and the exact cosine kernel re-ranks. Pass ``centroids``
    (a trained list or a small DataFrame) for production; defaults to
    deterministic init-only training on the corpus."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec, key, n_cells, iters=train_iters)
    elif isinstance(centroids, DataFrame):
        centroids = collect_centroids(centroids, vec, key)
    c = corpus.select(
        F.col(key).alias("neighbor_key"), F.col(vec).alias("c_vec"),
        ivf_cell_col(F.col(vec), centroids).alias("cell"),
        norm_col(F.col(vec)).alias("__cn"),
    )
    q = F.broadcast(
        queries.select(
            F.col(key).alias("query_key"), F.col(vec).alias("q_vec"),
            norm_col(F.col(vec)).alias("__qn"),
            F.explode(ivf_probe_cells_col(F.col(vec), centroids, n_probe)).alias("cell"),
        )
    )
    scored = (
        # norms hoisted per row (see cosine_topk) — bit-identical cosines
        c.join(q, "cell")
        .where(F.col("neighbor_key") != F.col("query_key"))
        .select("query_key", "neighbor_key",
                F.round(dot_col(F.col("q_vec"), F.col("c_vec"))
                        / (F.col("__qn") * F.col("__cn")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_key").orderBy(F.col("cosine").desc(), F.col("neighbor_key").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame, vec: str = "embedding", key: str = "vec_id",
    threshold: float = 0.95, n_planes: int = 8, seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH bucketing + exact verify
    (the all-pairs version of lsh_ann_topk). One side multi-probes its
    hamming-1 neighbour buckets so near-identical vectors that straddle a
    hyperplane still meet; the other side stays single-coded, so the join
    fan-out is (n_planes+1)×, not (n_planes+1)²."""
    dim = _embedding_dim(df, vec, dim)
    planes = _hyperplanes(dim, n_planes, seed)
    base = lsh_code_col(F.col(vec), planes)
    probes = F.array(base, *[base.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)])
    nrm = norm_col(F.col(vec)).alias("__n")  # hoisted per row, see cosine_topk
    a = df.select(F.col(key), F.col(vec), nrm, F.explode(probes).alias("code")).alias("a")
    b = df.select(F.col(key), F.col(vec), nrm, base.alias("code")).alias("b")
    return (
        # no pair dedup needed: a's probe codes are distinct, so at most
        # one of them can equal b's single code
        a.join(b, (F.col("a.code") == F.col("b.code")) & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(
            F.col(f"a.{key}").alias("a_key"), F.col(f"b.{key}").alias("b_key"),
            F.round(dot_col(F.col(f"a.{vec}"), F.col(f"b.{vec}"))
                    / (F.col("a.__n") * F.col("b.__n")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ------------------------------------------------------ semantic dedup
#
# SemDeDup-style (Abbas et al. 2023, arXiv:2303.09540 — public paper):
# cluster the corpus with a coarse quantizer, then deduplicate INSIDE
# each cluster by exact cosine. Near-identical meaning concentrates in
# one cell, so the quadratic work is per-cell, never corpus-wide: the
# only exchange is the equi-join/groupBy on the cell id, and oversized
# cells (a degenerate quantizer region) are skipped loudly rather than
# allowed to explode quadratically — the same guard contract as the
# LSH band buckets (dedup._bucket_pairs).


def semantic_duplicates(
    df: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    centroids: list[list[float]] | DataFrame | None = None,
    threshold: float = 0.98,
    n_cells: int = 16,
    max_cell: int | None = 256,
) -> DataFrame:
    """Within-cell cosine near-dup pairs: ``(a_key, b_key, cell, cosine)``
    with strict a < b and cosine >= threshold.

    The corpus is coded map-side (argmax over centroid literals — no
    shuffle); the pair join is a self-equi-join on the cell id. Cells
    larger than ``max_cell`` (default ON at 256, the same default-on
    guard contract as ``dedup._bucket_pairs``: one degenerate quantizer
    region must not explode quadratically because a caller forgot a
    kwarg) are dropped before the join — at 10¹² rows route them to
    exact/LSH dedup instead; audit what was dropped with
    :func:`oversized_cells` on the same inputs. ``max_cell=None``
    disables the guard explicitly."""
    if centroids is None:
        centroids = train_ivf_centroids(df, vec, key, n_cells, iters=0)
    elif isinstance(centroids, DataFrame):
        centroids = collect_centroids(centroids, vec, key)
    # hoist the norm map-side: cosine_col would recompute BOTH norms per
    # PAIR (O(pairs·dim) extra HOF work — measured 3× on the sf0.1
    # bench); computing them once per row keeps the pair kernel at one
    # dot product. Same expression, same evaluation order → the rounded
    # cosine is bit-identical to cosine_col's.
    coded = df.select(
        F.col(key), F.col(vec),
        ivf_cell_col(F.col(vec), centroids).alias("cell"),
        norm_col(F.col(vec)).alias("__norm"),
    )
    # pin the pair join's parallelism to one-task-per-cell: the coded
    # frame is tiny in BYTES (AQE would coalesce its exchange to one
    # partition) but the join OUTPUT is quadratic per cell — exactly the
    # case AQE's size-based coalescing mispredicts. A user-specified
    # repartition is exempt from coalescing, so each cell's quadratic
    # work lands on its own task.
    coded = coded.repartition(max(len(centroids), 1), "cell")
    if max_cell is not None:
        # cap enforcement RIDES the repartition exchange: a per-cell
        # window count (partitionBy=cell aligns with the repartition,
        # so only a within-partition sort is added) instead of a
        # separate groupBy — the r3 form re-ran the whole coding pass
        # (scan + per-row centroid argmax) a second time just to count
        # cells, which benched 1.56× slower at sf0.1
        from pyspark.sql.window import Window

        wc = F.count(F.lit(1)).over(Window.partitionBy("cell"))
        coded = coded.withColumn("__csz", wc) \
                     .where(F.col("__csz") <= max_cell).drop("__csz")
    a, b = coded.alias("a"), coded.alias("b")
    cos = dot_col(F.col(f"a.{vec}"), F.col(f"b.{vec}")) / (
        F.col("a.__norm") * F.col("b.__norm"))
    return (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col(f"a.{key}") < F.col(f"b.{key}")))
        .select(
            F.col(f"a.{key}").alias("a_key"),
            F.col(f"b.{key}").alias("b_key"),
            F.col("a.cell").alias("cell"),
            F.round(cos, 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semdedup_keep(
    df: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    centroids: list[list[float]] | DataFrame | None = None,
    threshold: float = 0.98,
    n_cells: int = 16,
    max_cell: int | None = 256,
) -> DataFrame:
    """Per-row keep/drop decision ``(key, keep)``: a row is dropped when
    some LOWER-keyed row in its cell sits within the cosine threshold
    (the deterministic keep-lowest rule; replays identically on re-runs
    and in the SQL oracle). Note the rule is GREEDY, not component-wise:
    under a transitive chain (a~b, b~c, a≁c) both b and c drop even
    though c's only within-threshold neighbour b did not survive —
    standard SemDeDup behavior (it removes aggressively inside a
    semantic cluster). Pipe :func:`semantic_duplicates` through
    ``dedup.duplicate_clusters`` instead when you need exactly one
    survivor per CONNECTED component with a valid representative
    mapping. The drop set is the distinct b-side of
    :func:`semantic_duplicates`; corpus rows never shuffle for the
    verdict join when the drop set is small enough to broadcast."""
    pairs = semantic_duplicates(df, vec, key, centroids, threshold, n_cells, max_cell)
    drops = pairs.select(F.col("b_key").alias(key)).distinct()
    return (
        df.select(key)
        .join(drops.withColumn("__drop", F.lit(True)), key, "left")
        .select(key, F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"))
    )


def oversized_cells(
    df: DataFrame,
    vec: str = "embedding",
    centroids: list[list[float]] | DataFrame | None = None,
    n_cells: int = 16,
    max_cell: int = 256,
    key: str = "vec_id",
) -> DataFrame:
    """The cells :func:`semantic_duplicates` would DROP under its
    ``max_cell`` guard — ``(cell, n_vectors)`` for every cell above the
    cap, so a run can audit (and re-route to LSH/exact dedup) exactly
    what the quadratic-front guard excluded. Plan: the same map-side
    coding plus one count aggregation — the exchange carries one row
    per cell."""
    if centroids is None:
        centroids = train_ivf_centroids(df, vec, key, n_cells, iters=0)
    elif isinstance(centroids, DataFrame):
        centroids = collect_centroids(centroids, vec, key)
    return (
        df.select(ivf_cell_col(F.col(vec), centroids).alias("cell"))
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
        .where(F.col("n_vectors") > max_cell)
    )


# ------------------------------------------------------- embedding audit

def centroid_components(df: DataFrame, by: str = "label",
                        vec: str = "embedding",
                        round_to: int = 6) -> DataFrame:
    """Per-group centroid, one row per (group, dimension): ``(by, pos,
    m, n)`` — the element-wise mean and the group size. The audit /
    oracle-friendly flat form of :func:`group_centroids`.

    posexplode expands to rows×dim entries, but the aggregation on
    (group, pos) combines map-side, so the exchange carries only
    O(groups × dim) rows — for 10⁴ groups × 1k dims that's 10⁷ tiny
    rows regardless of corpus size. Means round to ``round_to`` so two
    engines' summation orders agree.
    """
    e = (
        df.where(F.col(by).isNotNull() & F.col(vec).isNotNull())
        .select(F.col(by), F.posexplode(F.col(vec)).alias("pos", "val"))
    )
    return e.groupBy(by, "pos").agg(
        F.round(F.avg("val"), round_to).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )


def group_centroids(df: DataFrame, by: str = "label",
                    vec: str = "embedding",
                    round_to: int = 6) -> DataFrame:
    """Per-group centroid as an array column: ``(by, centroid, n)``."""
    comp = centroid_components(df, by, vec, round_to)
    return comp.groupBy(by).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda s: s["m"],
        ).alias("centroid"),
        F.max("n").alias("n"),
    )


def centroid_cosine_stats(df: DataFrame, by: str = "label",
                          vec: str = "embedding",
                          round_to: int = 6) -> DataFrame:
    """Embedding-quality audit: per group, how tightly its vectors
    cluster around their own centroid — ``(by, n, mean_cos, min_cos)``.
    Collapsed clusters (duplicate embeddings) show mean_cos ≈ 1;
    polluted groups (mislabeled / corrupted vectors) drag min_cos down.

    The centroids frame is O(groups) and broadcasts; the corpus never
    shuffles for the join — the only exchanges are the centroid
    aggregation's O(groups×dim) and the final per-group stats.
    """
    cents = group_centroids(df, by, vec, round_to)
    cos6 = F.round(
        cosine_col(F.col(vec), F.col("centroid")), round_to)
    return (
        df.where(F.col(by).isNotNull() & F.col(vec).isNotNull())
        .join(F.broadcast(cents), by)
        .select(F.col(by), cos6.alias("__c"))
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__c"), round_to).alias("mean_cos"),
            F.min("__c").alias("min_cos"),
        )
    )


# --------------------------------------------------------- ANN evaluation

def recall_at_k(reference: DataFrame, candidate: DataFrame,
                k: int = 10, round_to: int = 6) -> DataFrame:
    """ANN quality evaluation: per-query recall@k of a candidate top-k
    frame against a reference (exact) top-k frame — ``(query_key, n_ref,
    n_hit, recall)``. The operational check behind every IVF/LSH
    parameter choice (n_cells, n_probe, n_planes): run the approximate
    index on a query SAMPLE, compare against brute-force on the same
    sample, tune until recall clears the target.

    Both inputs are the ``(query_key, neighbor_key, rank)`` shape that
    cosine_topk / lsh_ann_topk / ivf_topk emit. Rows with rank > k are
    ignored, so frames built at larger k can be evaluated at smaller k
    without recomputation. ``n_ref`` is min(k, reference neighbours) —
    recall is measured against what exact search actually found, so
    queries with < k real neighbours aren't penalized.

    Plan: two rank filters (scan-stage) → one equi-join on (query,
    neighbour) → per-query count aggregation. Everything is
    O(|queries|·k) — evaluation frames, never corpus-scale.
    """
    r = reference.where(F.col("rank") <= k).select(
        "query_key", "neighbor_key")
    c = candidate.where(F.col("rank") <= k).select(
        "query_key", "neighbor_key")
    hits = (r.join(c, ["query_key", "neighbor_key"])
            .groupBy("query_key").agg(F.count(F.lit(1)).alias("n_hit")))
    totals = r.groupBy("query_key").agg(F.count(F.lit(1)).alias("n_ref"))
    return (
        totals.join(hits, "query_key", "left")
        .select(
            "query_key", "n_ref",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0))
                    / F.col("n_ref"), round_to).alias("recall"),
        )
    )


# ------------------------------------------------ product quantization
#
# PQ (Jégou/Douze/Schmid 2011, "Product Quantization for Nearest
# Neighbor Search", IEEE TPAMI — public paper): split the d-dim vector
# into M subspaces, quantize each sub-vector to its nearest of K
# sub-centroids (L2), store M small codes per row. At rank time a query
# NEVER touches raw vectors: an M×K lookup table of query-to-centroid
# sub-dot-products is built once per query, and the approximate dot is
# M table lookups per candidate. That is the 10¹²-row point — the rank
# stage reads M bytes of codes (+ one stored norm) per row instead of
# d×4 bytes of floats; with M=8 over a 64-dim float corpus the scan is
# 32× lighter, and the codes column is what a 100 TB index
# materializes. Combined with the IVF coarse quantizer (ivfpq_topk)
# only n_probe cells of codes are read at all — the FAISS IVFADC
# layout, rebuilt from Spark relational primitives.
#
# Determinism/oracle contract (same conventions as the IVF family):
# codebooks default to init-only (first k rows by key, sub-sliced) so
# DuckDB re-derives the identical index from the table itself;
# assignment distance rounds to 6 dp with first-on-tie (lowest code);
# LUT entries are ROUNDED-AND-SCALED TO INTEGER micro-units (×10⁶ →
# long) so the M-term ADC sum is integer arithmetic — identical under
# ANY summation order, immune to the float-reassociation drift a
# cross-engine SUM would risk.


def train_pq_codebooks(
    df: DataFrame, vec: str = "embedding", key: str = "vec_id",
    n_sub: int = 8, k: int = 16, dim: int | None = None, iters: int = 0,
) -> list[list[list[float]]]:
    """``codebooks[m][code] = sub-centroid vector`` (n_sub × k × d/n_sub).

    Deterministic init: sub-slices of the first ``k`` rows by key —
    what the SQL oracle replays. ``iters`` > 0 runs distributed Lloyd
    refinement per subspace, ALL subspaces in one job per iteration:
    assign codes map-side (argmin over current codebook literals),
    posexplode the vector once, derive (subspace, code, sub-position)
    per element arithmetically, and average — the exchange carries
    O(n_sub·k·d/n_sub) = O(k·d) aggregate rows, never vectors. Empty
    codes keep their previous centroid. Iterated codebooks are
    float-summation-order dependent → for quality, not oracle-exact
    plans (train_ivf_centroids has the same contract)."""
    dim = _embedding_dim(df, vec, dim)
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d = dim // n_sub
    rows = df.select(key, vec).orderBy(key).limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"need {k} rows for codebook init, have {len(rows)}")
    cbs = [[[float(x) for x in r[vec][m * d:(m + 1) * d]] for r in rows]
           for m in range(n_sub)]
    for _ in range(iters):
        exploded = (
            df.select(pq_codes_col(F.col(vec), cbs).alias("codes"),
                      F.posexplode(F.col(vec)).alias("pos", "val"))
            .select(
                (F.col("pos") / d).cast("int").alias("m"),
                (F.col("pos") % d).alias("p"),
                F.get(F.col("codes"), (F.col("pos") / d).cast("int"))
                .alias("code"),
                "val",
            )
        )
        means = exploded.groupBy("m", "code", "p").agg(
            F.avg("val").alias("mu")).collect()
        by_mc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_mc.setdefault((r["m"], r["code"]), {})[r["p"]] = r["mu"]
        cbs = [
            [
                [by_mc[(m, c)][p] for p in range(d)]
                if (m, c) in by_mc else cbs[m][c]
                for c in range(k)
            ]
            for m in range(n_sub)
        ]
    return cbs


def _sub_sqdist_col(sub: Column, c: Column) -> Column:
    """round(euclidean distance, 6) between two sub-vectors — the PQ
    assignment metric, mirrored by DuckDB's list_distance."""
    return F.round(F.sqrt(F.aggregate(
        F.zip_with(sub, c,
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda acc, v: acc + v)), 6)


def pq_codes_col(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of per-subspace nearest-centroid codes. Codebooks
    ship as one nested-array literal per subspace (see _matrix_lit);
    pure codegen, no shuffle, no Python."""
    d = len(codebooks[0][0])
    codes = []
    for m, cb in enumerate(codebooks):
        sub = F.slice(vec, m * d + 1, d)
        dists = F.transform(_matrix_lit(cb), lambda c: _sub_sqdist_col(sub, c))
        codes.append((F.array_position(dists, F.array_min(dists)) - 1)
                     .cast("int"))
    return F.array(*codes)


def pq_lut_col(vec: Column, codebooks: list[list[list[float]]],
               scale: int = 1_000_000) -> Column:
    """Per-query ADC lookup table: ``array<array<long>>`` where
    ``lut[m][code] = round(dot(q_sub_m, centroid_{m,code}) · scale)`` —
    integer micro-units so downstream sums are order-independent."""
    d = len(codebooks[0][0])
    tables = []
    for m, cb in enumerate(codebooks):
        sub = F.slice(vec, m * d + 1, d)
        tables.append(F.transform(
            _matrix_lit(cb),
            lambda c: F.round(dot_col(sub, c) * scale, 0).cast("long")))
    return F.array(*tables)


def pq_encode(
    df: DataFrame, vec: str = "embedding", key: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
    n_sub: int = 8, k: int = 16, dim: int | None = None,
) -> DataFrame:
    """``(key, codes, norm)`` — the compact index frame a 100 TB corpus
    materializes once: M small ints + one rounded norm per row.
    Map-side only (plan-asserted: zero exchanges)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(df, vec, key, n_sub, k, dim)
    return df.select(
        F.col(key),
        pq_codes_col(F.col(vec), codebooks).alias("codes"),
        F.round(norm_col(F.col(vec)), 6).alias("norm"),
    )


def _adc_score_col(codes: Column, lut: Column, qn: Column, cn: Column,
                   scale: int = 1_000_000) -> Column:
    """Approximate cosine from codes + LUT: integer ADC sum of the M
    table entries, then one float divide by the stored norms."""
    adot = F.aggregate(
        F.zip_with(codes, lut, lambda cd, tab: F.element_at(tab, cd + 1)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return F.round(adot / F.lit(float(scale)) / (qn * cn), 6)


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 10,
    codebooks: list[list[list[float]]] | None = None,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """Exhaustive-ADC top-k: ``(query_key, neighbor_key, score, rank)``.
    Scores EVERY corpus row per query, but from the PQ code frame only —
    the scan reads M bytes of codes and one norm per row; raw embedding
    bytes never reach the rank stage (asserted in tests). Queries are
    broadcast with their LUTs; the corpus never shuffles."""
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec, key, n_sub, n_codes, dim)
    c = pq_encode(corpus, vec, key, codebooks).select(
        F.col(key).alias("neighbor_key"), "codes", F.col("norm").alias("__cn"))
    q = F.broadcast(queries.select(
        F.col(key).alias("query_key"),
        pq_lut_col(F.col(vec), codebooks).alias("lut"),
        F.round(norm_col(F.col(vec)), 6).alias("__qn"),
    ))
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_key") != F.col("query_key"))
        .select("query_key", "neighbor_key",
                _adc_score_col(F.col("codes"), F.col("lut"),
                               F.col("__qn"), F.col("__cn")).alias("score"))
    )
    w = Window.partitionBy("query_key").orderBy(
        F.col("score").desc(), F.col("neighbor_key").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec: str = "embedding",
    key: str = "vec_id",
    k: int = 10,
    centroids: list[list[float]] | DataFrame | None = None,
    codebooks: list[list[list[float]]] | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int | None = None,
) -> DataFrame:
    """IVF + PQ — the FAISS-IVFADC plan shape in DataFrame form:
    the coarse quantizer prunes to n_probe cells (equi-join on cell id),
    the PQ codes rank the survivors (integer ADC, no raw vectors at
    rank time). The corpus is coded once map-side (cell + codes + norm
    in the same projection); queries broadcast with probe cells × LUT.
    At 10¹² rows both index columns are static (write-once alongside
    the embedding table), the per-query cost is |cell|·n_probe ADC
    lookups, and nothing corpus-sized ever shuffles."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, vec, key, n_cells, iters=0)
    elif isinstance(centroids, DataFrame):
        centroids = collect_centroids(centroids, vec, key)
    if codebooks is None:
        codebooks = train_pq_codebooks(corpus, vec, key, n_sub, n_codes, dim)
    c = corpus.select(
        F.col(key).alias("neighbor_key"),
        ivf_cell_col(F.col(vec), centroids).alias("cell"),
        pq_codes_col(F.col(vec), codebooks).alias("codes"),
        F.round(norm_col(F.col(vec)), 6).alias("__cn"),
    )
    q = F.broadcast(queries.select(
        F.col(key).alias("query_key"),
        pq_lut_col(F.col(vec), codebooks).alias("lut"),
        F.round(norm_col(F.col(vec)), 6).alias("__qn"),
        F.explode(ivf_probe_cells_col(F.col(vec), centroids, n_probe))
        .alias("cell"),
    ))
    scored = (
        c.join(q, "cell")
        .where(F.col("neighbor_key") != F.col("query_key"))
        .select("query_key", "neighbor_key",
                _adc_score_col(F.col("codes"), F.col("lut"),
                               F.col("__qn"), F.col("__cn")).alias("score"))
    )
    w = Window.partitionBy("query_key").orderBy(
        F.col("score").desc(), F.col("neighbor_key").asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ------------------------------------------- random projection (JL)

def project_embeddings(df: DataFrame, vec: str = "embedding",
                       key: str = "vec_id", out_dim: int = 16,
                       dim: int | None = None, seed: int = 7,
                       round_to: int = 6) -> DataFrame:
    """Seeded Gaussian random projection (Johnson-Lindenstrauss):
    ``(key, pos, val)`` — the input vector projected onto ``out_dim``
    fixed random directions, scaled by 1/sqrt(out_dim) so expected
    squared distances are preserved. The cheap-front compression for
    every downstream embedding op: a 64->16 projection cuts the
    exact-cosine scan's bytes 4x while distances survive within the JL
    distortion envelope (test-asserted statistically).

    Same machinery and determinism contract as the LSH family: the
    projection matrix is seeded, generated driver-side, and shipped as
    ONE nested-array literal — map-side codegen, zero shuffle
    (plan-asserted), values rounded for cross-engine replay. Output is
    the flat (pos, val) form so the oracle compares scalars, not
    engine-specific array renderings."""
    import math

    dim = _embedding_dim(df, vec, dim)
    planes = _hyperplanes(dim, out_dim, seed)
    scale = 1.0 / math.sqrt(out_dim)
    proj = F.transform(
        _matrix_lit(planes),
        lambda p: F.round(dot_col(F.col(vec), p) * scale, round_to))
    return (
        df.select(F.col(key), F.posexplode(proj).alias("pos", "val"))
    )
