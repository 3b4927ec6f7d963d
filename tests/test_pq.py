"""Product quantization (similarity.pq_* / ivfpq_topk).

Correctness oracle is an independent numpy reimplementation of the PQ
contract (sub-slice, rounded L2 argmin with first-on-tie, integer ADC),
plus plan-shape assertions for the scale claims: the code frame computes
map-side with zero exchanges, and the rank stage of ivfpq_topk reads
codes — the raw embedding column is consumed entirely inside the one
corpus-side projection (coding), never carried through the join/window.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import themis_spark.operators.similarity as S

N, DIM, NSUB, K = 120, 16, 4, 8
D = DIM // NSUB


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N, DIM))
    rows = [(i, [float(x) for x in base[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _np_codebooks(X: np.ndarray, k: int = K) -> np.ndarray:
    return X[:k].reshape(k, NSUB, D).transpose(1, 0, 2)  # (NSUB, k, D)


def _np_codes(X: np.ndarray, cb: np.ndarray) -> np.ndarray:
    V = X.reshape(len(X), NSUB, 1, D)
    dists = np.round(np.sqrt(((V - cb[None]) ** 2).sum(-1)), 6)
    return dists.argmin(axis=2)  # first-on-tie == argmin


def test_codes_match_numpy(spark, vecs):
    X = np.array([r["embedding"] for r in vecs.orderBy("vec_id").collect()])
    cbs = S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM)
    assert np.allclose(np.array(cbs), _np_codebooks(X))
    got = {r["vec_id"]: list(r["codes"])
           for r in S.pq_encode(vecs, codebooks=cbs).collect()}
    expect = _np_codes(X, _np_codebooks(X))
    for i in range(N):
        assert got[i] == list(expect[i]), i


def test_adc_score_matches_numpy(spark, vecs):
    X = np.array([r["embedding"] for r in vecs.orderBy("vec_id").collect()])
    cb = _np_codebooks(X)
    codes = _np_codes(X, cb)
    norms = np.round(np.sqrt((X ** 2).sum(1)), 6)
    q = 3
    dots = np.einsum("md,mkd->mk", X[q].reshape(NSUB, D), cb) * 1e6
    # Spark F.round is HALF_UP (away from zero); np.round is half-even
    lut = np.sign(dots) * np.floor(np.abs(dots) + 0.5)
    cbs = S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM)
    out = S.pq_adc_topk(vecs, vecs.where(F.col("vec_id") == q), k=N,
                        codebooks=cbs).collect()
    assert len(out) == N - 1  # self excluded, exhaustive scan
    for r in out:
        j = r["neighbor_key"]
        adot = sum(lut[m][codes[j][m]] for m in range(NSUB))
        expect = round(adot / 1e6 / (norms[q] * norms[j]), 6)
        assert abs(r["score"] - expect) < 1e-9, (j, r["score"], expect)


def test_lloyd_refinement_reduces_distortion(spark, vecs):
    X = np.array([r["embedding"] for r in vecs.orderBy("vec_id").collect()])

    def distortion(cbs):
        cb = np.array(cbs)
        V = X.reshape(len(X), NSUB, 1, D)
        return ((V - cb[None]) ** 2).sum(-1).min(axis=2).sum()

    d0 = distortion(S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM))
    d2 = distortion(S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM,
                                         iters=2))
    assert d2 < d0


def test_ivfpq_candidates_subset_scores_consistent(spark, vecs):
    # every ivfpq hit must also be a pq_adc hit with the SAME score
    # (ivf only prunes candidates; it never changes the ADC ranking
    # function), and its neighbors must lie in the query's probed cells
    cbs = S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM)
    cents = S.train_ivf_centroids(vecs, n_cells=8, iters=0)
    full = {(r["query_key"], r["neighbor_key"]): r["score"]
            for r in S.pq_adc_topk(vecs, vecs.where(F.col("vec_id") < 3),
                                   k=N, codebooks=cbs).collect()}
    pruned = S.ivfpq_topk(vecs, vecs.where(F.col("vec_id") < 3), k=5,
                          centroids=cents, codebooks=cbs, n_probe=2).collect()
    assert len(pruned) > 0
    cells = {r["vec_id"]: r["cell"] for r in vecs.select(
        "vec_id", S.ivf_cell_col(F.col("embedding"), cents).alias("cell")
    ).collect()}
    probe = {r["vec_id"]: list(r["p"]) for r in vecs.where(F.col("vec_id") < 3)
             .select("vec_id", S.ivf_probe_cells_col(
                 F.col("embedding"), cents, 2).alias("p")).collect()}
    for r in pruned:
        assert r["score"] == full[(r["query_key"], r["neighbor_key"])]
        assert cells[r["neighbor_key"]] in probe[r["query_key"]]


def test_pq_encode_is_map_side_only(spark, vecs):
    plan = S.pq_encode(vecs, codebooks=S.train_pq_codebooks(
        vecs, n_sub=NSUB, k=K, dim=DIM))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ivfpq_rank_stage_never_carries_vectors(spark, vecs):
    cbs = S.train_pq_codebooks(vecs, n_sub=NSUB, k=K, dim=DIM)
    cents = S.train_ivf_centroids(vecs, n_cells=8, iters=0)
    out = S.ivfpq_topk(vecs, vecs.where(F.col("vec_id") < 3), k=5,
                       centroids=cents, codebooks=cbs, n_probe=2)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # the join output (everything after the coding projections) must not
    # reference the raw vector column — codes/norm/lut only
    join_tail = opt[:opt.index("Join")]
    assert "embedding" not in join_tail, join_tail
    # exactly one broadcast (queries+LUT) and the window's exchange
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert phys.count("BroadcastExchange") == 1, phys


def test_jl_projection_preserves_distances_statistically(spark, vecs):
    # JL with out_dim=8 over 16-dim inputs: squared distances are
    # preserved in EXPECTATION; check the mean relative distortion over
    # many pairs is small and no systematic bias (loose envelope — this
    # is a statistical property, not exactness)
    import numpy as np

    proj = S.project_embeddings(vecs, out_dim=8, dim=DIM, seed=7)
    P = {}
    for r in proj.collect():
        P.setdefault(r["vec_id"], {})[r["pos"]] = r["val"]
    X = {r["vec_id"]: np.array(r["embedding"])
         for r in vecs.collect()}
    Pm = {k: np.array([v[i] for i in range(8)]) for k, v in P.items()}
    ratios = []
    ids = sorted(X)[:40]
    for i in ids:
        for j in ids:
            if i < j:
                d0 = ((X[i] - X[j]) ** 2).sum()
                d1 = ((Pm[i] - Pm[j]) ** 2).sum()
                ratios.append(d1 / d0)
    m = float(np.mean(ratios))
    assert 0.7 < m < 1.3, m          # unbiased in aggregate
    assert float(np.median(ratios)) > 0.4  # no collapse


def test_jl_projection_is_map_side_only(spark, vecs):
    plan = S.project_embeddings(vecs, out_dim=8, dim=DIM)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
