"""One-order-of-magnitude scale-up evidence (round-4 VERDICT next-item 1).

The engine's 100-TB claims rest on plan shapes validated at sf0.1; this
harness runs the expensive families at 10x that input and checks for
superlinear cliffs plan assertions cannot catch (bucket-cap pressure in
LSH banding, window-hash exchange volume in exact-substring dedup,
python-worker memory in codec/ANN batches).

Input: ``.bench_data/sf1/{documents,embeddings}.parquet`` — the driver's
sf0.1 tables replicated 10x with deterministic per-replica perturbation
(doc ids offset by replica * 10^7; a per-replica suffix token on text so
exact/near-dup structure scales instead of collapsing into 10-way copies;
one embedding dimension nudged per replica). No external data; fully
deterministic; regenerated only when absent.

For each job the harness times the SAME operator code at sf0.1 and at
sf1 in one warm session (median of 2 reps after a warmup) and reports
the cost ratio against the 10x input bound (<= ~12x per the verdict's
done-criterion — linear scan growth plus log-factor slack for sorts and
shuffles). The engine pass scales separately through ``bench.py
--engine-json`` at BENCH_PAGES_ROWS=40M (10x the bench corpus). Peak
RSS comes from /proc VmHWM of the JVM + python workers.

Usage: python tools/bench_sf1.py [--skip-engine]  -> BENCH/bench_sf1.json
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.path.join(REPO, ".bench_data", "sf1")
REPLICAS = 10
ENGINE_ROWS = 40_000_000


def ensure_sf1(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(os.path.join(SF1_DIR, "documents.parquet")):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    reps = spark.range(REPLICAS).select(F.col("id").alias("__rep"))
    (docs.crossJoin(reps)
         .select(
             (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
             F.when(F.col("__rep") == 0, F.col("text"))
              .otherwise(F.concat_ws(" ", F.col("text"),
                                     F.concat(F.lit("r"),
                                              F.col("__rep").cast("string"))))
              .alias("text"),
             *[c for c in docs.columns if c not in ("doc_id", "text")])
         .repartition(32)
         .write.mode("overwrite")
         .parquet(os.path.join(SF1_DIR, "documents.parquet")))
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    (emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__rep") * 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda v, i: (v + F.when(
                    i == F.col("__rep") % 64,
                    (F.col("__rep").cast("float")) / 100.0).otherwise(0.0))
                .cast("float"))
            .alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")])
        .repartition(8)
        .write.mode("overwrite")
        .parquet(os.path.join(SF1_DIR, "embeddings.parquet")))


def _jobs():
    """name -> (spark, dir) -> DataFrame. Operator code identical at
    both scales; caps that exist in the sf0.01 oracle fixtures are NOT
    applied — the full table is the point."""
    from pyspark.sql import functions as F

    import themis_spark.operators.dedup as D
    import themis_spark.operators.similarity as S
    import themis_spark.operators.text as X
    from themis_spark.pipeline import CurationConfig, curate

    def docs(spark, d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def emb(spark, d):
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    def j_curate(spark, d):
        cfg = CurationConfig(classifier_weights=X.hashed_weights(256),
                             classifier_bias=0.0)
        return curate(docs(spark, d), cfg)["packing"]

    def j_dedup_exact(spark, d):
        return D.exact_duplicates(docs(spark, d))

    def j_dedup_minhash(spark, d):
        return D.minhash_signatures(docs(spark, d), num_hashes=16)

    def j_dedup_lsh(spark, d):
        return D.lsh_candidate_pairs(docs(spark, d), num_hashes=12, bands=6)

    def j_dedup_substring(spark, d):
        return D.duplicate_substring_spans(docs(spark, d), window=40)

    def j_ann_cosine(spark, d):
        e = emb(spark, d)
        q = F.broadcast(
            e.where(F.col("vec_id") < 5)
             .select(F.col("vec_id").alias("query_key"),
                     F.col("embedding").alias("q_vec")))
        c = e.select(F.col("vec_id").alias("neighbor_key"),
                     F.col("embedding").alias("c_vec"))
        from pyspark.sql.window import Window
        scored = (c.crossJoin(q)
                  .where(F.col("neighbor_key") != F.col("query_key"))
                  .select("query_key", "neighbor_key",
                          F.round(S.cosine_col(F.col("q_vec"),
                                               F.col("c_vec")), 4)
                          .alias("cosine")))
        w = Window.partitionBy("query_key").orderBy(
            F.col("cosine").desc(), F.col("neighbor_key").asc())
        return scored.withColumn(
            "rank", F.row_number().over(w)).where(F.col("rank") <= 10)

    def j_ann_lsh(spark, d):
        e = emb(spark, d)
        return S.lsh_ann_topk(e, e.where(F.col("vec_id") < 5), k=10,
                              n_planes=12)

    def j_ann_ivf(spark, d):
        e = emb(spark, d)
        return S.ivf_topk(e, e.where(F.col("vec_id") < 5),
                          centroids=e.where(F.col("vec_id") < 16),
                          n_probe=4, k=10)

    def j_ann_pq_encode(spark, d):
        e = emb(spark, d)
        cbs = S.train_pq_codebooks(e, n_sub=8, k=16, dim=64)
        return S.pq_encode(e, codebooks=cbs)

    def j_ann_semdedup(spark, d):
        e = emb(spark, d)
        return S.semantic_duplicates(
            e, centroids=e.where(F.col("vec_id") < 16), threshold=0.97)

    return {
        "pipeline_curate": j_curate,
        "dedup_exact": j_dedup_exact,
        "dedup_minhash": j_dedup_minhash,
        "dedup_lsh_candidates": j_dedup_lsh,
        "dedup_substring_spans": j_dedup_substring,
        "ann_cosine_topk": j_ann_cosine,
        "ann_lsh": j_ann_lsh,
        "ann_ivf": j_ann_ivf,
        "ann_pq_encode": j_ann_pq_encode,
        "ann_semdedup": j_ann_semdedup,
    }


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _time_job(fn, spark, d, reps: int = 2) -> float:
    _noop(fn(spark, d))  # warm
    out = []
    for _ in range(reps):
        t0 = time.time()
        _noop(fn(spark, d))
        out.append(time.time() - t0)
    out.sort()
    return out[len(out) // 2] if len(out) % 2 else (out[0] + out[1]) / 2


def _peak_rss_gb() -> dict:
    """VmHWM of this python, the JVM, and any pyspark daemon workers."""
    out = {"driver_py": 0.0, "jvm": 0.0, "workers": 0.0}
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            with open(status) as f:
                txt = f.read()
            pid = status.split("/")[2]
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ").decode(errors="ignore")
            hwm = 0
            for line in txt.splitlines():
                if line.startswith("VmHWM"):
                    hwm = int(line.split()[1]) / 1024 / 1024  # GB
            if "java" in cmd and "spark" in cmd.lower():
                out["jvm"] = max(out["jvm"], hwm)
            elif "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
                out["workers"] = max(out["workers"], hwm)
            elif str(os.getpid()) == pid:
                out["driver_py"] = hwm
        except OSError:
            continue
    return {k: round(v, 2) for k, v in out.items()}


def main() -> None:
    from themis_spark.session import get_spark

    t_start = time.time()
    result: dict = {"replicas": REPLICAS, "bound_ratio": 12.0, "jobs": {}}
    spark = get_spark(app_name="bench-sf1",
                      master=os.environ.get("BENCH_MASTER",
                                            "local-cluster[8,4,3072]"))
    try:
        ensure_sf1(spark)
        for name, fn in _jobs().items():
            t_small = _time_job(fn, spark, SF01)
            t_big = _time_job(fn, spark, SF1_DIR)
            ratio = t_big / max(t_small, 1e-6)
            result["jobs"][name] = {
                "sf01_sec": round(t_small, 3),
                "sf1_sec": round(t_big, 3),
                "ratio": round(ratio, 2),
                "within_bound": ratio <= result["bound_ratio"],
            }
            print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
                  f"(x{ratio:.1f})", file=sys.stderr)
        result["peak_rss_gb"] = _peak_rss_gb()
    finally:
        spark.stop()

    if "--skip-engine" not in sys.argv:
        env = {**os.environ, "BENCH_PAGES_ROWS": str(ENGINE_ROWS),
               "BENCH_PASSES": "2", "BENCH_MAX_PASSES": "3"}
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--engine-json"],
            capture_output=True, text=True, cwd=REPO, env=env)
        line = [l for l in p.stdout.splitlines()
                if l.startswith("ENGINE_JSON:")]
        if line:
            eng = json.loads(line[0][len("ENGINE_JSON:"):])
            result["engine_40m"] = {
                "rows": eng["rows"],
                "docs_per_sec": eng["docs_per_sec"],
                "passes": eng.get("passes"),
                "stage_secs": eng.get("stage_secs"),
            }
        else:
            result["engine_40m"] = {"error": p.stderr[-1500:]}
        result["peak_rss_gb_engine"] = _peak_rss_gb()

    result["wall_sec"] = round(time.time() - t_start, 1)
    result["n_over_bound"] = sum(
        1 for j in result["jobs"].values() if not j["within_bound"])
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bench_sf1.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("n_over_bound", "wall_sec", "peak_rss_gb")}))


if __name__ == "__main__":
    main()
