"""Benchmark: headline engine queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload (mirrors the north-star pipeline at bench scale):
* reverse_geocode_1m   — 1,000,000 synthetic points -> LLSOA regions via the
                         fused cell-index+ray-cast path (the reference's one
                         published number is 1M pts in ~300 s single-core;
                         README.md:161)
* pipeline_docs        — pages -> extract -> forward geocode -> LLSOA+GSP
                         (pages fixture replicated to ~200k docs)
* minhash_dedup        — MinHash-LSH near-dup pairs over replicated pages
* ann_topk             — brute-force cosine top-k over sf embeddings
* pricing_summary      — TPC-H-ish Q1 aggregation over sf lineitem

Derived metrics reported: points/sec for the reverse geocode, docs/sec for
the pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F  # noqa: E402

FIX = "/root/repo/fixtures"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_POINTS = int(os.environ.get("BENCH_POINTS", "1000000"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "200000"))


def make_points(spark, n):
    """n deterministic points, ~83% inside the 5 fixture LLSOA squares."""
    sq = spark.read.parquet(f"{FIX}/llsoa_regions.parquet")
    ids = spark.range(n).select(F.col("id").alias("row_id"))
    pts = ids.select(
        "row_id", (F.col("row_id") % 6).alias("sqi"),
        (F.lit(0.05) + F.lit(0.9) * ((F.col("row_id") % 211) * F.lit(1.0) / F.lit(211.0))).alias("fx"),
        (F.lit(0.05) + F.lit(0.9) * ((F.col("row_id") % 199) * F.lit(1.0) / F.lit(199.0))).alias("fy"),
    )
    j = pts.join(F.broadcast(sq), pts["sqi"] == sq["region_seq"], "left")
    return j.select(
        "row_id",
        F.when(F.col("sqi") == 5, F.lit(10.0) + F.col("fy"))
         .otherwise(F.col("ymin") + F.col("fy") * (F.col("ymax") - F.col("ymin")))
         .alias("latitude"),
        F.when(F.col("sqi") == 5, F.lit(100.0) + F.col("fx"))
         .otherwise(F.col("xmin") + F.col("fx") * (F.col("xmax") - F.col("xmin")))
         .alias("longitude"),
    )


def make_pages(spark, n):
    """Replicate the pages fixture to ~n rows with distinct urls."""
    pages = spark.read.parquet(f"{FIX}/pages.parquet")
    base = pages.count()
    reps = max(n // base, 1)
    rep = spark.range(reps).select(F.col("id").alias("rep"))
    return (pages.crossJoin(rep)
            .withColumn("url", F.concat_ws("/", "url", "rep"))
            .drop("rep"))


def bench(fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    return dt, n


def main():
    from geocode_spark.operators.dedup import minhash_dedup_pairs
    from geocode_spark.operators.forward_geocode import (forward_geocode,
                                                         prepare_cpo)
    from geocode_spark.operators.pipeline import extract_postcode_mentions
    from geocode_spark.operators.reverse_geocode import reverse_geocode
    from geocode_spark.operators.similarity import brute_force_topk
    from geocode_spark.regions import load_prepared
    from geocode_spark.session import get_spark

    spark = get_spark(app_name="geocode-spark-bench",
                      master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    llsoa = load_prepared("llsoa", f"{FIX}/prepared")
    gsp = load_prepared("gsp", f"{FIX}/prepared")
    queries = {}

    # 1) reverse geocode 1M points (reference: ~300 s single process)
    pts = make_points(spark, N_POINTS)
    queries["reverse_geocode_1m"], n_pts = bench(
        lambda: reverse_geocode(pts, llsoa).filter(
            F.col("region_id").isNotNull()).count())

    # 2) document pipeline: extract -> forward geocode -> LLSOA + GSP
    pages = make_pages(spark, N_DOCS)
    cpo = prepare_cpo(spark.read.parquet(f"{FIX}/cpo_raw.parquet"))

    def run_pipeline():
        mentions = extract_postcode_mentions(pages).select("url", "postcode")
        geo = forward_geocode(mentions, cpo, dedup_keys=True)
        out = reverse_geocode(geo, llsoa, out_col="llsoa", keep_cell=True)
        out = reverse_geocode(out, gsp, out_col="gsp")
        return out.count()

    queries["pipeline_docs"], n_docs = bench(run_pipeline)

    # 3) minhash near-dup over ~20k pages (pair stage is quadratic in dups)
    mh_pages = make_pages(spark, 20000)
    queries["minhash_dedup"], _ = bench(
        lambda: minhash_dedup_pairs(mh_pages, text_col="text", id_col="url",
                                    threshold=0.9).count())

    # 4) ANN brute-force top-k over sf embeddings
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding")
    queries["ann_topk"], _ = bench(
        lambda: brute_force_topk(emb, q, k=10).count())

    # 5) relational agg over sf lineitem
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    queries["pricing_summary"], _ = bench(
        lambda: li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
        .count())

    total = sum(queries.values())
    result = {
        "metric": "bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": CPUS,
        "points_per_sec": round(N_POINTS / queries["reverse_geocode_1m"], 1),
        "docs_per_sec": round(N_DOCS / queries["pipeline_docs"], 1),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
