"""IVF top-k and salting/output-column options."""

import pyspark.sql.functions as F
import pytest

from geocode_spark.operators.reverse_geocode import reverse_geocode
from geocode_spark.operators.similarity import brute_force_topk, ivf_topk
from geocode_spark.regions import load_prepared


def test_ivf_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .withColumn("embedding",
                    F.expr("transform(embedding, x -> cast(x as double))")).cache()
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in ivf_topk(emb, q, dim=64, k=5, n_centroids=8,
                                nprobe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5
    assert all((i, i) in approx for i in range(5))  # self always found


def test_reverse_geocode_output_cols_and_salt(spark, fixture_dir):
    prep = load_prepared("llsoa", fixture_dir / "prepared")
    pts = spark.createDataFrame(
        [(0, 54.547776537068664, -1.195629080286167, "extra")],
        "row_id long, latitude double, longitude double, junk string")
    out = reverse_geocode(pts, prep, output_cols=["row_id"],
                          salt_partitions=4)
    rows = out.collect()
    assert out.columns == ["row_id", "region_id"]
    assert rows[0].region_id == "E01012082"
    assert out.rdd.getNumPartitions() == 4
