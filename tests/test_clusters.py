"""dup_clusters connected components + fused/join strategy equivalence."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from geocode_spark.operators.dedup import dup_clusters
from geocode_spark.operators.reverse_geocode import reverse_geocode
from geocode_spark.regions import load_prepared


def test_chained_components(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # chain 0-1-2-3, pair 5-6, singleton 4
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5}


def test_empty_pairs(spark):
    nodes = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dup_clusters(nodes, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_fused_and_join_strategies_agree(spark, fixture_dir):
    """The two physical strategies must produce identical assignments on a
    random point cloud spanning inside/outside/boundary-adjacent cases."""
    prep = load_prepared("llsoa", fixture_dir / "prepared")
    rng = np.random.default_rng(123)
    lat = rng.uniform(51.5, 56.0, 3000)
    lon = rng.uniform(-4.5, 0.1, 3000)
    df = spark.createDataFrame(
        [(int(i), float(la), float(lo)) for i, (la, lo) in enumerate(zip(lat, lon))],
        "row_id long, latitude double, longitude double")
    fused = {r.row_id: r.region_id
             for r in reverse_geocode(df, prep, strategy="fused").collect()}
    joined = {r.row_id: r.region_id
              for r in reverse_geocode(df, prep, strategy="join").collect()}
    assert fused == joined
