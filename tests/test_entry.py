"""Contract tests for __spark_entry__: entry() smoke + prepare_cpo parity
with the committed cpo_geo oracle fixture."""

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_runs(spark, fixture_dir):
    import __spark_entry__ as E

    df = E.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"row_id", "region_id"}
    assert any(r.region_id is not None for r in rows)


def test_queries_have_oracles_or_are_flagged(spark):
    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs)
    no_oracle = set(qs) - set(oracles)
    # only the seeded/approximate ops may omit an oracle
    assert no_oracle <= {"minhash_pairs", "simhash_pairs", "ann_topk_lsh",
                         "ann_topk_ivf"}


def test_prepare_cpo_matches_fixture_oracle(spark, fixture_dir):
    """Spark prepare_cpo (P1/P2/CRS/outward-inward) must equal the pandas-
    built cpo_geo fixture the DuckDB oracle joins against."""
    from geocode_spark.operators.forward_geocode import prepare_cpo

    raw = spark.read.parquet(str(fixture_dir / "cpo_raw.parquet"))
    got = prepare_cpo(raw).toPandas().sort_values(
        ["Postcode", "Eastings"], ignore_index=True)
    exp = pd.read_parquet(fixture_dir / "cpo_geo.parquet").sort_values(
        ["Postcode", "Eastings"], ignore_index=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["Postcode"], exp["Postcode"])
    pd.testing.assert_series_equal(got["outward_postcode"], exp["outward_postcode"])
    pd.testing.assert_series_equal(got["inward_postcode"], exp["inward_postcode"])
    # lat/lon bit-exact (same numpy kernel on same inputs)
    assert (got["latitude"].to_numpy() == exp["latitude"].to_numpy()).all()
    assert (got["longitude"].to_numpy() == exp["longitude"].to_numpy()).all()
