"""Physical-plan regression tests: the engine's scale guarantees, asserted
on `.explain` output so a refactor can't silently reintroduce a shuffle.

* fused reverse_geocode: ZERO exchanges (scan -> mapInPandas)
* forward_geocode: no fact-side exchange — every Exchange in the plan sits
  under a BroadcastExchange/dimension aggregation, never on the fact side
* parquet scans: filters pushed down, columns pruned
"""

import re

import pyspark.sql.functions as F
import pytest

from geocode_spark.operators.forward_geocode import forward_geocode, prepare_cpo
from geocode_spark.operators.reverse_geocode import reverse_geocode
from geocode_spark.regions import load_prepared


def plan_of(df, mode="formatted"):
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


def test_fused_reverse_geocode_has_no_shuffle(spark, fixture_dir):
    prep = load_prepared("llsoa", fixture_dir / "prepared")
    pts = spark.range(1000).select(
        F.col("id").alias("row_id"),
        (F.col("id") * 0.001 + 51.0).alias("latitude"),
        (F.col("id") * 0.001 - 1.0).alias("longitude"))
    plan = plan_of(reverse_geocode(pts, prep))
    assert "Exchange" not in plan
    assert "FlatMapsInPandas" in plan.replace("MapInPandas", "FlatMapsInPandas") \
        or "MapInPandas" in plan


def test_forward_geocode_fact_side_never_shuffles(spark, fixture_dir):
    cpo = prepare_cpo(spark.read.parquet(str(fixture_dir / "cpo_raw.parquet")))
    pcs = spark.range(1000).select(
        F.concat(F.lit("AB1 "), (F.col("id") % 10).cast("string")).alias("postcode"))
    plan = plan_of(forward_geocode(pcs, cpo), mode="simple")
    # the fact lineage is Range -> Project -> BroadcastHashJoin(s); any
    # Exchange must be strictly inside a broadcast (dimension) subtree
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if re.search(r"\bExchange\b", line) and "BroadcastExchange" not in line:
            # dimension-side shuffles hang under a BroadcastExchange at a
            # shallower indent above them
            indent = len(line) - len(line.lstrip(" :+-*"))
            covered = any(
                "BroadcastExchange" in up
                and (len(up) - len(up.lstrip(" :+-*"))) < indent
                for up in lines[:i])
            assert covered, f"fact-side shuffle found:\n{line}\n\n{plan}"
    assert "BroadcastHashJoin" in plan


def test_scan_pushdown_and_pruning(spark, fixture_dir):
    df = (spark.read.parquet(str(fixture_dir / "cpo_geo.parquet"))
          .filter(F.col("Positional_quality_indicator") < 50)
          .select("Postcode", "latitude"))
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(Positional_quality_indicator)" in plan \
        or "LessThan(Positional_quality_indicator,50)" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"Postcode", "latitude", "Positional_quality_indicator"}


def test_whole_stage_codegen_covers_text_ops(spark, fixture_dir):
    from geocode_spark.operators.text import text_profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = plan_of(text_profile(docs), mode="simple")
    assert "*(" in plan  # whole-stage codegen marker in simple mode
    # no python evaluation anywhere in the text-profile plan
    assert "Python" not in plan and "InPandas" not in plan


def test_multimodal_plans_are_arrow_not_row_python(spark, fixture_dir):
    """The COVERAGE.md claim 'no row-at-a-time Python' extended to the
    multimodal module: every Python stage must be an Arrow-vectorized
    mapInPandas / pandas UDF (MapInPandas / ArrowEvalPython), never a
    row-at-a-time BatchEvalPython."""
    from geocode_spark.operators.multimodal import (frame_sample,
                                                    with_media_meta)

    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    for df in (frame_sample(pages, binary_col="html", n_frames=3),
               with_media_meta(pages, binary_col="html")):
        plan = plan_of(df, mode="simple")
        assert "BatchEvalPython" not in plan, plan
    # source-level guard: no pandas row iteration anywhere in the module
    import inspect

    import geocode_spark.operators.multimodal as mm

    src = inspect.getsource(mm)
    assert "iterrows" not in src and "itertuples" not in src
