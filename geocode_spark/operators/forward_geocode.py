"""Distributed forward geocode: postcode strings -> (lat, lon, match_status).

Re-expresses ``cpo.geocode_postcode`` (/root/reference/geocode/cpo.py:116-190)
and its per-row fallback ``geocode_one`` (cpo.py:192-229) as pure DataFrame
ops — no per-row Python anywhere:

* postcode normalization (strip/upper/despace, cpo.py:152-154)  -> Catalyst
  string expressions (whole-stage codegen, SURVEY F1-F3)
* exact match: left BroadcastHashJoin vs the CPO dimension (cpo.py:156-161)
* multi-unit postcodes: groupBy(row).avg — Spark ``avg`` skips NULLs exactly
  like np.nanmean after NaN->NULL ingest (cpo.py:162-172, SURVEY A1)
* partial-postcode fallback (cpo.py:217-228): equi-join on outward + inward
  *prefix* residual predicate, then filtered mean (status 2)
* status codes: 1 full match, 2 partial, 0 failed (geocode.py:79-85)

The CPO dimension (~1.7M rows real scale) is always the broadcast side; the
postcode (fact) side never shuffles except the per-row aggregation of the
1:N join, which AQE coalesces. The repeated-key optimization the reference
gets from its session cache (cpo.py:140-149) is available as
``dedup_keys=True``: distinct normalized keys -> geocode -> map back, a
distinct-then-broadcast-back that pays off when web text repeats postcodes
heavily (SURVEY §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def prepare_cpo(cpo_raw: DataFrame) -> DataFrame:
    """CPO raw (Postcode, Positional_quality_indicator, Eastings, Northings)
    -> geocoded dimension with derived lat/lon and outward/inward split.

    Mirrors cpo.py:96-110 including:
    * P1: drop rows with Eastings == 0 AND Northings == 0 (cpo.py:99)
    * P2 quirk: the reference's quality mask is
      ``Eastings.notnull() & PQI < 90`` which Python-precedence-evaluates as
      ``(notnull & PQI) < 90`` i.e. ``(PQI & 1) < 90`` — effectively
      all-true (cpo.py:100-102). We reproduce the *actual* semantics.
    """
    from ..functions.udfs import bng_to_latlon_udf

    df = cpo_raw
    df = df.withColumn("Postcode", F.upper(F.regexp_replace(F.col("Postcode"), " ", "")))
    df = df.filter(~((F.col("Eastings") == 0) & (F.col("Northings") == 0)))
    # P2: (notnull & PQI) < 90 — bitwise AND of the bool (0/1) with PQI
    mask = (
        F.col("Eastings").isNotNull().cast("int")
        .bitwiseAND(F.col("Positional_quality_indicator")) < 90
    )
    ll = bng_to_latlon_udf(F.col("Eastings").cast("double"),
                           F.col("Northings").cast("double"))
    df = df.withColumn("latitude", F.when(mask, ll.getField("lat")))
    df = df.withColumn("longitude", F.when(mask, ll.getField("lon")))
    df = df.withColumn(
        "outward_postcode",
        F.trim(F.expr("substring(Postcode, 1, greatest(length(Postcode) - 3, 0))")))
    df = df.withColumn("inward_postcode",
                       F.trim(F.expr("substring(Postcode, -3, 3)")))
    return df


def forward_geocode(
    postcodes: DataFrame,
    cpo: DataFrame,
    postcode_col: str = "postcode",
    dedup_keys: bool = False,
) -> DataFrame:
    """Add latitude/longitude/match_status columns to ``postcodes``.

    ``cpo`` must be the prepared dimension from :func:`prepare_cpo`.
    Output preserves all input columns (order restoration is the caller's
    concern via their own key — the reference sorts by its ordinal id,
    cpo.py:190; inside the engine order is free).
    """
    if dedup_keys:
        keys = postcodes.select(postcode_col).distinct()
        geocoded = forward_geocode(keys, cpo, postcode_col, dedup_keys=False)
        return postcodes.join(F.broadcast(geocoded), postcode_col, "left")

    pts = postcodes.withColumn("__fg_row", F.monotonically_increasing_id())
    pts = pts.withColumn(
        "__norm", F.upper(F.regexp_replace(F.trim(F.col(postcode_col)), " ", "")))

    cpo_cols = cpo.select(
        F.col("Postcode").alias("__cpo_pc"),
        F.col("latitude").alias("__cpo_lat"),
        F.col("longitude").alias("__cpo_lon"),
    )
    joined = pts.join(F.broadcast(cpo_cols),
                      pts["__norm"] == cpo_cols["__cpo_pc"], "left")
    exact = joined.groupBy("__fg_row").agg(
        F.first("__cpo_pc").alias("__matched"),
        F.avg("__cpo_lat").alias("__lat1"),
        F.avg("__cpo_lon").alias("__lon1"),
    )

    # partial fallback: only for rows with no exact CPO match (a broadcast
    # anti-join keeps the prefix join's fact side small — real outward
    # districts have thousands of units each)
    pts_miss = pts.join(
        F.broadcast(cpo.select(F.col("Postcode").alias("__norm")).distinct()),
        "__norm", "left_anti")

    # outward/inward split of the *raw* input (the
    # reference uppercases but does NOT despace in geocode_one, cpo.py:211-224)
    up = F.upper(F.trim(F.col(postcode_col)))
    pts2 = pts_miss.withColumn(
        "__outward", F.when(up.contains(" "), F.split(up, " ", 2).getItem(0)).otherwise(up)
    ).withColumn(
        "__inward", F.when(up.contains(" "), F.split(up, " ", 2).getItem(1)))

    cpo_part = cpo.select(
        F.col("outward_postcode").alias("__c_out"),
        F.col("inward_postcode").alias("__c_in"),
        F.col("latitude").alias("__c_lat"),
        F.col("longitude").alias("__c_lon"),
    )
    part_join = pts2.join(
        F.broadcast(cpo_part),
        (F.col("__outward") == F.col("__c_out"))
        & (F.col("__inward").isNull()
           | F.col("__c_in").startswith(F.col("__inward"))),
        "left",
    )
    partial = part_join.groupBy("__fg_row").agg(
        F.avg("__c_lat").alias("__lat2"),
        F.avg("__c_lon").alias("__lon2"),
    )

    out = (
        pts.join(exact, "__fg_row", "left")
        .join(partial, "__fg_row", "left")
        .withColumn("latitude", F.coalesce("__lat1", "__lat2"))
        .withColumn("longitude", F.coalesce("__lon1", "__lon2"))
        .withColumn(
            "match_status",
            F.when(F.col("__matched").isNotNull(), F.lit(1))
            .when(F.col("__lat2").isNotNull(), F.lit(2))
            .otherwise(F.lit(0)),
        )
    )
    drop = [c for c in out.columns if c.startswith("__")]
    return out.drop(*drop)
