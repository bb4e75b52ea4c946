"""Distributed forward geocode: postcode strings -> (lat, lon, match_status).

Re-expresses ``cpo.geocode_postcode`` (/root/reference/geocode/cpo.py:116-190)
and its per-row fallback ``geocode_one`` (cpo.py:192-229) as pure DataFrame
ops — no per-row Python anywhere:

* postcode normalization (strip/upper/despace, cpo.py:152-154)  -> Catalyst
  string expressions (whole-stage codegen, SURVEY F1-F3)
* exact match + multi-unit nanmean (cpo.py:156-172): the reference joins 1:N
  then groupbys per input row — but the mean only depends on the postcode
  key, so we pre-aggregate the CPO dimension ONCE (postcode -> avg lat/lon;
  Spark ``avg`` skips NULLs exactly like np.nanmean after NaN->NULL ingest)
  and the fact-side join becomes 1:1 broadcast — ZERO fact-side shuffle
* partial-postcode fallback (cpo.py:217-228): likewise precomputed as a
  prefix-mean dimension over (outward, inward-prefix, prefix-len) for all
  prefix lengths 0..3, again a 1:1 broadcast join (status 2)
* status codes: 1 full match, 2 partial, 0 failed (geocode.py:79-85)

Physical plan at any scale: scan -> codegen'd normalize -> two
BroadcastHashJoins -> project. The fact side never shuffles; the dimension
aggregations (<=1.7M rows real CPO) happen once on the broadcast side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


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
    df = df.withColumn("__ll", ll)
    df = df.withColumn("latitude", F.when(mask, F.col("__ll.lat")))
    df = df.withColumn("longitude", F.when(mask, F.col("__ll.lon"))).drop("__ll")
    df = df.withColumn(
        "outward_postcode",
        F.trim(F.expr("substring(Postcode, 1, greatest(length(Postcode) - 3, 0))")))
    df = df.withColumn("inward_postcode",
                       F.trim(F.expr("substring(Postcode, -3, 3)")))
    return df


def exact_dim(cpo: DataFrame) -> DataFrame:
    """postcode -> (avg lat, avg lon). Row presence == exact match exists.
    Equivalent to the reference's per-row groupby-nanmean (cpo.py:162-172)
    because the mean depends only on the postcode key."""
    return (cpo.groupBy(F.col("Postcode").alias("__pc"))
            .agg(F.avg("latitude").alias("__lat1"),
                 F.avg("longitude").alias("__lon1")))


def prefix_dim(cpo: DataFrame, max_len: int = 3) -> DataFrame:
    """(outward, inward-prefix, prefix-len) -> mean lat/lon over matching
    units, for every prefix length 0..max_len. The precomputed form of
    geocode_one's filtered mean (cpo.py:217-228)."""
    parts = []
    for L in range(0, max_len + 1):
        parts.append(
            cpo.groupBy(
                F.col("outward_postcode").alias("__ow"),
                F.substring("inward_postcode", 1, L).alias("__iw") if L > 0
                else F.lit("").alias("__iw"),
            ).agg(F.avg("latitude").alias("__lat2"),
                  F.avg("longitude").alias("__lon2"))
            .withColumn("__iwlen", F.lit(L))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def prepare_dims(cpo: DataFrame, max_len: int = 3
                 ) -> tuple[DataFrame, DataFrame]:
    """Precompute (exact_dim, prefix_dim) once, persisted — the dimension
    aggregations are static per CPO vintage, so a caller that forward-
    geocodes repeatedly in one session (bench loops, per-batch streaming,
    bucketed lineage runs) should build them once and pass ``dims=`` to
    :func:`forward_geocode` instead of re-aggregating per call. The
    broadcast-build itself is still per-query (that's Spark's execution
    model and it amortizes at scale); this removes the repeated
    aggregation jobs above it."""
    ex = exact_dim(cpo).persist()
    px = prefix_dim(cpo, max_len).persist()
    return ex, px


def forward_geocode(
    postcodes: DataFrame,
    cpo: DataFrame,
    postcode_col: str = "postcode",
    dedup_keys: bool = False,
    dims: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Add latitude/longitude/match_status columns to ``postcodes``.

    ``cpo`` is the prepared dimension from :func:`prepare_cpo`. All input
    columns pass through (the reference instead restores order by its
    ordinal id, cpo.py:190; inside the engine order is free).

    ``dedup_keys=True`` reproduces the reference's session-cache effect
    (cpo.py:140-149) — distinct keys first, geocode, broadcast back. With
    the pre-aggregated dimensions the default path is already shuffle-free,
    so dedup only pays when the distinct key set is small AND downstream
    wants the distinct results themselves.
    """
    if dedup_keys:
        keys = postcodes.select(postcode_col).distinct()
        geocoded = forward_geocode(keys, cpo, postcode_col,
                                   dedup_keys=False, dims=dims)
        return postcodes.join(F.broadcast(geocoded), postcode_col, "left")

    # normalization, F1/F3 (cpo.py:152-154 / 211-224)
    norm = F.upper(F.regexp_replace(F.trim(F.col(postcode_col)), " ", ""))
    up = F.upper(F.trim(F.col(postcode_col)))
    pts = (postcodes
           .withColumn("__norm", norm)
           .withColumn("__outward",
                       F.when(up.contains(" "), F.split(up, " ", 2).getItem(0))
                        .otherwise(up))
           .withColumn("__inward",
                       F.when(up.contains(" "), F.split(up, " ", 2).getItem(1))
                        .otherwise(F.lit(""))))

    ex, px = dims if dims is not None else (exact_dim(cpo), prefix_dim(cpo))

    out = pts.join(F.broadcast(ex), pts["__norm"] == ex["__pc"], "left")
    out = out.join(
        F.broadcast(px),
        (out["__outward"] == px["__ow"])
        & (F.coalesce(out["__inward"], F.lit("")) == px["__iw"])
        & (F.length(F.coalesce(out["__inward"], F.lit(""))) == px["__iwlen"]),
        "left",
    )
    out = (
        out.withColumn(
            "latitude",
            F.when(F.col("__pc").isNotNull(), F.col("__lat1"))
             .otherwise(F.col("__lat2")))
        .withColumn(
            "longitude",
            F.when(F.col("__pc").isNotNull(), F.col("__lon1"))
             .otherwise(F.col("__lon2")))
        .withColumn(
            "match_status",
            F.when(F.col("__pc").isNotNull(), F.lit(1))
             .when(F.col("__lat2").isNotNull(), F.lit(2))
             .otherwise(F.lit(0)))
    )
    drop = [c for c in out.columns if c.startswith("__")]
    return out.drop(*drop)
