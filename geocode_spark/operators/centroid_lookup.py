"""Centroid lookups: entity key -> (lat, lon) via broadcast equi-join.

Re-expresses the reference's dict/.loc probes — LLSOA centroid lookup
(/root/reference/geocode/ons_nrs.py:321-354, probe 555-563), constituency
(ons_nrs.py:396-428, probe 547-553), LAD (ons_nrs.py:430-460, probe 537-545)
— as a single generic broadcast left join. Missing keys yield NULL lat/lon
(reference returns (None, None), ons_nrs.py:544-545).

Name keys are match-normalized exactly as ons_nrs.py:312,541-542:
strip -> remove spaces and commas -> lower.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def normalize_name(col):
    """ons_nrs.py:312 key normalization: strip, drop ' ' and ',', lower."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), "[ ,]", ""))


def centroid_lookup(
    keys: DataFrame,
    centroids: DataFrame,
    key_col: str,
    centroid_key_col: str,
    normalize: bool = False,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Left-join ``keys`` against a broadcast centroid dimension.

    ``normalize=True`` applies the reference's name match-key normalization
    to BOTH sides (constituency/LAD); LLSOA codes join exact.
    All input columns pass through; adds lat/lon columns.
    """
    if normalize:
        lhs = keys.withColumn("__ck", normalize_name(key_col))
        rhs = centroids.select(
            normalize_name(centroid_key_col).alias("__ck"),
            F.col(lat_col).alias("__clat"),
            F.col(lon_col).alias("__clon"),
        )
    else:
        lhs = keys.withColumn("__ck", F.col(key_col))
        rhs = centroids.select(
            F.col(centroid_key_col).alias("__ck"),
            F.col(lat_col).alias("__clat"),
            F.col(lon_col).alias("__clon"),
        )
    out = (
        lhs.join(F.broadcast(rhs), "__ck", "left")
        .withColumn(lat_col, F.col("__clat"))
        .withColumn(lon_col, F.col("__clon"))
        .drop("__ck", "__clat", "__clon")
    )
    return out


def llsoa_from_postcode(postcodes: DataFrame, pc_llsoa: DataFrame,
                        postcode_col: str = "postcode",
                        out_col: str = "llsoa") -> DataFrame:
    """J6: postcode -> LLSOA equi-join on the normalized postcode key
    (ons_nrs.py:462-488 / lookup build 516-535). Broadcast left join."""
    norm = F.upper(F.regexp_replace(F.trim(F.col(postcode_col)), " ", ""))
    rhs = pc_llsoa.select(
        F.col("postcode").alias("__pk"),
        F.col("lsoa11cd").alias(out_col),
    )
    return (postcodes.withColumn("__pk", norm)
            .join(F.broadcast(rhs), "__pk", "left")
            .drop("__pk"))


def gsp_expand(assignments: DataFrame, gsp_lookup: DataFrame,
               region_col: str = "gsp") -> DataFrame:
    """J8: many:many Region<->GSP<->GNode expansion (neso.py:336-343):
    each assigned region picks up ALL its lookup rows (row explosion is the
    natural join semantics; the reference materializes list-of-dicts)."""
    rhs = gsp_lookup.select(
        F.col("region_id").alias(region_col),
        F.col("gnode"), F.col("dno"),
    )
    return assignments.join(F.broadcast(rhs), region_col, "left")


def datazone_relabel(assignments: DataFrame, dz_lookup: DataFrame,
                     region_col: str = "region_id") -> DataFrame:
    """Scottish datazone relabel after LLSOA reverse geocode
    (ons_nrs.py:387-394): region_id -> datazone where a mapping exists."""
    rhs = dz_lookup.select(
        F.col("llsoa_code").alias(region_col),
        F.col("datazone").alias("__dz"),
    )
    return (
        assignments.join(F.broadcast(rhs), region_col, "left")
        .withColumn(region_col, F.coalesce("__dz", region_col))
        .drop("__dz")
    )
