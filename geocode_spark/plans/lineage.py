"""Per-partition lineage + idempotent checkpoint resume (north_rule).

The reference memoizes whole tables to pickles (cache_manager.py:22-119);
at 10^12 docs a job must instead resume mid-run. This module executes a
DataFrame-producing job with per-bucket lineage in ONE pass over the input:

* rows are assigned to ``n_buckets`` deterministic hash buckets of a key;
* already-committed buckets are filtered out BEFORE the transform (resume
  skips their compute entirely), so total scan volume is independent of
  ``n_buckets`` — one distributed write job, not one job per bucket;
* the remaining buckets are written in a single
  ``write.partitionBy("bucket")`` with dynamic partition overwrite to
  ``<out>/bucket=<i>/`` — idempotent (a re-run overwrites, never duplicates);
* per-bucket row counts come from the written parquet FOOTERS (metadata
  only, no data re-scan);
* a manifest ``_lineage/bucket=<i>.json`` is committed AFTER the data, with
  input snapshot id, operator version, row count and timings; on restart,
  buckets with a committed manifest for the same (snapshot, version) are
  skipped.

Contract: ``transform`` must be key-local — every output row derives only
from input rows of a single ``key_col`` value, and ``key_col`` must survive
into the output (it is the lineage key). Row-wise maps and per-key
aggregations/joins qualify; both engine users (identity, geocode_documents)
do. This is what makes "transform(filtered buckets)" == "union of per-bucket
transforms" and lets the output be re-bucketed by the same hash.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class BucketResult:
    bucket: int
    rows: int
    seconds: float
    skipped: bool


def _bucket_col(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))


def _footer_rows(bucket_dir: Path) -> int:
    """Row count from parquet footer metadata — no data scan."""
    import pyarrow.parquet as pq

    if not bucket_dir.exists():
        return 0
    return sum(pq.ParquetFile(str(f)).metadata.num_rows
               for f in bucket_dir.glob("*.parquet"))


def run_with_lineage(
    df: DataFrame,
    out_dir: str | Path,
    key_col: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    n_buckets: int = 8,
    snapshot_id: str = "unknown",
    operator_version: str = "1",
) -> list[BucketResult]:
    """Execute ``transform`` over hash buckets of ``df`` with resume."""
    out = Path(out_dir)
    lineage_dir = out / "_lineage"
    lineage_dir.mkdir(parents=True, exist_ok=True)
    transform = transform or (lambda d: d)

    committed: dict[int, dict] = {}
    for b in range(n_buckets):
        manifest_path = lineage_dir / f"bucket={b}.json"
        if manifest_path.exists():
            m = json.loads(manifest_path.read_text())
            if (m.get("snapshot_id") == snapshot_id
                    and m.get("operator_version") == operator_version
                    and m.get("committed")):
                committed[b] = m
            else:
                # the bucket is being recomputed for a different
                # (snapshot, version): retract the old manifest BEFORE any
                # data is touched, so a crash mid-run can never leave a
                # committed manifest pointing at deleted/overwritten data
                # (a later resume under the OLD snapshot must recompute,
                # not trust it)
                manifest_path.unlink()

    results = [BucketResult(b, m["rows"], 0.0, skipped=True)
               for b, m in committed.items()]
    todo = [b for b in range(n_buckets) if b not in committed]
    if todo:
        t0 = time.time()
        src = df
        if committed:
            # resume: committed buckets never reach the transform
            src = src.filter(
                _bucket_col(key_col, n_buckets).isin(todo))
        result = transform(src)
        if key_col not in result.columns:
            raise ValueError(
                f"lineage key column {key_col!r} must survive the transform "
                "(it is the per-bucket lineage key)")
        if "bucket" in result.columns:
            raise ValueError(
                "'bucket' is the reserved lineage partition column — rename "
                "the transform output column")
        # a todo bucket is by definition uncommitted for this
        # (snapshot, version): clear any stale data now so a bucket that
        # legitimately produces ZERO rows this run cannot inherit a prior
        # run's files (dynamic overwrite only replaces partitions that are
        # actually written). Manifests are written after the data, so a
        # crash between this delete and the write just re-runs the bucket.
        import shutil

        for b in todo:
            stale = out / f"bucket={b}"
            if stale.exists():
                shutil.rmtree(stale)
        bucketed = result.withColumn("bucket",
                                     _bucket_col(key_col, n_buckets))
        spark = df.sparkSession
        conf_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "dynamic")
        try:
            # ONE distributed write job for every outstanding bucket;
            # dynamic overwrite touches only the partitions being written
            bucketed.write.mode("overwrite").partitionBy("bucket") \
                .parquet(str(out))
        finally:
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)
        dt = time.time() - t0
        for b in todo:
            rows = _footer_rows(out / f"bucket={b}")
            manifest = {
                "bucket": b,
                "snapshot_id": snapshot_id,
                "operator_version": operator_version,
                "rows": rows,
                "seconds": round(dt, 3),  # wall time of the shared write job
                "committed": True,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            (lineage_dir / f"bucket={b}.json").write_text(json.dumps(manifest))
            results.append(BucketResult(b, rows, dt, skipped=False))
    return sorted(results, key=lambda r: r.bucket)


def read_lineage(out_dir: str | Path) -> list[dict]:
    lineage_dir = Path(out_dir) / "_lineage"
    return [json.loads(p.read_text())
            for p in sorted(lineage_dir.glob("bucket=*.json"))]
