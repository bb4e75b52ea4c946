"""Round-4 regression tests: IVF sample bias, minhash cache lifecycle,
Iceberg optimistic-concurrency commits, stale-hint healing, legacy lineage
manifests."""

import gc
import json

import pytest
import pyspark.sql.functions as F


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


class TestIvfTrainSample:
    def test_sample_drawn_across_partitions(self, spark):
        """_train_vectors must not take its sample from whichever partition
        answers first: a corpus whose FIRST partition holds only marker-A
        vectors and whose last holds marker-B must yield both markers in a
        small sample (limit() alone returns all-A)."""
        from geocode_spark.operators.similarity import _train_vectors

        rows = [(i, [1.0, 0.0] if i < 500 else [0.0, 1.0])
                for i in range(1000)]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>") \
                  .repartitionByRange(4, "vec_id")
        sample = _train_vectors(df, "embedding", "vec_id", 32)
        assert sample.shape == (32, 2)
        markers = set(sample.argmax(axis=1).tolist())
        assert markers == {0, 1}, "sample came from one corner of the corpus"

    def test_sample_is_deterministic(self, spark):
        from geocode_spark.operators.similarity import _train_vectors

        rows = [(i, [float(i), float(i % 7)]) for i in range(300)]
        df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
        a = _train_vectors(df, "embedding", "vec_id", 16)
        b = _train_vectors(df.repartition(7), "embedding", "vec_id", 16)
        assert (a == b).all(), "sample must not depend on partitioning"


class TestMinhashCacheLifecycle:
    def test_signatures_unpersist_with_result_handle(self, spark):
        """Signature blocks live exactly as long as the returned DataFrame:
        present while the caller holds it, gone (blocking unpersist via the
        weakref finalizer) once the handle is collected."""
        from geocode_spark.operators.dedup import minhash_dedup_pairs

        docs = spark.createDataFrame(
            [(i, ("the quick brown fox jumps over the lazy dog %d" % (i % 5)))
             for i in range(40)], "doc_id: long, text: string")
        before = _persistent_ids(spark)
        out = minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16,
                                  bands=4, rows_per_band=4, shingle_k=3)
        assert out.count() > 0
        during = _persistent_ids(spark) - before
        assert len(during) == 1, "signatures should be cached while in use"
        del out
        gc.collect()
        assert _persistent_ids(spark) - before == set(), \
            "signature blocks must be freed when the handle is dropped"


class TestIcebergConcurrency:
    def _mk(self, spark, tmp_path, tag, n=10):
        return spark.range(n).withColumn("tag", F.lit(tag))

    def test_commit_conflict_retries_and_preserves_winner(
            self, spark, tmp_path, monkeypatch):
        """A committer that raced from a stale base version must NOT
        clobber the winner's metadata file: the rename fails, the commit
        re-derives against the advanced table and lands as the next
        version, with all three snapshots readable."""
        import geocode_spark.sources.iceberg as ib

        table = str(tmp_path / "tbl")
        s1 = ib.write_iceberg(spark, self._mk(spark, tmp_path, "a"), table)
        s2 = ib.write_iceberg(spark, self._mk(spark, tmp_path, "b"), table)

        real = ib._current_version
        calls = {"n": 0}

        def stale_once(meta):
            calls["n"] += 1
            v = real(meta)
            # first derivation pretends the winner's commit (v at HEAD)
            # hasn't been seen — exactly the state of a racing committer
            return v - 1 if calls["n"] == 1 else v

        monkeypatch.setattr(ib, "_current_version", stale_once)
        s3 = ib.write_iceberg(spark, self._mk(spark, tmp_path, "c"), table)
        monkeypatch.undo()

        assert calls["n"] >= 2, "conflict should force a re-derivation"
        snaps = ib.snapshots(spark, table)
        assert sorted(int(s["snapshot-id"]) for s in snaps) == [s1, s2, s3]
        # winner's snapshot (s2) must still be intact and time-travelable
        assert ib.read_iceberg(spark, table, s2).count() == 20
        assert ib.read_iceberg(spark, table).count() == 30
        # the conflicted attempt must not have left a half-committed
        # metadata json in place of any real version
        meta = ib._meta_dir(spark, table)
        for name in meta.list_names("v*.metadata.json"):
            json.loads(meta.child(name).read_text())

    def test_stale_hint_is_probed_upward(self, spark, tmp_path):
        """A hint left behind by an out-of-order flip must not hide a
        committed snapshot: _current_version walks to the newest
        v<N>.metadata.json."""
        import geocode_spark.sources.iceberg as ib

        table = str(tmp_path / "tbl2")
        ib.write_iceberg(spark, self._mk(spark, tmp_path, "a"), table)
        s2 = ib.write_iceberg(spark, self._mk(spark, tmp_path, "b"), table)
        meta = ib._meta_dir(spark, table)
        meta.child("version-hint.text").write_text("1")  # stale
        assert ib._current_version(meta) == 2
        assert ib.current_snapshot_id(spark, table) == s2
        assert ib.read_iceberg(spark, table).count() == 20


class TestLegacyLineageManifests:
    def test_missing_n_buckets_field_matches(self, spark, tmp_path):
        """Manifests written before n_buckets entered the identity have no
        n_buckets field; resuming with an unchanged bucket count must skip
        them, not retract the whole run."""
        from geocode_spark.plans.fsio import FsPath
        from geocode_spark.plans.lineage import run_with_lineage

        df = spark.range(120).withColumn("k", F.col("id") % 6)
        out = str(tmp_path / "legacy_out")
        run_with_lineage(df, out, key_col="id", n_buckets=3,
                         snapshot_id="s1")
        ldir = FsPath(spark, out).child("_lineage")
        for name in ldir.list_names("bucket=*.json"):
            mp = ldir.child(name)
            m = json.loads(mp.read_text())
            m.pop("n_buckets")
            mp.write_text(json.dumps(m))
        r = run_with_lineage(df, out, key_col="id", n_buckets=3,
                             snapshot_id="s1")
        assert all(b.skipped for b in r), \
            "legacy manifests must resume, not invalidate"
        # the resume must have BACKFILLED the field...
        for name in ldir.list_names("bucket=*.json"):
            assert json.loads(ldir.child(name).read_text())["n_buckets"] == 3
        # ...so a LATER real bucket-count change still invalidates fully
        r2 = run_with_lineage(df, out, key_col="id", n_buckets=4,
                              snapshot_id="s1")
        assert not any(b.skipped for b in r2)
        assert spark.read.parquet(out).count() == 120


class TestMissingRuntimeClassifier:
    def test_error_shapes(self):
        from geocode_spark.sources.loaders import _is_missing_runtime

        assert _is_missing_runtime(
            RuntimeError("[DATA_SOURCE_NOT_FOUND] Failed to find the data "
                         "source: iceberg."))
        assert _is_missing_runtime(
            RuntimeError("java.lang.ClassNotFoundException: Failed to find "
                         "data source: iceberg"))
        assert not _is_missing_runtime(
            RuntimeError("Cannot find snapshot with ID 42"))

        class WithClass(Exception):
            def getErrorClass(self):
                return "DATA_SOURCE_NOT_FOUND"

        class OtherClass(Exception):
            def getErrorClass(self):
                return "TABLE_OR_VIEW_NOT_FOUND"

        assert _is_missing_runtime(WithClass("boom"))
        assert not _is_missing_runtime(OtherClass("boom"))
