"""Round-5 additions: multi-probe recall lift for bucketed cosine pairs,
driver-side argument validation (frame_sample / reverse_geocode_multi),
thread-safe + byte-bounded broadcast cache, identifier quoting."""

import threading

import numpy as np
import pytest

from geocode_spark.sources import fixtures as fx

FIX = str(fx.FIXTURE_DIR)


class TestCosineMultiProbe:
    def test_hamming_probe_lifts_recall(self, spark):
        """60 planted pairs at cosine ~0.94 (sketches differ by ~1 bit
        with good probability at 10 bits): Hamming-1 probing must recover
        strictly more of the exact pair set than single-bucket matching,
        and stay a subset of it (no false pairs — the cosine filter still
        runs on every candidate)."""
        from geocode_spark.operators.dedup import embedding_cosine_pairs

        rng = np.random.default_rng(5)
        rows = []
        for i in range(60):
            v = rng.normal(size=8)
            v /= np.linalg.norm(v)
            w = rng.normal(size=8)
            w -= (w @ v) * v
            w /= np.linalg.norm(w)
            u = np.cos(0.35) * v + np.sin(0.35) * w  # cosine ~0.939
            rows.append((2 * i, v.tolist()))
            rows.append((2 * i + 1, u.tolist()))
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        exact = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, threshold=0.9, method="exact").collect()}
        kw = dict(threshold=0.9, method="bucketed", dim=8, bits=10, seed=7)
        h0 = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, hamming_probes=0, **kw).collect()}
        h1 = {(r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, hamming_probes=1, **kw).collect()}
        assert h0 <= h1 <= exact
        assert len(h1) > len(h0)  # the probe measurably lifts recall
        assert len(h1) >= 0.6 * len(exact)

    def test_bits_zero_still_exact_with_probes(self, spark):
        """The oracle configuration (bits=0 puts everything in one
        bucket) must stay exactly equal to the exact path regardless of
        hamming_probes — and without duplicate pairs."""
        from geocode_spark.operators.dedup import embedding_cosine_pairs

        rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
        rows += [(10, [1.0, 0.001, 0.0, 0.0])]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        exact = sorted((r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, threshold=0.9, method="exact").collect())
        b = sorted((r.id_a, r.id_b) for r in embedding_cosine_pairs(
            df, threshold=0.9, method="bucketed", dim=4, bits=0,
            hamming_probes=2).collect())
        assert b == exact
        assert len(b) == len(set(b))

    def test_bad_probe_count_rejected(self, spark):
        from geocode_spark.operators.dedup import embedding_cosine_pairs

        df = spark.createDataFrame([(0, [1.0])],
                                   "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="hamming_probes"):
            embedding_cosine_pairs(df, method="bucketed", dim=1,
                                   hamming_probes=3).collect()


class TestDriverSideValidation:
    def test_frame_sample_zero_frames_rejected_on_driver(self, spark):
        """n_frames=0 used to reach the executors and die as a
        ZeroDivisionError outside the MediaFormatError policy."""
        from geocode_spark.operators.multimodal import frame_sample

        df = spark.createDataFrame([(b"\x00\x01",)], "html binary")
        with pytest.raises(ValueError, match="n_frames"):
            frame_sample(df, n_frames=0)

    def test_wav_frames_zero_rejected(self):
        from geocode_spark.functions.media import (MediaFormatError,
                                                   encode_wav, wav_frames)

        wav = encode_wav(np.zeros(100, np.int16), 8000)
        with pytest.raises((ValueError, MediaFormatError)):
            wav_frames(wav, 0)

    def test_reverse_geocode_multi_empty_assignments(self, spark):
        from geocode_spark.operators.reverse_geocode import (
            reverse_geocode_multi)

        pts = spark.createDataFrame([(51.5, -0.1)],
                                    "latitude double, longitude double")
        with pytest.raises(ValueError, match="assignments"):
            reverse_geocode_multi(pts, [], keep_cell=True)


class TestBroadcastCacheBounds:
    def test_concurrent_calls_no_corruption(self, spark):
        from geocode_spark.operators import reverse_geocode as rg
        from geocode_spark.regions import load_prepared

        prep = load_prepared("llsoa", f"{FIX}/prepared")
        sc = spark.sparkContext
        errs = []

        def hammer():
            try:
                for _ in range(20):
                    rg._broadcast_prep(sc, prep)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(8)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert not errs
        assert len(rg._BCAST_CACHE) <= rg._BCAST_CACHE_SIZE

    def test_byte_budget_evicts(self, spark, monkeypatch):
        from geocode_spark.operators import reverse_geocode as rg
        from geocode_spark.regions import load_prepared

        prep_a = load_prepared("llsoa", f"{FIX}/prepared")
        prep_b = load_prepared("gsp", f"{FIX}/prepared")
        assert rg._prep_nbytes(prep_a) > 0
        monkeypatch.setattr(rg, "_BCAST_CACHE_BYTES", 1)  # force eviction
        rg._broadcast_prep(spark.sparkContext, prep_a)
        rg._broadcast_prep(spark.sparkContext, prep_b)
        # newest entry always survives; the over-budget older one is gone
        assert len(rg._BCAST_CACHE) == 1
        (_, kept, *_rest), = rg._BCAST_CACHE.values()
        assert kept is prep_b


class TestIdentifierQuoting:
    def test_backtick_in_table_name_cannot_escape(self, spark):
        """A backticked name must not break out of the quoting; with no
        Iceberg runtime the probe fails closed to None either way, but
        the quoted SQL itself must be well-formed."""
        from geocode_spark.sources.loaders import pages_snapshot_id

        assert pages_snapshot_id(spark, "evil`.x--") is None


class TestDupClustersBatchedRounds:
    def test_batched_convergence_identical_labels(self, spark):
        from geocode_spark.operators.dedup import dup_clusters

        import pyspark.sql.functions as F
        nodes = spark.range(64).select(F.col("id").alias("doc_id"))
        # chains of 8: diameter 7, several doubling rounds
        pairs = (spark.range(63).filter((F.col("id") + 1) % 8 != 0)
                 .select(F.col("id").alias("id_a"),
                         (F.col("id") + 1).alias("id_b")))
        base = {(r.doc_id, r.cluster_id) for r in
                dup_clusters(nodes, pairs, max_iters=10).collect()}
        for k in (2, 3):
            got = {(r.doc_id, r.cluster_id) for r in
                   dup_clusters(nodes, pairs, max_iters=10,
                                convergence_check_every=k).collect()}
            assert got == base
        with pytest.raises(ValueError, match="convergence_check_every"):
            dup_clusters(nodes, pairs, convergence_check_every=0)
