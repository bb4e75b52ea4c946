"""North-rule invariant: byte-identical extracted text per url — no engine
operator may alter the ``text`` column it reads (BASELINE.json input_hint)."""

import hashlib

import pyspark.sql.functions as F

from geocode_spark.operators.pipeline import extract_postcode_mentions
from geocode_spark.operators.text import text_profile


def _text_digest(df):
    rows = df.select("url", F.sha2(F.col("text"), 256).alias("h")) \
        .orderBy("url").collect()
    agg = hashlib.sha256()
    for r in rows:
        agg.update(r.url.encode())
        agg.update(r.h.encode())
    return agg.hexdigest()


def test_text_passthrough_byte_identical(spark, fixture_dir):
    pages = spark.read.parquet(str(fixture_dir / "pages.parquet"))
    before = _text_digest(pages)

    # run the extraction + profiling operators and re-derive the digest from
    # THEIR outputs: text must be carried through untouched
    mentions = extract_postcode_mentions(pages)
    after_mentions = _text_digest(mentions.dropDuplicates(["url"]))
    profiled = text_profile(pages)
    after_profile = _text_digest(profiled)

    # mentions drops pages with zero postcodes; digest their subset instead
    urls_with_mentions = mentions.select("url").distinct()
    subset_before = _text_digest(pages.join(urls_with_mentions, "url"))
    assert after_mentions == subset_before
    assert after_profile == before
