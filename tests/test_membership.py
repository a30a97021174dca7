"""Bloom-filter membership operator (operators/membership.py): the
no-false-negative contract, a sane false-positive rate at the designed
load, mergeability, and the degenerate empty-bitmap case.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from slipstream_async_spark.operators.membership import (
    bloom_build,
    bloom_merge,
    bloom_probe,
)


def _keys(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_no_false_negatives(spark):
    members = _keys(spark, 0, 200)
    bloom = bloom_build(members, "k")
    probed = bloom_probe(members, "k", bloom)
    assert probed.filter(~F.col("bloom_hit")).count() == 0


def test_false_positive_rate_in_range(spark):
    members = _keys(spark, 0, 200)
    bloom = bloom_build(members, "k")
    absent = _keys(spark, 10_000, 10_500)
    n_fp = bloom_probe(absent, "k", bloom).filter(F.col("bloom_hit")).count()
    # theory: (1 - e^{-kn/m})^4 ~ 9% at n=200, m=992, k=4 -> ~47 of 500.
    # deterministic hashes make this exact per-build; the band just has
    # to show it is a real filter (some FPs, far from all-pass).
    assert 0 < n_fp < 150, n_fp


def test_merge_equals_union_build(spark):
    a, b = _keys(spark, 0, 100), _keys(spark, 100, 200)
    merged = {
        r["word"]: r["bm"]
        for r in bloom_merge(bloom_build(a, "k"), bloom_build(b, "k")).collect()
    }
    direct = {
        r["word"]: r["bm"] for r in bloom_build(_keys(spark, 0, 200), "k").collect()
    }
    assert merged == direct


def test_empty_bloom_rejects_everything(spark):
    empty = bloom_build(_keys(spark, 0, 0), "k")
    probed = bloom_probe(_keys(spark, 0, 50), "k", empty)
    assert probed.filter(F.col("bloom_hit")).count() == 0


def test_probe_preserves_columns_and_rowcount(spark):
    df = _keys(spark, 0, 30).withColumn("payload", F.col("k"))
    bloom = bloom_build(_keys(spark, 0, 10), "k")
    out = bloom_probe(df, "k", bloom)
    assert set(out.columns) == {"k", "payload", "bloom_hit"}
    assert out.count() == 30
