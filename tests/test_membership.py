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


def test_hit_keys_matches_probe_verdicts(spark):
    """bloom_hit_keys (the join-based large-bitmap probe) returns
    exactly the distinct keys bloom_probe marks as hits — same hash
    scheme, same no-false-negative contract, no per-word plan
    literals."""
    from slipstream_async_spark.operators.membership import bloom_hit_keys

    members = _keys(spark, 0, 120)
    bloom = bloom_build(members, "k", words=32)
    queries = _keys(spark, 60, 400)
    via_probe = {
        r["k"]
        for r in bloom_probe(queries, "k", bloom, words=32)
        .filter(F.col("bloom_hit"))
        .collect()
    }
    via_keys = {
        r["k"]
        for r in bloom_hit_keys(queries, "k", bloom, words=32).collect()
    }
    assert via_keys == via_probe
    # every true member queried is in the hit set (no false negatives)
    assert {f"key-{i}" for i in range(60, 120)} <= via_keys
    # empty bloom: nothing hits
    empty = bloom_build(_keys(spark, 0, 0), "k", words=32)
    assert bloom_hit_keys(queries, "k", empty, words=32).count() == 0
    # duplicate input rows collapse to one hit key (distinct contract)
    dup = queries.unionByName(queries)
    assert (
        bloom_hit_keys(dup, "k", bloom, words=32).count() == len(via_keys)
    )


def test_probe_array_matches_probe_verdicts(spark):
    """bloom_probe_array (the driver-held-bitmap probe) gives the same
    per-row verdicts as bloom_probe over the same bitmap — same hash
    scheme, bitmap shipped as one-row broadcast data instead of plan
    literals."""
    from slipstream_async_spark.operators.membership import (
        bloom_probe_array,
    )

    members = _keys(spark, 0, 120)
    bloom = bloom_build(members, "k", words=32)
    words_arr = [0] * 32
    for r in bloom.collect():
        words_arr[r["word"]] = r["bm"]
    queries = _keys(spark, 60, 400).withColumn("payload", F.col("k"))
    via_probe = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(queries, "k", bloom, words=32).collect()
    }
    out = bloom_probe_array(queries, "k", words_arr).collect()
    assert {r["k"]: r["bloom_hit"] for r in out} == via_probe
    # columns preserved, bitmap column dropped, row count unchanged
    assert set(out[0].asDict()) == {"k", "payload", "bloom_hit"}
    assert len(out) == 340
    # no false negatives: every true member queried reads as a hit
    assert all(via_probe[f"key-{i}"] for i in range(60, 120))
    # all-zero bitmap rejects everything
    n_hits = (
        bloom_probe_array(queries, "k", [0] * 32)
        .filter(F.col("bloom_hit"))
        .count()
    )
    assert n_hits == 0


def test_bloom_fpr_and_saturation_warning():
    """bloom_fpr is the standard (1-e^{-kn/m})^k — ~0 when empty,
    monotone in n, -> 1 at saturation; warn_bloom_saturation fires
    past FPR 0.5 and stays quiet below."""
    import warnings as _w

    import pytest as _pytest

    from slipstream_async_spark.operators.membership import (
        bloom_fpr,
        warn_bloom_saturation,
    )

    assert bloom_fpr(0, words=16) == 0.0
    assert bloom_fpr(100, words=16) < bloom_fpr(1000, words=16) < 1.0
    assert bloom_fpr(100_000, words=16) > 0.99
    # default 16 words (992 bits) saturates near ~1k standing keys —
    # the documented-but-silent dial VERDICT r11 flagged
    assert bloom_fpr(1000, words=16) > 0.5
    with _pytest.warns(RuntimeWarning, match="saturated"):
        warn_bloom_saturation(1000, words=16, k=4, context="t")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        fpr = warn_bloom_saturation(100, words=16, k=4, context="t")
    assert not rec and 0 < fpr < 0.5
