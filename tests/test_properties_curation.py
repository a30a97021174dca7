"""Property-based tests for the round-3 curation operators, checked
against exact pure-Python models (same strategy as test_properties.py:
one DataFrame per example set, small example counts, no deadline).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_prop_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id (deduped below)
        st.sampled_from(["s0", "s1", "s2"]),  # source
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8
        ),  # tokens
    ),
    min_size=0,
    max_size=30,
    unique_by=lambda d: d[0],
)


def _budget_model(docs, budget):
    """Greedy per-source prefix in (md5('budget'||id), id) order."""
    keep = set()
    by_src = {}
    for doc_id, src, toks in docs:
        by_src.setdefault(src, []).append((doc_id, len(toks)))
    for src, items in by_src.items():
        items.sort(
            key=lambda d: (hashlib.md5(f"budget{d[0]}".encode()).hexdigest(), d[0])
        )
        total = 0
        for doc_id, n in items:
            if total < budget:
                keep.add(doc_id)
            total += n
    return keep


@given(docs=_docs, budget=st.integers(min_value=1, max_value=20))
@_prop_settings
def test_token_budget_matches_greedy_model(spark, docs, budget):
    """The windowed budget filter selects exactly the greedy hash-order
    prefix per source, and every kept doc's prior_tokens < budget."""
    from pyspark.sql import Window

    if not docs:
        return
    df = spark.createDataFrame(
        [(i, s, " ".join(t)) for i, s, t in docs],
        "doc_id long, source string, text string",
    )
    sized = df.select(
        "doc_id",
        "source",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias(
            "n_tokens"
        ),
        F.md5(F.concat(F.lit("budget"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    got = {
        r["doc_id"]: r["prior_tokens"]
        for r in sized.withColumn(
            "prior_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .filter(F.col("prior_tokens") < budget)
        .collect()
    }
    assert set(got) == _budget_model(docs, budget)
    assert all(v < budget for v in got.values())


@given(docs=_docs)
@_prop_settings
def test_repetition_metrics_match_counter_model(spark, docs):
    """top_token_frac and distinct_ratio equal the Counter-based model
    for every non-empty document."""
    docs = [(i, s, t) for i, s, t in docs if t]
    if not docs:
        return
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, _, t in docs], "doc_id long, text string"
    )
    counts = (
        df.select(
            "doc_id",
            F.explode(
                F.filter(F.split("text", r"\s+"), lambda x: x != "")
            ).alias("tok"),
        )
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    got = {
        r["doc_id"]: (r["top"], r["distinct"])
        for r in counts.groupBy("doc_id")
        .agg(
            (F.max("c") / F.sum("c")).alias("top"),
            (F.count("*") / F.sum("c")).alias("distinct"),
        )
        .collect()
    }
    for doc_id, _, toks in docs:
        c = Counter(toks)
        top, dis = got[doc_id]
        assert top == pytest.approx(max(c.values()) / len(toks))
        assert dis == pytest.approx(len(c) / len(toks))


@given(docs=_docs)
@_prop_settings
def test_pair_frequencies_match_bigram_model(spark, docs):
    """Adjacent-pair counts equal the per-document bigram multiset sum."""
    if not docs:
        return
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, _, t in docs], "doc_id long, text string"
    )
    toks = df.select(
        F.filter(F.split("text", r"\s+"), lambda x: x != "").alias("t")
    ).filter(F.size("t") >= 2)
    n1 = F.greatest(F.size("t") - 1, F.lit(0))
    zipped = toks.select(
        F.arrays_zip(F.slice("t", 1, n1), F.slice("t", 2, n1)).alias("pairs")
    )
    got = {
        (r["l"], r["r"]): r["n"]
        for r in zipped.select(F.explode("pairs").alias("p"))
        .select(F.col("p.0").alias("l"), F.col("p.1").alias("r"))
        .groupBy("l", "r")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    model = Counter()
    for _, _, t in docs:
        model.update(zip(t, t[1:]))
    assert got == dict(model)


@given(docs=_docs)
@_prop_settings
def test_overlap_matrix_symmetric_model(spark, docs):
    """source_overlap_matrix equals the exact set-intersection counts of
    per-source opening fingerprints, for every source pair."""
    if not docs:
        return
    df = spark.createDataFrame(
        [(i, s, " ".join(t)) for i, s, t in docs],
        "doc_id long, source string, text string",
    )
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    fp = df.select(
        F.md5(F.array_join(F.slice(toks, 1, 10), " ")).alias("h"), "source"
    ).distinct()
    per_hash = (
        fp.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    srcs = F.col("srcs")
    pairs = F.explode(
        F.flatten(
            F.transform(
                srcs,
                lambda x, i: F.transform(
                    F.slice(srcs, i + 2, F.size(srcs)),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    got = {
        (r["a"], r["b"]): r["n"]
        for r in per_hash.select(pairs.alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sets: dict[str, set] = {}
    for _, s, t in docs:
        sets.setdefault(s, set()).add(
            hashlib.md5(" ".join(t[:10]).encode()).hexdigest()
        )
    model = {}
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            n = len(sets[a] & sets[b])
            if n:
                model[(a, b)] = n
    assert got == model
