"""Lints that keep the 100 TB scale contracts honest:

- the SinglePartition-window detector in tools/explain_audit.py must
  catch a deliberately by-less window (seeded regression) and must NOT
  fire on partitioned windows or global aggregates;
- ``TXT.hash32`` (a 2^32 keyspace) must never be used as an IDENTITY on
  an unbounded-cardinality domain — only as a %128 bucketing or a
  uniform-[0,1) draw (the round-6 lesson: a 32-bit gram identity
  saturates at corpus-scale cardinalities and silently mis-attributes).
"""

from __future__ import annotations

import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _audit():
    spec = importlib.util.spec_from_file_location(
        "explain_audit", os.path.join(REPO, "tools", "explain_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _simple_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )


def test_lint_flags_seeded_byless_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    audit = _audit()
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("x")
    )
    byless = df.select(
        "k", F.row_number().over(Window.orderBy("x")).alias("rk")
    )
    assert audit.singlepartition_window(_simple_plan(byless)), (
        "a global (by-less) window sort must be flagged"
    )


def test_lint_passes_partitioned_window_and_global_agg(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    audit = _audit()
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("x")
    )
    partitioned = df.select(
        "k",
        F.row_number().over(Window.partitionBy("k").orderBy("x")).alias(
            "rk"
        ),
    )
    assert not audit.singlepartition_window(_simple_plan(partitioned))
    # global aggregate funnels partial aggs through SinglePartition —
    # that is a reduction, not a sort, and must NOT be flagged
    global_agg = df.agg(F.sum("x").alias("s"), F.count("*").alias("n"))
    assert not audit.singlepartition_window(_simple_plan(global_agg))
    # global sort-by (range partitioned, not SinglePartition): clean
    assert not audit.singlepartition_window(_simple_plan(df.orderBy("x")))


def test_global_window_whitelist_names_real_queries():
    from slipstream_async_spark.plans.catalog import _QUERIES

    audit = _audit()
    stale = set(audit.ALLOW_GLOBAL_WINDOW) - set(_QUERIES)
    assert not stale, f"whitelist entries with no catalog query: {stale}"


def test_hash32_never_an_unbounded_identity():
    src = open(
        os.path.join(
            REPO, "slipstream_async_spark", "plans", "catalog.py"
        )
    ).read()
    lines = src.splitlines()
    uses = [i for i, ln in enumerate(lines) if "TXT.hash32" in ln]
    assert uses, "lint is vacuous — hash32 call sites not found"
    for i in uses:
        window = "\n".join(lines[i : i + 8])
        bounded = "% 128" in window  # deliberate 128-way bucketing
        uniform = "4294967296" in window  # uniform-[0,1) draw, not identity
        assert bounded or uniform, (
            f"catalog.py:{i + 1}: TXT.hash32 used outside the bounded "
            "whitelist (%128 bucketing / uniform draw) — use TXT.hash64 "
            "for identities on unbounded domains"
        )


def test_readme_counts_match_catalog():
    # round-5 AND round-6 both shipped stale README counts; pin them.
    from slipstream_async_spark.plans.catalog import _ORACLES, _QUERIES

    n = len(_QUERIES)
    assert len(_ORACLES) == n, "every query must stay oracle-paired"
    readme = open(os.path.join(REPO, "README.md")).read()
    claimed = (
        {int(m) for m in re.findall(r"(\d+) query/oracle pairs", readme)}
        | {int(m) for m in re.findall(r"Full catalog \((\d+) queries\)", readme)}
        | {int(m) for m in re.findall(r"`queries\(\)` \((\d+)\)", readme)}
        | {int(m) for m in re.findall(r"catalog\.py\s+(\d+) \(Spark query", readme)}
    )
    assert claimed, "README no longer states catalog counts — re-add them"
    assert claimed == {n}, (
        f"README claims {sorted(claimed)} but the catalog has {n} "
        "oracle-paired queries — sync README.md"
    )
