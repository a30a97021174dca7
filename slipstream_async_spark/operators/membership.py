"""Mergeable Bloom-filter membership: build a fixed-size bitmap over a
key column, probe it from any other frame — the kilobyte-scale
pre-filter that replaces a shuffle/broadcast of a full key SET in
semi-join-shaped problems (benchmark decontamination, standing-index
dedup probes, "have we seen this id" gates).

Design (all public Spark API, reproducible in any engine with md5):

- k hash positions per key: ``hash32(key || '#i') % (words * 62)`` —
  the first 8 hex chars of md5 read base-16 (functions.text.hash32).
- The bitmap is ``words`` rows of (word, 64-bit mask) built by ONE
  partial-aggregated groupBy + ``bit_or`` — mergeable across
  partitions, batches, and days by construction (bit_or again).
- Only 62 bits per word are used (bit 63 and 62 never set), so signed
  shifts and sign-extension behave identically in Spark, DuckDB, and
  any two's-complement engine.
- Probing is a broadcast join on the word index (<= ``words`` rows)
  plus pure bit arithmetic; a key is a member iff all k probed bits
  are set. False negatives are impossible; the false-positive rate is
  the standard (1 - e^{-kn/m})^k.

At 100 TB: the build side aggregates to ``words`` rows no matter how
many keys feed it; the probe side never shuffles (the bitmap
broadcasts). Tune ``words`` to the expected key count (m ~ 10-15 bits
per key for ~1% FPR at k=4); the plumbing is identical at any size.

Reference parity: the reference's cache layer answers the same
"might this key exist" question with RocksDB bloom/key_may_exist
(slipstream-async cookbook's cache lookups); here it is a first-class
relational operator instead of a storage-engine internal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slipstream_async_spark.functions.text import hash32

BITS_PER_WORD = 62


def _positions(key: Column, k: int, m_bits: int) -> Column:
    """Array of k bit positions in [0, m_bits) for a key."""
    return F.array(
        *[hash32(F.concat(key, F.lit(f"#{i}"))) % F.lit(m_bits) for i in range(k)]
    )


def bloom_build(
    df: DataFrame, key: str, *, words: int = 16, k: int = 4
) -> DataFrame:
    """Fold ``df[key]`` into a Bloom bitmap: a DataFrame of
    ``(word: int, bm: bigint)`` with at most ``words`` rows.

    One explode of k positions per key, one groupBy(word)/bit_or —
    partial-aggregated and mergeable: union two builds and re-run
    ``groupBy("word").agg(bit_or("bm"))`` to merge them.
    """
    m_bits = words * BITS_PER_WORD
    return (
        df.select(F.explode(_positions(F.col(key), k, m_bits)).alias("idx"))
        .groupBy((F.col("idx") / BITS_PER_WORD).cast("int").alias("word"))
        .agg(
            F.bit_or(F.expr(f"shiftleft(1L, idx % {BITS_PER_WORD})")).alias("bm")
        )
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """OR-merge bitmaps built with identical (words, k) parameters."""
    merged = blooms[0]
    for b in blooms[1:]:
        merged = merged.unionByName(b)
    return merged.groupBy("word").agg(F.bit_or("bm").alias("bm"))


def bloom_probe(
    df: DataFrame, key: str, bloom: DataFrame, *, words: int = 16, k: int = 4
) -> DataFrame:
    """Append boolean ``bloom_hit`` to ``df``: True iff all k probed
    bits for ``df[key]`` are set (definitely-absent keys get False —
    no false negatives; some absent keys get True at the FPR).

    The bitmap is collected (bounded: at most ``words`` rows by
    construction) and inlined as plan literals — the PQ-codebook
    pattern — so the probe is a PURE PROJECTION evaluated at the scan:
    no join, no shuffle, no row-multiplicity hazards; duplicate input
    rows each get their own verdict. (An earlier join+re-aggregate
    formulation collapsed duplicate rows and mis-counted their probe
    hits — caught by the hypothesis property test.)
    """
    m_bits = words * BITS_PER_WORD
    bm = {int(r["word"]): int(r["bm"]) for r in bloom.collect()}
    words_arr = F.array(
        *[F.lit(bm.get(w, 0)).cast("bigint") for w in range(words)]
    )
    # probe positions come from the SAME helper the build uses — one
    # source of truth for the hash/salt scheme, or build and probe
    # silently disagree and the no-false-negative contract breaks.
    pos_arr = _positions(F.col(key), k, m_bits)
    hit = F.lit(True)
    for i in range(k):
        idx = F.element_at(pos_arr, i + 1)
        word = (idx / BITS_PER_WORD).cast("int")
        bit = (idx % BITS_PER_WORD).cast("int")
        elem = F.element_at(words_arr, word + 1)
        hit = hit & (
            F.call_function("shiftright", elem, bit).bitwiseAND(F.lit(1)) == 1
        )
    return df.withColumn("bloom_hit", hit)


def bloom_hit_keys(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    *,
    words: int = 16,
    k: int = 4,
    distinct: bool = True,
) -> DataFrame:
    """``df[key]`` values that MAY be members (all k probed bits set)
    — the join-based twin of :func:`bloom_probe` for LARGE bitmaps.
    :func:`bloom_probe` inlines the bitmap as ``words`` plan literals
    (the right call at a few dozen words), but literal Columns cost
    py4j build time linear in ``words`` — and at thousands of words
    the inlined constants bloat whole-stage codegen, recompiled every
    probe. Here the bitmap stays a DataFrame: k broadcast equi-joins
    on the word index (<= ``words`` rows each; the repeated exchange
    is reused), one per probe position — NARROW ops only, no shuffle,
    no groupBy, so the probe fuses into the consuming stage and plan
    size is O(1) in ``words``. Missing words read as 0 — no false
    negatives, same hash scheme as the build.

    Returns one column named ``key``. ``distinct=True`` (default)
    collapses duplicate inputs (one shuffle); pass ``distinct=False``
    when the input keys are already unique and the consumer wants the
    fully-fused narrow plan."""
    m_bits = words * BITS_PER_WORD
    pos_arr = _positions(F.col(key), k, m_bits)
    out = df.select(key)
    hit = F.lit(True)
    for i in range(k):
        idx = F.element_at(pos_arr, i + 1)
        side = bloom.select(
            F.col("word").alias(f"_w{i}"), F.col("bm").alias(f"_bm{i}")
        )
        out = out.join(
            F.broadcast(side),
            (idx / BITS_PER_WORD).cast("int") == F.col(f"_w{i}"),
            "left",
        )
        hit = hit & (
            F.call_function(
                "shiftright",
                F.coalesce(F.col(f"_bm{i}"), F.lit(0).cast("bigint")),
                (idx % BITS_PER_WORD).cast("int"),
            ).bitwiseAND(F.lit(1))
            == 1
        )
    out = out.filter(hit).select(key)
    return out.distinct() if distinct else out


def bloom_probe_array(
    df: DataFrame, key: str, words_arr: list[int], *, k: int = 4
) -> DataFrame:
    """Append boolean ``bloom_hit`` to ``df`` probing a DRIVER-HELD
    bitmap (``words_arr[i]`` = word i's 62-bit mask) — the probe form
    for a persistent gate whose bitmap was read driver-side (e.g. from
    a state table's newest file, no Spark job). The bitmap ships as
    DATA in a one-row broadcast (``crossJoin(broadcast(...))`` — a
    BroadcastNestedLoopJoin whose build side is ONE constant-sized
    row, never corpus-shaped), so unlike :func:`bloom_probe`'s
    literals there is no py4j build cost and no whole-stage-codegen
    constant to recompile per probe, at any ``words``. The probe
    itself is narrow (element_at + bit arithmetic) and fuses into the
    consuming stage. Same hash scheme as the build — no false
    negatives."""
    words = len(words_arr)
    m_bits = words * BITS_PER_WORD
    bm_df = df.sparkSession.createDataFrame(
        [(words_arr,)], "_bmarr array<bigint>"
    )
    pos_arr = _positions(F.col(key), k, m_bits)
    hit = F.lit(True)
    for i in range(k):
        idx = F.element_at(pos_arr, i + 1)
        elem = F.element_at(
            F.col("_bmarr"), (idx / BITS_PER_WORD).cast("int") + 1
        )
        hit = hit & (
            F.call_function(
                "shiftright", elem, (idx % BITS_PER_WORD).cast("int")
            ).bitwiseAND(F.lit(1))
            == 1
        )
    return (
        df.crossJoin(F.broadcast(bm_df))
        .withColumn("bloom_hit", hit)
        .drop("_bmarr")
    )


def bloom_fpr(n_keys: int, *, words: int = 16, k: int = 4) -> float:
    """Expected false-positive rate of a bloom built from ``n_keys``
    distinct keys at this (words, k): the standard
    ``(1 - e^{-k*n/m})^k``. The saturation dial for sizing ``words``
    — a gate whose FPR approaches 1 silently degrades to the ungated
    join it exists to avoid, so sinks warn when this crosses ~0.5
    (~0.75 * words keys at k=4). Size m ~ 10-15 bits/key for ~1% FPR:
    ``words >= n_keys / 5``."""
    import math

    m_bits = words * BITS_PER_WORD
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n_keys / m_bits)) ** k


def warn_bloom_saturation(
    n_keys: int, *, words: int, k: int, context: str
) -> float:
    """Loud saturation diagnostic: warn when the estimated FPR for
    ``n_keys`` standing keys exceeds 0.5 (the gate is no longer
    filtering — most absent keys probe as hits). Returns the estimate
    so callers can record it in stats. ``n_keys`` should come from a
    driver-side footer count (no Spark job)."""
    import warnings

    fpr = bloom_fpr(n_keys, words=words, k=k)
    if fpr > 0.5:
        warnings.warn(
            f"{context}: bloom gate is saturated — ~{n_keys} standing "
            f"keys in {words * BITS_PER_WORD} bits gives an estimated "
            f"FPR of {fpr:.2f}; most probes now pass the gate and pay "
            "the exact check it exists to avoid. Rebuild the gate with "
            f"words >= {max(words * 2, (n_keys + 4) // 5)} "
            "(~10-15 bits/key for ~1% FPR).",
            RuntimeWarning,
            stacklevel=3,
        )
    return fpr


def count_min_table(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) of
    a key column's frequency distribution as a ``depth x width``
    relational table ``(d, bucket, cnt)`` — the mergeable heavy-hitter /
    frequency-estimate structure: estimates never undercount, and the
    overestimate is bounded by ``e * N / width`` with probability
    ``1 - e^{-depth}``.

    Row ``d``'s bucket for a key is ``hash32(d || ':' || key) % width``
    (md5-derived, so any engine reproduces it bit-for-bit). The build is
    ONE partial-aggregated groupBy to ``depth * width`` rows no matter
    how many keys feed it; two sketches built with the same geometry
    merge by summing ``cnt`` per ``(d, bucket)`` — the standing-corpus
    update path at 100 TB. ``weight_col`` aggregates a weight instead
    of the row count (e.g. token occurrences pre-counted per doc).
    """
    key = F.col(key_col).cast("string")
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (hash32(F.concat(F.lit(f"{d}:"), key)) % width)
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_c"),
        w.alias("_w"),
    )
    return (
        rows.groupBy(F.col("_c.d").alias("d"), F.col("_c.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def count_min_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query a :func:`count_min_table`: for each key, the MINIMUM
    over the ``depth`` rows of the counter its hash lands in — the CMS
    frequency estimate, appended as ``cms_estimate``.

    The sketch side is ``depth * width`` rows and BROADCASTS; the key
    side never shuffles. Geometry (depth/width) must match the build.
    """
    key = F.col(key_col).cast("string")
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (hash32(F.concat(F.lit(f"{d}:"), key)) % width)
                        .alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_c"),
    ).select("*", F.col("_c.d").alias("d"), F.col("_c.bucket").alias("bucket"))
    out_cols = [c for c in keys.columns]
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy(*out_cols)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
