"""Benchmark: run the catalog's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect / sink-format cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # The driver parses stdout as JSON, so stdout must carry EXACTLY one
    # line. The JVM child process inherits fd 1 and writes startup noise
    # (log-level banner, Ivy resolution) there — redirect fd 1 to stderr
    # at the OS level for the whole run, then restore it for the final
    # print. Python-level sys.stdout swaps can't catch child-process
    # writes; dup2 does.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        timings, errors, sf_val = _run()
    finally:
        sys.stdout.flush()
        os.dup2(real_stdout, 1)
        os.close(real_stdout)
    payload = {
        "metric": "catalog_total_runtime",
        "value": round(sum(t for t in timings.values() if t is not None), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload, separators=(",", ":")), flush=True)


def _run() -> tuple[dict[str, float | None], dict[str, str], float | str]:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from slipstream_async_spark.plans.catalog import queries
    from slipstream_async_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM once so per-query numbers measure the plan, not
    # first-touch overheads: a real scan + shuffle + codegen compile
    # (count() alone is footer-only and leaves all of that cold).
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Per-query fault isolation: one broken plan must not zero out the
    # other ~100 measurements (round-2 lesson — a single plan-time
    # AnalysisException aborted the whole run with rc=1 and no timings).
    import gc

    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(queries().items()):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
        finally:
            # Three leaks would otherwise accrue across 100+ measurements
            # and tax later queries with multi-second GC debt (measured):
            # cached tables (cache() holds STRONG refs in the
            # CacheManager — never GC-reclaimed; the dedup family caches
            # its shingle-set table per query), JVM-side localCheckpoint
            # blocks pinned by live py4j refs, and dead broadcast/shuffle
            # state awaiting a GC-triggered ContextCleaner sweep. Clear
            # all three OUTSIDE the measured windows — on the failure
            # path too, where a half-built query may have cached already.
            spark.catalog.clearCache()
            gc.collect()
            if (i + 1) % 10 == 0:
                spark.sparkContext._jvm.System.gc()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    return timings, errors, sf_val


if __name__ == "__main__":
    main()
