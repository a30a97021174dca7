"""Time a subset of catalog queries with bench.py's methodology (noop
sink, min over repeats, warmup) without running all 336.

Usage: python tools/bench_subset.py [--runs N] query [query ...]
Prints one JSON line {"queries": {name: min_sec}, "runs": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs_n = 3
    if args and args[0] == "--runs":
        runs_n = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from slipstream_async_spark.plans.catalog import queries
    from slipstream_async_spark.session import get_spark

    spark = get_spark("bench-subset")
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    try:
        import pyarrow  # noqa: F401

        spark.range(8).toPandas()
        df1 = spark.range(8)
        df1.mapInArrow(lambda it: it, df1.schema).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001
        pass

    import gc

    qs = queries()
    timings: dict[str, float] = {}
    runs_all: dict[str, list[float]] = {}
    for n in names:
        runs: list[float] = []
        for _ in range(runs_n):
            t0 = time.time()
            qs[n](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            gc.collect()
        timings[n] = min(runs)
        runs_all[n] = runs
    print(json.dumps({"queries": timings, "runs": runs_all}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
