"""Dump .explain('formatted') for named catalog queries to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (all queries when
none named). The optimization-round deliverable: plans/r12/<q>_before.txt
and _after.txt come from running this at the pre- and post-change trees.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from slipstream_async_spark.plans.catalog import queries
    from slipstream_async_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = queries()
    if not names:
        names = list(qs)
    rc = 0
    for n in names:
        try:
            df = qs[n](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            print(f"ok    {n}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {n}: {exc}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
