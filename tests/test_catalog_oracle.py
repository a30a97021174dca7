"""Catalog-vs-DuckDB oracle parity at sf0.001 — the in-repo replica of the
driver's t2 correctness gate (fast subset; tools/check_oracle.py runs the
full comparison at any SF).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            out[c] = col.round(9).map(
                lambda v: f"{v:.9g}" if pd.notna(v) else "NULL"
            )
        else:
            out[c] = col.map(
                lambda v: "NULL" if v is None or v != v else str(v)
            )
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _all_names():
    from slipstream_async_spark.plans.catalog import oracle_sql

    return sorted(oracle_sql())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, name):
    from slipstream_async_spark.plans.catalog import oracle_sql, queries

    spark_df = queries()[name](spark, SF_SMOKE).toPandas()
    duck_df = duck.execute(oracle_sql()[name]).df()
    s, d = _normalize(spark_df), _normalize(duck_df)
    assert list(s.columns) == list(d.columns)
    assert len(s) == len(d), f"{name}: {len(s)} != {len(d)} rows"
    pd.testing.assert_frame_equal(s, d, check_dtype=False)


def test_no_duplicate_module_level_sql_bindings():
    """Guard against oracle-variable shadowing: queries that call
    spark.sql(_VAR) resolve the module global at CALL time, so a later
    redefinition of the same name silently swaps an earlier query's SQL
    (the events_funnel/_FUNNEL collision). Every module-level
    ``_NAME = \"\"\"...\"\"\"`` binding in catalog.py must be unique."""
    import re
    from collections import Counter

    import slipstream_async_spark.plans.catalog as cat

    src = open(cat.__file__).read()
    names = re.findall(r"^(_[A-Z][A-Z0-9_]*) = (?:r?f?\"\"\"|\")", src, re.M)
    dupes = {n: c for n, c in Counter(names).items() if c > 1}
    assert not dupes, f"shadowed module-level SQL bindings: {dupes}"
