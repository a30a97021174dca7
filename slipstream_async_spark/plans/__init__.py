from slipstream_async_spark.plans.catalog import oracle_sql, queries

__all__ = ["queries", "oracle_sql"]
