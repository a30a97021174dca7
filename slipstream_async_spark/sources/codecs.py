"""Codecs: serialization at the byte/string boundary.

Reference: ``JsonCodec`` encodes/decodes message values
(slipstream/codecs.py:9-28) and ``Topic`` auto str-encodes/decodes keys
(slipstream/core.py:462-467, 507-514). In Spark the codec boundary is a
column expression — JVM-side, codegen'd, no per-record Python:

- decode: ``from_json(col.cast("string"), schema)`` or ``get_json_object``
  for single-path extraction;
- encode: ``to_json(struct(...))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_decode(col: Column | str, schema) -> Column:
    """Decode a JSON string/binary column into a struct column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c.cast("string"), schema)


def json_encode(*cols) -> Column:
    """Encode columns into a JSON string column (JsonCodec.encode analog)."""
    return F.to_json(F.struct(*cols))


def json_get(col: Column | str, path: str) -> Column:
    """Single-path JSON extraction (cheaper than full from_json)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{path}")
