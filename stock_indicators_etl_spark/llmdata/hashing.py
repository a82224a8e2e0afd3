"""The one portable-hash convention shared by the llmdata surface.

Spark ``hash()`` ≠ DuckDB ``hash()``, so every cross-engine-checkable
operator hashes through md5. ``h56`` is the load-bearing 56-bit form:
the first 14 md5 hex digits, exact in a BIGINT in both engines. The
dedup family (shingle keys), sampling (membership / layout order),
and containment all use THIS function — changing the convention here
changes it everywhere, including the inlined SQL-oracle expression
``CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2^56 — the hash domain of a 14-hex-digit md5 prefix.
HASH_DOMAIN = 1 << 56


def h56(c: Column) -> Column:
    """56-bit uniform hash of a string-able column, identical in Spark
    and DuckDB (see module docstring for the SQL twin)."""
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("long")
