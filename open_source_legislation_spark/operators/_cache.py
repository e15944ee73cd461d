"""Shared caching idiom for operator-internal materializations.

Operators that must evaluate an intermediate more than once persist it
DISK_ONLY — in-memory columnar encoding competes with shuffles for heap
while a same-job disk cache rides the OS page cache (SCALE.md, derived-
frame materialization) — and hand the live handles to the caller on the
result DataFrame as ``_osl_persists`` for release after consumption.
One definition so a storage-policy change lands everywhere at once.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def persist_disk(df: DataFrame) -> DataFrame:
    return df.persist(StorageLevel.DISK_ONLY)
