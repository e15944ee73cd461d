"""Sources & sinks.

The reference's sources are HTTP/HTML/XML/JSON acquisition plus a Postgres
row sink (SURVEY §2.1); our engine takes *landed* tables as input and writes
analytic tables. Iceberg is the design target (``writeTo(...).append()``,
MERGE INTO for the upsert sink); the sandbox has no Iceberg runtime jar, so
``table_format()`` falls back to parquet with identical schemas and
partitioning — the swap is isolated here (SURVEY §7.4.5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def table_format(spark: SparkSession) -> str:
    """'iceberg' when the runtime + catalog are configured, else 'parquet'."""
    if spark.conf.get("spark.sql.catalog.kg", None):
        return "iceberg"
    return "parquet"


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Schema-enforced transcript scan (never inference — SURVEY §1.3).

    Column pruning + predicate pushdown reach the parquet scan because the
    schema is explicit and the DataFrame is otherwise untouched.
    """
    return spark.read.schema(schemas.TRANSCRIPTS).parquet(path)


def read_toc_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source (SURVEY §2.1 src_toc_file — the
    reference's table-of-contents flat-file reader): ``spark.read.text``
    gives one row per line in column ``value``; parsing stays declarative
    downstream so pruning/pushdown still apply."""
    return spark.read.text(path)


def write_table(
    df: DataFrame,
    base_dir: str,
    name: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> str:
    """Partitioned parquet sink (Iceberg-append analog of the reference's
    ``pydantic_insert`` row loop, utilityFunctions.py:411-454 — one
    partitioned append instead of one INSERT per row)."""
    path = os.path.join(base_dir, name)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path


def upsert_table(
    spark: SparkSession,
    updates: DataFrame,
    base_dir: str,
    name: str,
    key: str,
) -> str:
    """Keyed upsert (reference ``pydantic_upsert``: try insert, on conflict
    update — utilityFunctions.py:582-612). Parquet fallback: anti-join the
    existing rows against update keys, union, rewrite — the same result
    Iceberg ``MERGE INTO`` produces transactionally."""
    path = os.path.join(base_dir, name)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keep = existing.join(updates.select(key), key, "left_anti")
        merged = keep.unionByName(updates)
    else:
        merged = updates
    # materialize before overwrite (parquet has no snapshot isolation)
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(path)
    return path
