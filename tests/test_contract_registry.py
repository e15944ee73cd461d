"""Registry-shape guards for the driver contract (round-2 verdict #9).

The driver checks only the first ``DRIVER_WINDOW`` entries of ``QUERIES``
per round; round 2 silently evicted two green queries by inserting new keys
mid-dict. These tests make that class of drift a CI failure:

- every registered query has a DuckDB oracle OR an explicit rows-only
  annotation (no silently-unverifiable entries);
- every key that still lacks a green driver row sits inside the checked
  window;
- the oracle dict has no orphan entries.
"""

from __future__ import annotations

from open_source_legislation_spark.queries import (
    DRIVER_WINDOW,
    NEVER_DRIVER_VERIFIED,
    ORACLE_SQL,
    QUERIES,
    ROWS_ONLY,
)


def test_every_query_has_oracle_or_rows_only_annotation():
    missing = set(QUERIES) - set(ORACLE_SQL) - ROWS_ONLY
    assert not missing, f"queries lacking an oracle or rows-only tag: {missing}"
    # rows-only is an explicit, minimal list — not a dumping ground
    assert ROWS_ONLY <= set(QUERIES)
    assert not (ROWS_ONLY & set(ORACLE_SQL))


def test_oracle_has_no_orphan_entries():
    orphans = set(ORACLE_SQL) - set(QUERIES)
    assert not orphans, f"oracle entries without a query: {orphans}"


def test_unverified_queries_sit_inside_driver_window():
    order = list(QUERIES)
    positions = {k: i for i, k in enumerate(order)}
    missing = [k for k in NEVER_DRIVER_VERIFIED if k not in positions]
    assert not missing, f"NEVER_DRIVER_VERIFIED keys not registered: {missing}"
    evicted = [
        k for k in NEVER_DRIVER_VERIFIED if positions[k] >= DRIVER_WINDOW
    ]
    assert not evicted, (
        f"queries without a green driver row sit past position "
        f"{DRIVER_WINDOW} and will never be checked: {evicted}"
    )


def test_no_oracle_output_column_is_hugeint():
    """DuckDB ``sum()`` over integers yields HUGEINT; the driver's pandas
    conversion renders HUGEINT as float64, so a Spark BIGINT ``3`` and an
    oracle ``3.000000`` hash-mismatch *only in the driver environment*
    (the sole cause of window_session's three-round red). DECIMAL is the
    same hazard class. Every oracle output column must DESCRIBE to a
    non-hazard type; the hazard list is shared with
    scripts/audit_oracle_types.py (ORACLE_TYPE_HAZARDS) so the two guards
    cannot drift."""
    import duckdb

    from open_source_legislation_spark.queries import (
        ORACLE_TYPE_HAZARDS,
        resolve_oracle_sql,
    )

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    hazards = {}
    for name, sql in resolve_oracle_sql().items():
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        bad = [
            (c, ty)
            for c, ty, *_ in desc
            if any(h in ty.upper() for h in ORACLE_TYPE_HAZARDS)
        ]
        if bad:
            hazards[name] = bad
    assert not hazards, (
        f"hazard-typed oracle outputs (driver float64 trap): {hazards}"
    )
