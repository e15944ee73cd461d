"""Audit oracle_sql() result types for driver-conversion hazards.

DuckDB's ``sum()`` over integers yields HUGEINT (INT128). ``fetchall()``
converts HUGEINT to Python int (what scripts/check_contract.py uses), but a
pandas ``.df()`` conversion — the driver's path — turns HUGEINT into
float64, so a Spark BIGINT ``3`` hashes as ``3`` while the oracle hashes as
``3.000000``: a hash mismatch that only exists in the driver environment.
This script DESCRIBEs every oracle query and flags any output column whose
type is HUGEINT/UHUGEINT (or any other type pandas would not round-trip to
the Spark-side dtype).
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

def main(sf_dir: str) -> int:
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod

    # single source of truth, shared with tests/test_contract_registry.py
    # (the two hazard lists drifted once: DECIMAL landed only in the test)
    from open_source_legislation_spark.queries import (
        ORACLE_TYPE_HAZARDS as HAZARDS,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    flagged = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[ERR] {name}: {type(e).__name__}: {str(e)[:200]}")
            flagged += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(h in t.upper() for h in HAZARDS)]
        if bad:
            flagged += 1
            print(f"[HAZARD] {name}: {bad}")
    print(f"audited {len(entrymod.oracle_sql())} oracles, {flagged} flagged")
    return flagged


if __name__ == "__main__":
    raise SystemExit(1 if main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01") else 0)
