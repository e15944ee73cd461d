"""Cross-engine TYPE parity audit for every contract query.

The correctness gate hashes FORMATTED values, so a column that is
int-family on one engine and float-family on the other can hash-diverge in
the driver environment even when the numbers are equal (``3`` vs ``3.0``)
— the exact failure class behind the three-round window_session red
(HUGEINT → float64). The DESCRIBE-based HUGEINT/DECIMAL guard catches
DuckDB-side hazards; this audit closes the remaining axis by comparing the
Spark result schema against the DuckDB DESCRIBE per column and flagging
any numeric-class mismatch (int vs float) or missing/misnamed columns.

Schema-only: builds each Spark plan (no execution beyond what plan
construction needs) and DESCRIBEs each oracle.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT",
              "USMALLINT", "UINTEGER", "UBIGINT"}
FLOAT_FAMILY = {"FLOAT", "DOUBLE", "REAL"}


def _duck_class(t: str) -> str:
    t = t.upper()
    if t in INT_FAMILY:
        return "int"
    if t in FLOAT_FAMILY or t.startswith("DECIMAL"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "BOOLEAN":
        return "bool"
    return "other"


def _spark_class(t: str) -> str:
    t = t.lower()
    if t in ("byte", "short", "int", "integer", "long", "bigint", "tinyint",
             "smallint"):
        return "int"
    if t in ("float", "double") or t.startswith("decimal"):
        return "float"
    if t.startswith("timestamp"):
        return "ts"
    if t == "boolean":
        return "bool"
    return "other"


def main(sf_dir: str) -> int:
    import os

    # keep data-dependent oracles (sim_ivf_build) trained on this sf_dir
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from open_source_legislation_spark.session import get_spark

    spark = get_spark(master="local[4]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    flagged = 0
    for name, fn in qs.items():
        if name not in osql:
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-ERR] {name}: {type(e).__name__}: {str(e)[:160]}")
            flagged += 1
            continue
        dtypes = {
            c: t for c, t, *_ in con.sql(f"DESCRIBE ({osql[name]})").fetchall()
        }
        if set(stypes) != set(dtypes):
            print(f"[COLS] {name}: spark={sorted(stypes)} duck={sorted(dtypes)}")
            flagged += 1
            continue
        for c in stypes:
            sc, dc = _spark_class(stypes[c]), _duck_class(dtypes[c])
            if sc != dc:
                print(
                    f"[TYPE] {name}.{c}: spark {stypes[c]} ({sc}) vs "
                    f"duck {dtypes[c]} ({dc})"
                )
                flagged += 1
    print(f"audited {len(osql)} queries, {flagged} flagged")
    spark.stop()
    return flagged


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(1 if main(sf) else 0)
