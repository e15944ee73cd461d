"""Local stand-in for the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, column names, and an order-insensitive value hash."""

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


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def frame_summary(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return sorted_cols, len(rows), h, lines


def main(sf_dir: str, only: list[str]) -> int:
    import os

    # data-dependent oracles (sim_ivf_build's trained centroids) must be
    # resolved against the SAME directory the Spark side reads
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    import __spark_entry__ as entrymod
    from open_source_legislation_spark.session import get_spark

    spark = get_spark(master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = None
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-ERR] {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        finally:
            # operators that cache an intermediate (triangle_counts'
            # oriented edges) hand the persisted frames over on the result;
            # release them so a full sweep doesn't accumulate caches
            for cached in getattr(sdf, "_osl_persists", []):
                cached.unpersist()
        if name not in osql:
            print(f"[ROWS-ONLY] {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(osql[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[DUCK-ERR]  {name}: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        sc, sn, sh, sl = frame_summary(scols, srows)
        dc, dn, dh, dl = frame_summary(dcols, drows)
        status = "OK" if (sc == dc and sn == dn and sh == dh) else "MISMATCH"
        if status == "MISMATCH":
            failures += 1
            print(f"[{status}] {name}: spark({sn} rows, {sc}) duck({dn} rows, {dc})")
            sset, dset = set(sl), set(dl)
            for line in sorted(sset - dset)[:3]:
                print(f"   spark-only: {line[:160]}")
            for line in sorted(dset - sset)[:3]:
                print(f"   duck-only:  {line[:160]}")
        else:
            print(f"[OK] {name}: {sn} rows")
    spark.stop()
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    raise SystemExit(1 if main(sf, only) else 0)
