"""Registry-wide physical-plan guards.

Two anti-patterns kill 100 TB scale and are invisible to value-level
checks: an accidental CartesianProduct (a join predicate that stopped
being an equi-join) and a row-at-a-time Python UDF (BatchEvalPython)
slipping into a hot path. This test builds the physical plan of EVERY
registered contract query at sf0.001 and asserts neither appears —
so a future edit that degrades a plan fails CI even while its values
stay correct.
"""

from __future__ import annotations

import os

import pytest

from open_source_legislation_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Queries with side effects at construction time (streams run to
# completion, sinks write) — their plans are covered by their own
# operator tests; executing them all here would triple the suite's wall.
_SIDE_EFFECTING = {
    "stream_sessionize",
    "stream_window_agg",
    "stream_dedup",
    "snk_parquet_roundtrip",
    "snk_upsert_merge",
    "snk_snapshot_travel",
    "src_toc_file",
    "sim_ivf_build",  # k-means train collects centroids while building
}

# The documents corpus is tiny at sf0.001; AQE may broadcast either side —
# both fine. What must NEVER appear:
_FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/region.parquet"), reason="driver testdata absent"
)
def test_no_cartesian_or_row_python_in_any_registered_plan(spark):
    bad: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        if name in _SIDE_EFFECTING:
            continue
        df = fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [pat for pat in _FORBIDDEN if pat in plan]
        if hits:
            bad[name] = hits
    assert not bad, f"scale anti-patterns in plans: {bad}"
