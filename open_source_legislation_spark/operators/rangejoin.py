"""Range (interval-containment) join — a join shape Spark has no native
operator for, composed from existing DataFrame ops (the task's canonical
"custom operator" case alongside the as-of join in
``extract.derive_nodes``'s window formulation).

Naive formulations become a ``CartesianProduct`` + filter (Catalyst cannot
equi-plan ``lo <= x AND x < hi``) — quadratic at scale. The bucketed
composition keeps it an EQUI-join:

1. pick a bucket width ``B`` (≈ median interval width);
2. each interval ``[lo, hi)`` explodes to its covered bucket ids
   ``floor(lo/B) .. floor((hi-1)/B)`` — ``explode(sequence(...))``,
   JVM-side;
3. each point ``x`` maps to the single bucket ``floor(x/B)``;
4. shuffle hash join on the bucket id, then re-check the exact predicate.

Shuffle volume is ``points + intervals × avg_width/B`` (bounded by the
width cap), never ``points × intervals``. Skewed buckets (a popular value
range) are ordinary hash-join skew — AQE's skew-join split applies, unlike
a cross product. This is the standard bucketed range-join strategy
(Spark's own SQL guide documents the same shape for range conditions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_points(
    intervals: DataFrame,
    points: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    x_col: str = "x",
    bucket_width: int = 16,
    max_interval_width: int | None = None,
) -> DataFrame:
    """Inner-join ``points`` to every interval containing them
    (``lo <= x < hi``), as a bucketed equi-join.

    ``max_interval_width`` guards the explode: an interval wider than it
    raises rather than silently exploding unbounded bucket rows (at scale
    a single giant interval would otherwise fan out to millions of rows —
    split such intervals upstream or raise the width).

    Output: all columns of ``intervals`` + all columns of ``points``.
    """
    b = F.lit(bucket_width)
    # empty intervals ([lo, lo)) match nothing; dropping them also keeps
    # sequence() ascending (Spark generates a DESCENDING sequence when
    # start > stop, which would fabricate buckets)
    intervals = intervals.filter(F.col(hi_col) > F.col(lo_col))
    lo_bucket = F.floor(F.col(lo_col) / b)
    if max_interval_width is not None:
        # lazy in-plan guard: assert_true raises AT EXECUTION on the first
        # too-wide interval instead of paying an eager full scan of
        # `intervals` at plan-construction time (an entire extra input
        # pass at scale). Folded into the bucket expression (NULL + 0 when
        # the assert passes) so column pruning cannot drop it.
        lo_bucket = lo_bucket + F.coalesce(
            F.assert_true(
                (F.col(hi_col) - F.col(lo_col)) <= max_interval_width,
                F.lit(
                    f"range_join_points: interval wider than "
                    f"max_interval_width={max_interval_width}; split it "
                    f"upstream"
                ),
            ).cast("long"),
            F.lit(0),
        )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                lo_bucket,
                F.floor((F.col(hi_col) - 1) / b),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(x_col) / b))
    return (
        iv.join(pt, "_bucket")
        .filter((F.col(lo_col) <= F.col(x_col)) & (F.col(x_col) < F.col(hi_col)))
        .drop("_bucket")
    )
