"""Bucketed range join: exact containment semantics, no cross product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_source_legislation_spark.operators import rangejoin


def _brute(intervals, points):
    return {
        (i, p)
        for i, lo, hi in intervals
        for p, x in points
        if lo <= x < hi
    }


def test_range_join_matches_bruteforce_across_bucket_boundaries(spark):
    # interval widths straddle the bucket width (16): sub-bucket, exact
    # multiple, and multi-bucket; points sit ON bucket and interval edges
    intervals = [(1, 0, 5), (2, 10, 26), (3, 16, 32), (4, 7, 100), (5, 40, 40)]
    points = [(100, 0), (101, 4), (102, 5), (103, 15), (104, 16),
              (105, 25), (106, 26), (107, 31), (108, 32), (109, 99), (110, 100)]
    iv = spark.createDataFrame(intervals, "iid long, lo long, hi long")
    pt = spark.createDataFrame(points, "pid long, x long")
    out = rangejoin.range_join_points(iv, pt, bucket_width=16)
    got = {(r.iid, r.pid) for r in out.collect()}
    assert got == _brute(intervals, points)
    # the empty interval (5) matched nothing
    assert not any(i == 5 for i, _ in got)


def test_range_join_plan_has_no_cartesian(spark):
    iv = spark.createDataFrame([(1, 0, 5)], "iid long, lo long, hi long")
    pt = spark.createDataFrame([(9, 3)], "pid long, x long")
    plan = (
        rangejoin.range_join_points(iv, pt)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_width_guard(spark):
    iv = spark.createDataFrame([(1, 0, 1000)], "iid long, lo long, hi long")
    pt = spark.createDataFrame([(9, 3)], "pid long, x long")
    # the guard is lazy (in-plan assert_true): plan construction costs no
    # input scan; the raise surfaces when the plan executes
    out = rangejoin.range_join_points(iv, pt, max_interval_width=64)
    with pytest.raises(Exception, match="wider"):
        out.collect()
    # a conforming input flows through the guarded plan unchanged
    ok = rangejoin.range_join_points(iv, pt, max_interval_width=2000)
    assert {(r.iid, r.pid) for r in ok.collect()} == {(1, 9)}


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "k1", 10), (2, "k1", 5), (3, "k1", 4), (4, "k2", 7), (5, "k3", 1)],
        "event_id long, key string, ts long",
    )
    right = spark.createDataFrame(
        [("k1", 5, 100), ("k1", 9, 200), ("k1", 11, 300),
         ("k2", 7, 400), ("k2", 8, 500)],
        "key string, ts long, quote long",
    )
    out = rangejoin.asof_join_backward(
        left, right, on="key", left_ts="ts", right_ts="ts", payload=["quote"]
    )
    rows = sorted((r.event_id, r.quote) for r in out.collect())
    # backward-INCLUSIVE: event 4 at ts=7 matches the quote AT ts=7;
    # events 3 and 5 precede every quote in their group -> NULL
    assert rows == [(1, 200), (2, 100), (3, None), (4, 400), (5, None)]


def test_asof_join_equal_ts_tiebreak_and_collision_guard(spark):
    left = spark.createDataFrame([(1, "k1", 10)], "event_id long, key string, ts long")
    right = spark.createDataFrame(
        [("k1", 5, 100), ("k1", 5, 150)], "key string, ts long, quote long"
    )
    out = rangejoin.asof_join_backward(left, right, on="key", payload=["quote"])
    assert out.collect()[0].quote == 150  # greatest payload wins the tie
    bad_left = left.withColumnRenamed("event_id", "quote")
    with pytest.raises(ValueError, match="collides"):
        rangejoin.asof_join_backward(bad_left, right, on="key", payload=["quote"])


def test_asof_join_is_single_exchange(spark):
    """The whole point vs an inequality join: ONE shuffle on the key,
    no join operator at all in the physical plan."""
    left = spark.createDataFrame([(1, "k1", 10)], "event_id long, key string, ts long")
    right = spark.createDataFrame([("k1", 5, 100)], "key string, ts long, quote long")
    plan = (
        rangejoin.asof_join_backward(left, right, on="key", payload=["quote"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    assert "Join" not in plan  # union + window, not a join at all
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_null_keys_never_match(spark):
    """JOIN semantics for NULLs: a NULL key matches nothing (the window
    partition would otherwise group NULL keys together and fabricate a
    match the SQL oracle never produces)."""
    left = spark.createDataFrame(
        [(1, None, 10), (2, "k1", 10)], "event_id long, key string, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 100), ("k1", 5, 200)], "key string, ts long, quote long"
    )
    out = {
        r.event_id: r.quote
        for r in rangejoin.asof_join_backward(
            left, right, on="key", payload=["quote"]
        ).collect()
    }
    assert out == {1: None, 2: 200}


def test_asof_join_reserved_name_guard(spark):
    left = spark.createDataFrame(
        [(1, "k1", 10, 0)], "event_id long, key string, ts long, _asof_ts long"
    )
    right = spark.createDataFrame([("k1", 5, 100)], "key string, ts long, quote long")
    with pytest.raises(ValueError, match="reserved"):
        rangejoin.asof_join_backward(left, right, on="key", payload=["quote"])


def test_interval_overlap_join_matches_bruteforce(spark):
    import random

    rng = random.Random(5)
    L = [(i, lo, lo + rng.randrange(0, 40)) for i, lo in
         ((i, rng.randrange(100)) for i in range(40))]
    R = [(100 + i, lo, lo + rng.randrange(0, 40)) for i, lo in
         ((i, rng.randrange(100)) for i in range(40))]
    l = spark.createDataFrame(L, "lid long, llo long, lhi long")
    r = spark.createDataFrame(R, "rid long, rlo long, rhi long")
    out = rangejoin.interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", bucket_width=16
    )
    got = sorted((row.lid, row.rid) for row in out.collect())
    brute = sorted(
        (li, ri)
        for li, llo, lhi in L
        for ri, rlo, rhi in R
        if llo < rhi and rlo < lhi and lhi > llo and rhi > rlo
    )
    assert got == brute
    # canonical-bucket emission: exactly once per pair, no dedup shuffle
    assert len(got) == len(set(got))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_interval_overlap_join_rejects_column_clash(spark):
    l = spark.createDataFrame([(1, 0, 5)], "id long, lo long, hi long")
    r = spark.createDataFrame([(2, 3, 9)], "id long, rlo long, rhi long")
    with pytest.raises(ValueError, match="disjoint"):
        rangejoin.interval_overlap_join(l, r, "lo", "hi", "rlo", "rhi")


def test_bucket_math_exact_past_double_precision(spark):
    """Bucket ids use exact integer floor division: coordinates past 2^53
    (nanosecond-epoch scale) and negative coordinates must not mis-bucket,
    which would silently drop overlapping pairs."""
    base = 4_611_686_018_427_387_900  # ~4.6e18, far past 2^53
    l = spark.createDataFrame(
        [(1, base, base + 10), (2, -40, -20)], "lid long, llo long, lhi long"
    )
    r = spark.createDataFrame(
        [(9, base + 5, base + 30), (8, -25, -10)], "rid long, rlo long, rhi long"
    )
    out = rangejoin.interval_overlap_join(l, r, "llo", "lhi", "rlo", "rhi")
    assert {(x.lid, x.rid) for x in out.collect()} == {(1, 9), (2, 8)}
    pts = spark.createDataFrame([(7, base + 3)], "pid long, x long")
    iv = l.withColumnRenamed("llo", "lo").withColumnRenamed("lhi", "hi")
    got = rangejoin.range_join_points(iv, pts)
    assert {(x.lid, x.pid) for x in got.collect()} == {(1, 7)}


def test_interval_overlap_width_guard_and_reserved(spark):
    l = spark.createDataFrame([(1, 0, 1000)], "lid long, llo long, lhi long")
    r = spark.createDataFrame([(9, 3, 9)], "rid long, rlo long, rhi long")
    out = rangejoin.interval_overlap_join(
        l, r, "llo", "lhi", "rlo", "rhi", max_interval_width=64
    )
    with pytest.raises(Exception, match="wider"):
        out.collect()
    bad = l.withColumnRenamed("lid", "_bucket")
    with pytest.raises(ValueError, match="reserved"):
        rangejoin.interval_overlap_join(bad, r, "llo", "lhi", "rlo", "rhi")


def test_asof_join_null_right_ts_never_matches(spark):
    """SQL semantics: `r.ts <= l.ts` is NULL (no match) when right_ts is
    NULL. NULLS-FIRST window ordering would otherwise place the NULL-ts
    row BEFORE every left row, handing its payload to left rows with no
    genuine earlier quote."""
    left = spark.createDataFrame(
        [(1, "k1", 5), (2, "k1", 20)], "event_id long, key string, ts long"
    )
    right = spark.createDataFrame(
        [("k1", None, 99), ("k1", 10, 200)], "key string, ts long, quote long"
    )
    out = {
        r.event_id: r.quote
        for r in rangejoin.asof_join_backward(
            left, right, on="key", payload=["quote"]
        ).collect()
    }
    # event 1 has no genuine earlier quote -> NULL, never the NULL-ts 99
    assert out == {1: None, 2: 200}


def test_fractional_coordinates_floor_not_truncate(spark):
    """A bare cast('long') truncates toward zero: lo=-0.5 would bucket to
    0 instead of -1 and the bucket equi-join would silently drop the pair
    before the exact-predicate recheck. floor() before the cast keeps
    double coordinates exact."""
    iv = spark.createDataFrame([(1, -0.5, 3.5)], "iid long, lo double, hi double")
    pt = spark.createDataFrame([(7, -0.25), (8, 3.25), (9, 3.75)],
                               "pid long, x double")
    out = rangejoin.range_join_points(iv, pt, bucket_width=16)
    assert {(r.iid, r.pid) for r in out.collect()} == {(1, 7), (1, 8)}
    l = spark.createDataFrame([(1, -0.5, 0.5)], "lid long, llo double, lhi double")
    r = spark.createDataFrame([(9, -0.25, 0.25)], "rid long, rlo double, rhi double")
    got = rangejoin.interval_overlap_join(l, r, "llo", "lhi", "rlo", "rhi")
    assert {(x.lid, x.rid) for x in got.collect()} == {(1, 9)}


def test_fractional_upper_bound_covers_last_bucket(spark):
    """The review-round repro: hi in (k*B, k*B+1) must still explode
    bucket k — _floor_bucket(hi - 1) lost it for fractional bounds and
    silently dropped every match in the final bucket."""
    iv = spark.createDataFrame([(1, 0.0, 16.5)], "iid long, lo double, hi double")
    pt = spark.createDataFrame(
        [(7, 7.0), (8, 16.25), (9, 16.5), (10, 16.75)], "pid long, x double"
    )
    out = rangejoin.range_join_points(iv, pt, bucket_width=16)
    assert {(r.iid, r.pid) for r in out.collect()} == {(1, 7), (1, 8)}

    l = spark.createDataFrame([(1, 0.0, 16.5)], "lid long, llo double, lhi double")
    r = spark.createDataFrame(
        [(9, 16.25, 17.0), (10, 16.5, 17.0)], "rid long, rlo double, rhi double"
    )
    got = rangejoin.interval_overlap_join(l, r, "llo", "lhi", "rlo", "rhi")
    assert {(x.lid, x.rid) for x in got.collect()} == {(1, 9)}

    # integral bounds unchanged: hi exactly on a bucket edge stops at k-1
    iv2 = spark.createDataFrame([(2, 0, 32)], "iid long, lo long, hi long")
    pt2 = spark.createDataFrame([(5, 31), (6, 32)], "pid long, x long")
    out2 = rangejoin.range_join_points(iv2, pt2, bucket_width=16)
    assert {(r.iid, r.pid) for r in out2.collect()} == {(2, 5)}


def test_bucketed_joins_match_bruteforce_on_random_fractionals(spark):
    """Seeded randomized brute-force: fractional lo/hi/x across many
    bucket boundaries — the class of input where the integral-only upper
    bucket silently dropped final-bucket matches."""
    import itertools
    import random

    random.seed(11)
    L = [(i, round(random.uniform(-40, 40), 2)) for i in range(30)]
    L = [(i, lo, round(lo + random.uniform(0.01, 35), 2)) for i, lo in L]
    R = [(i, round(random.uniform(-40, 40), 2)) for i in range(30)]
    R = [(i, lo, round(lo + random.uniform(0.01, 35), 2)) for i, lo in R]
    l = spark.createDataFrame(L, "lid long, llo double, lhi double")
    r = spark.createDataFrame(R, "rid long, rlo double, rhi double")
    got = {
        (x.lid, x.rid)
        for x in rangejoin.interval_overlap_join(
            l, r, "llo", "lhi", "rlo", "rhi",
            bucket_width=16, max_interval_width=64,
        ).collect()
    }
    exp = {
        (a, b)
        for (a, alo, ahi), (b, blo, bhi) in itertools.product(L, R)
        if alo < bhi and blo < ahi
    }
    assert got == exp

    P = [(i, round(random.uniform(-45, 45), 2)) for i in range(100)]
    p = spark.createDataFrame(P, "pid long, x double")
    got2 = {
        (x.lid, x.pid)
        for x in rangejoin.range_join_points(
            l, p, "llo", "lhi", "x", bucket_width=16, max_interval_width=64
        ).collect()
    }
    exp2 = {
        (a, i)
        for (a, alo, ahi), (i, x) in itertools.product(L, P)
        if alo <= x < ahi
    }
    assert got2 == exp2
