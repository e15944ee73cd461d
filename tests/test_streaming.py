"""Structured-Streaming incremental front-end: AvailableNow pass over landed
files produces triples; a second pass over the same files is a no-op
(exactly-once via the stream checkpoint)."""

import os

from open_source_legislation_spark import schemas, synth
from open_source_legislation_spark.streaming.incremental import incremental_extract


def test_available_now_incremental(spark, entity_dict_df, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    t = synth.make_transcripts(seed=3, n_turns_target=300)
    spark.createDataFrame(t, schema=schemas.TRANSCRIPTS).write.mode(
        "overwrite"
    ).parquet(in_dir)

    incremental_extract(spark, in_dir, entity_dict_df, out_dir)
    triples_dir = os.path.join(out_dir, "triples")
    n1 = spark.read.parquet(triples_dir).count()
    assert n1 > 0

    # second AvailableNow pass: no new files → no new rows
    incremental_extract(spark, in_dir, entity_dict_df, out_dir)
    n2 = spark.read.parquet(triples_dir).count()
    assert n2 == n1


def test_tumbling_window_agg_emits_only_watermark_closed_windows(
    spark, tmp_path_factory
):
    """Append mode emits a window only once the final watermark (max event
    time − delay) passes its END: with events in two 1-day windows and the
    last event 30 minutes into day 2, a 1-hour watermark closes day 1 but
    NOT day 2 — day 2's rows stay in (evicted) state, never emitted."""
    import uuid

    from open_source_legislation_spark.streaming.incremental import (
        tumbling_window_agg,
    )

    in_dir = str(tmp_path_factory.mktemp("tw_in"))
    ck_dir = str(tmp_path_factory.mktemp("tw_ck"))
    rows = [
        (1, "2024-03-01 10:00:00", "a", 1.25),
        (2, "2024-03-01 23:30:00", "a", 2.50),
        (3, "2024-03-01 12:00:00", "b", 4.00),
        # max ts 02:00 → final watermark 01:00 ≥ day-1 window end (00:00):
        # day 1 closes; day 2's own window (ends 03-03) stays open
        (4, "2024-03-02 02:00:00", "a", 8.00),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "value"
    ).write.mode("overwrite").parquet(in_dir)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(in_dir)
    sink = f"tw_test_{uuid.uuid4().hex[:6]}"
    q = (
        tumbling_window_agg(stream, window="1 day", watermark="1 hour")
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    out = {
        (str(r["wstart"]), r["event_type"]): (r["n_events"], r["cents"])
        for r in spark.table(sink).collect()
    }
    # day-1 windows emitted with exact integer cents; day-2 window absent
    assert out == {
        ("2024-03-01 00:00:00", "a"): (2, 375),
        ("2024-03-01 00:00:00", "b"): (1, 400),
    }
