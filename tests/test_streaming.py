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
