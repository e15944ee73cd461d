"""The two derive engines — declarative window cascade vs streaming
stack-machine kernel — must produce identical derived frames and identical
triples on every input (duplicates, hot-conversation skew, dirty text)."""

from __future__ import annotations

from open_source_legislation_spark import schemas, synth
from open_source_legislation_spark.plans.pipeline import run_pipeline

_COLS = [
    "conv_id",
    "turn_idx",
    "ord",
    "clean_text",
    "node_id",
    "node_raw_id",
    "node_parent",
    "level_classifier",
    "node_name",
    "node_status",
    "current_node",
    "in_defs_scope",
]


def _frames(spark, entity_dict_df, pdf):
    tdf = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
    out = {}
    for eng in ("stream", "windows"):
        res = run_pipeline(spark, tdf, entity_dict_df, engine=eng)
        out[eng] = (
            set(map(tuple, res.turns.select(*_COLS).collect())),
            set(map(tuple, res.triples.select("subj", "pred", "obj").collect())),
        )
        res.cleanup()
    return out


def test_engines_equivalent_base(spark, entity_dict_df):
    pdf = synth.make_transcripts(seed=13, n_turns_target=900)
    out = _frames(spark, entity_dict_df, pdf)
    assert out["stream"][0] == out["windows"][0]
    assert out["stream"][1] == out["windows"][1]
    assert out["stream"][1]  # non-empty


def test_engines_equivalent_skewed_dups(spark, entity_dict_df):
    pdf = synth.make_transcripts(
        seed=99, n_turns_target=1500, hot_fraction=0.35, dup_fraction=0.08
    )
    out = _frames(spark, entity_dict_df, pdf)
    assert out["stream"][0] == out["windows"][0]
    assert out["stream"][1] == out["windows"][1]


def test_sharded_engine_equivalent_on_giant_conv(spark, entity_dict_df):
    """One conversation ≫ shard size: the (conv_id, turn_range) sharded
    engine — shards in different tasks, boundary state (stack, id counts,
    open node, defs scope, ordinals) stitched across rounds — must be
    bit-identical to the single-task kernel."""
    from pyspark.sql import functions as F

    from open_source_legislation_spark.operators import extract

    # 45% of all turns in one conversation, duplicates included, with a
    # shard size small enough that the hot conv spans many shards AND tiny
    # Arrow batches so shards also span batch boundaries internally
    pdf = synth.make_transcripts(
        seed=31, n_turns_target=1200, hot_fraction=0.45, dup_fraction=0.06
    )
    tdf = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        base = set(
            map(
                tuple,
                extract.derive_nodes_stream(tdf, num_partitions=4)
                .select(*_COLS)
                .collect(),
            )
        )
        sharded_df = extract.derive_nodes_sharded(
            tdf, shard_turns=60, num_partitions=4
        )
        sharded = set(map(tuple, sharded_df.select(*_COLS).collect()))
    finally:
        spark.conf.set(key, old)
    assert sharded == base
    # the giant conv really was split: >1 turn-range bucket existed
    hot = pdf.groupby("conv_id").size().idxmax()
    assert pdf[pdf.conv_id == hot].turn_idx.max() >= 120
    # no sentinel rows leak into the output
    assert not any(r[4] == extract._SHARD_STATE for r in sharded)


def test_sharded_engine_noop_below_knob(spark, entity_dict_df):
    """No conversation reaches the knob → identical plan path (falls back
    to the single-pass engine), identical output."""
    from open_source_legislation_spark.operators import extract

    pdf = synth.make_transcripts(seed=5, n_turns_target=400)
    tdf = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
    base = set(
        map(tuple, extract.derive_nodes_stream(tdf).select(*_COLS).collect())
    )
    sharded = set(
        map(
            tuple,
            extract.derive_nodes_sharded(tdf, shard_turns=10_000_000)
            .select(*_COLS)
            .collect(),
        )
    )
    assert sharded == base


def test_stream_engine_partitioning_invariant(spark, entity_dict_df):
    """Output must not depend on the partition count (state stitching across
    Arrow batches and partition boundaries)."""
    pdf = synth.make_transcripts(seed=5, n_turns_target=700)
    tdf = spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS)
    # tiny Arrow batches force conversations to span batch boundaries inside
    # a partition — the kernel's cross-batch state carry must be exact
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "64")
    try:
        base = None
        for nparts in (1, 3, 16):
            res = run_pipeline(
                spark, tdf, entity_dict_df, num_partitions=nparts, engine="stream"
            )
            got = set(
                map(tuple, res.triples.select("subj", "pred", "obj").collect())
            )
            res.cleanup()
            if base is None:
                base = got
            else:
                assert got == base, f"partition count {nparts} changed the output"
    finally:
        spark.conf.set(key, old)
