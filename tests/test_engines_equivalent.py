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
