"""End-to-end triple P/R vs the oracle — the correctness gate
(BASELINE.json: P/R >= 0.95 on the (subj, pred, obj) set)."""

import pytest

from open_source_legislation_spark import oracle
from open_source_legislation_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pipeline_result(spark, transcripts_df, entity_dict_df, alias_edges_df):
    return run_pipeline(spark, transcripts_df, entity_dict_df, alias_edges=alias_edges_df)


@pytest.fixture(scope="module")
def oracle_result(transcripts_pd, entity_dict_pd, alias_edges_pd):
    o = oracle.run_oracle(transcripts_pd, entity_dict_pd)
    cc = oracle.connected_components(alias_edges_pd)
    exp = set(
        map(tuple, o["triples"][["subj", "pred", "obj"]].itertuples(index=False))
    )
    exp |= {(m, "alias_of", c) for m, c in cc.items() if m != c}
    return o, exp


def test_triple_precision_recall(pipeline_result, oracle_result):
    _, exp = oracle_result
    got = set(
        map(tuple, pipeline_result.triples.select("subj", "pred", "obj").collect())
    )
    p, r = oracle.precision_recall(got, exp)
    assert p >= 0.95, f"precision {p:.4f} < 0.95 (|got|={len(got)}, |exp|={len(exp)})"
    assert r >= 0.95, f"recall {r:.4f} < 0.95"


def test_all_predicates_exercised(pipeline_result):
    preds = {
        r["pred"]
        for r in pipeline_result.triples.select("pred").distinct().collect()
    }
    # the full FIXTURES.md §4 predicate vocabulary must appear
    assert preds == {
        "child_of",
        "cites",
        "defined_as",
        "defined_in_scope",
        "alias_of",
        "addendum",
        "subdefinition_of",
    }


def test_nodes_match_oracle(pipeline_result, oracle_result):
    o, _ = oracle_result
    got = {
        (r["node_id"], r["level_classifier"], r["parent"], r["status"])
        for r in pipeline_result.nodes.collect()
    }
    exp = {
        (r.node_id, r.level_classifier, None if r.parent != r.parent else r.parent, r.status)
        for r in o["nodes"][["node_id", "level_classifier", "parent", "status"]].itertuples(
            index=False
        )
    }
    assert got == exp


def test_provenance_present(pipeline_result):
    from pyspark.sql import functions as F

    no_prov = pipeline_result.triples.filter(
        F.col("conv_id").isNull() & (F.col("pred") != "alias_of")
    ).count()
    assert no_prov == 0
