"""Definition-scope closure + phase-3 relationship columns.

Covers the round-3 pipeline additions against the pure-Python oracle:

- ``PipelineResult.applicable_defs`` — the fetch_definitions ancestor walk
  (reference pydanticModels.py:654-757): closest scope wins, incorporated
  hub entries merge with dict-overwrite precedence, unresolved pointers
  only surface when no in-corpus definition exists anywhere in the walk;
- ``direct_children`` / ``siblings`` / ``incoming_references`` on the nodes
  output (reference phase-3 relationship update, CLAUDE.md:171-174).
"""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from open_source_legislation_spark import oracle, schemas
from open_source_legislation_spark.plans.pipeline import run_pipeline

_TS = datetime.datetime(2024, 1, 1)


def _mk_transcripts(rows: list[tuple[str, int, str]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": ["assistant"] * len(rows),
            "text": [r[2] for r in rows],
            "tool": [None] * len(rows),
            "ts": [_TS] * len(rows),
        }
    )


def _collect_closure(df) -> set[tuple]:
    return {
        (r.node_id, r.term, r.definition, r.def_scope, r.src, r.hub, r.depth)
        for r in df.collect()
    }


def _oracle_closure(pdf: pd.DataFrame) -> set[tuple]:
    out = set()
    for r in pdf.itertuples(index=False):
        out.add(
            (r.node_id, r.term, r.definition, r.def_scope, r.src, r.hub, r.depth)
        )
    return out


def test_applicable_defs_matches_oracle_on_synth(
    spark, transcripts_df, entity_dict_df, transcripts_pd, entity_dict_pd
):
    res = run_pipeline(spark, transcripts_df, entity_dict_df)
    o = oracle.run_oracle(transcripts_pd, entity_dict_pd)
    got = _collect_closure(res.applicable_defs)
    exp = _oracle_closure(o["applicable_defs"])
    assert got == exp
    # non-vacuous: local defs exist and nodes inherit from ancestor scopes
    # (every incorporated term in this seed also has a local definition in
    # scope, so local wins — the incorporated paths are pinned by the hub
    # fixture below)
    assert any(t[4] == "local" for t in got)
    assert any(t[6] < len(t[0].split("/")) for t in got)  # inherited rows
    res.cleanup()


# in-corpus hub: conv A's title-9 node locally defines “Widget”; conv B
# incorporates it via a citation the entity dictionary resolves to that
# exact node id. Also pins closest-scope-wins (section-level override).
_HUB_ROWS = [
    ("A", 0, "Title 9. Hub provisions"),
    ("A", 1, "Definitions. As used in this part:"),
    ("A", 2, "“Widget” means a rotating device."),
    ("A", 3, "“Sprocket” means a toothed wheel."),
    ("B", 0, "Title 3. Consumer devices"),
    ("B", 1, "Chapter 1: General"),
    ("B", 2, "Definitions. As used in this part:"),
    ("B", 3, "The term “Widget” has the meaning as defined in 9 U.S.C. § 99."),
    ("B", 4, "“Gadget” means a handheld unit."),
    ("B", 5, "Section 1.1 Scope"),
    ("B", 6, "Definitions. As used in this part:"),
    ("B", 7, "“Gadget” means a section-local gadget."),
    ("B", 8, "The term “Cog” has the meaning as defined in 40 CFR Part 999."),
]

_HUB_ENTITIES = pd.DataFrame(
    {
        "entity_id": ["conv=A/title=9"],
        "entity_type": ["statute"],
        "canonical_citation": ["9 U.S.C. § 99"],
        "aliases": [["usc/title=9/section=99"]],
        "link": [None],
    }
)


@pytest.fixture(scope="module")
def hub_result(spark):
    tdf = spark.createDataFrame(_mk_transcripts(_HUB_ROWS), schema=schemas.TRANSCRIPTS)
    edf = spark.createDataFrame(_HUB_ENTITIES, schema=schemas.ENTITY_DICTIONARY)
    res = run_pipeline(spark, tdf, edf)
    rows = _collect_closure(res.applicable_defs)
    incoming = {
        r.node_id: tuple(r.incoming_references)
        for r in res.nodes.collect()
        if r.incoming_references is not None
    }
    res.cleanup()
    return rows, incoming


def test_incorporated_hub_resolves_in_corpus(hub_result):
    by = {(t[0], t[1]): t for t in hub_result[0]}
    sec = "conv=B/title=3/chapter=1/section=1.1"
    # Widget at the section: inherited from the chapter's incorporated
    # entry, resolved through the conv-A hub to its definition text
    assert by[(sec, "widget")] == (
        sec, "widget", "a rotating device", "conv=B/title=3/chapter=1",
        "incorporated", "conv=A/title=9", 3,
    )
    # closest scope wins: the section's own Gadget beats the chapter's
    assert by[(sec, "gadget")][2] == "a section-local gadget"
    assert by[(sec, "gadget")][6] == 4
    # the chapter node keeps the chapter-level Gadget
    assert by[("conv=B/title=3/chapter=1", "gadget")][2] == "a handheld unit"
    # cross-corpus incorporation stays visible as an unresolved pointer
    cog = by[(sec, "cog")]
    assert cog[2] is None and cog[4] == "incorporated"
    assert cog[5] == "40 CFR Part 999"
    # the hub conv's own nodes see their local defs
    assert by[("conv=A/title=9", "widget")][4] == "local"
    # scopes above the defining chapter do NOT inherit downward
    assert ("conv=B/title=3", "gadget") not in by


def test_hub_fixture_matches_oracle(spark, hub_result):
    o = oracle.run_oracle(_mk_transcripts(_HUB_ROWS), _HUB_ENTITIES)
    assert hub_result[0] == _oracle_closure(o["applicable_defs"])


def test_incoming_references_reach_cited_node(hub_result):
    """The 'as defined in 9 U.S.C. § 99' clause is also a citation mention;
    once linked to the in-corpus hub node it must surface as that node's
    incoming reference (reference node_incoming_references,
    pydanticModels.py:442)."""
    assert hub_result[1].get("conv=A/title=9") == ("conv=B/title=3/chapter=1",)


def test_graph_columns_match_oracle(
    spark, transcripts_df, entity_dict_df, transcripts_pd, entity_dict_pd
):
    res = run_pipeline(spark, transcripts_df, entity_dict_df)
    o = oracle.run_oracle(transcripts_pd, entity_dict_pd)
    cols = ["node_id", "direct_children", "siblings", "incoming_references"]
    got = {
        r.node_id: (
            tuple(r.direct_children) if r.direct_children is not None else None,
            tuple(r.siblings) if r.siblings is not None else None,
            tuple(r.incoming_references) if r.incoming_references is not None else None,
        )
        for r in res.nodes.select(*cols).collect()
    }
    exp = {
        r.node_id: (
            tuple(r.direct_children) if r.direct_children is not None else None,
            tuple(r.siblings) if r.siblings is not None else None,
            tuple(r.incoming_references) if r.incoming_references is not None else None,
        )
        for r in o["nodes"][cols].itertuples(index=False)
    }
    assert got == exp
    # non-vacuous: children and non-empty sibling lists occur (incoming
    # refs onto nodes are exercised by the hub fixture — the synth entity
    # dictionary links only to external corpora)
    assert any(v[0] for v in got.values())
    assert any(v[1] for v in got.values())
    res.cleanup()
