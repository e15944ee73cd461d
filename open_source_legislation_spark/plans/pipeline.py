"""End-to-end KG-construction DAG.

One declarative DataFrame plan per the SURVEY §3.2 lifecycle:

    scan(transcripts) → repartition(hash(conv_id)) → ordered/dedup window →
    derive hierarchy nodes (windows) → mention + definition kernels
    (Arrow UDFs) → explode → broadcast candidate-ladder join →
    alias CC loop → triples/nodes/edges materialization.

The reference runs this as a per-document Python loop with one Postgres
round-trip per node (``2_scrape_regular.py:33-146``); here the whole corpus
is one DAG with exactly one wide exchange on ``conv_id`` for the stateful
stages plus the small linking/CC shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import canonicalize, extract, graph, linking, reassembly


@dataclass
class PipelineResult:
    turns: DataFrame
    nodes: DataFrame
    mentions: DataFrame
    definitions: DataFrame
    triples: DataFrame
    edges: DataFrame
    metrics: dict[str, float] = field(default_factory=dict)


def _mention_triples(linked: DataFrame) -> DataFrame:
    return linked.filter(F.col("entity_id").isNotNull()).select(
        F.col("current_node").alias("subj"),
        F.lit("cites").alias("pred"),
        F.col("entity_id").alias("obj"),
        "conv_id",
        "turn_idx",
    )


def _definition_triples(defs: DataFrame, linked_incorp: DataFrame) -> DataFrame:
    plain = defs.filter(F.col("kind") != "incorporated")
    defined_as = plain.select(
        F.col("term_id").alias("subj"),
        F.lit("defined_as").alias("pred"),
        F.col("definition").alias("obj"),
        "conv_id",
        "turn_idx",
    )
    defined_in_scope = plain.select(
        F.col("term_id").alias("subj"),
        F.lit("defined_in_scope").alias("pred"),
        F.col("current_node").alias("obj"),
        "conv_id",
        "turn_idx",
    )
    incorp = linked_incorp.select(
        F.col("term_id").alias("subj"),
        F.lit("defined_in_scope").alias("pred"),
        F.coalesce("entity_id", "incorporated_from").alias("obj"),
        "conv_id",
        "turn_idx",
    )
    return defined_as.unionByName(defined_in_scope).unionByName(incorp)


def _node_triples(derived: DataFrame) -> DataFrame:
    nodes = derived.filter(F.col("node_id").isNotNull())
    child_of = nodes.select(
        F.col("node_id").alias("subj"),
        F.lit("child_of").alias("pred"),
        F.col("node_parent").alias("obj"),
        "conv_id",
        "turn_idx",
    )
    # versioned duplicates alias back to the raw id
    # (reference duplicated_from_node_id tag, scrapingHelpers.py:94-98)
    alias_of = nodes.filter(F.col("node_id") != F.col("node_raw_id")).select(
        F.col("node_id").alias("subj"),
        F.lit("alias_of").alias("pred"),
        F.col("node_raw_id").alias("obj"),
        "conv_id",
        "turn_idx",
    )
    return child_of.unionByName(alias_of)


def link_incorporated(defs: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Link the citation inside 'as defined in <citation>' — first mention
    of the incorporated_from text through the same candidate ladder."""
    incorp = defs.filter(F.col("kind") == "incorporated").withColumn(
        "raw_key",
        F.try_element_at(extract.mentions_udf("incorporated_from"), F.lit(1))["raw_key"],
    )
    return linking.link_mentions(incorp, entity_dict)


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    entity_dict: DataFrame,
    alias_edges: DataFrame | None = None,
    num_partitions: int | None = None,
    canonicalize_triples: bool = False,
    engine: str = "stream",
) -> PipelineResult:
    """``engine="stream"`` (default): one exchange + one JVM sort + one
    Python pass (mapInPandas stack machine — extract.derive_nodes_stream);
    ``engine="windows"``: the declarative window-cascade derive. Both
    produce identical frames (tested equivalence) — windows is kept as the
    pure-Catalyst reference plan, stream is the scale/throughput path."""
    if engine == "stream":
        derived = extract.derive_nodes_stream(
            transcripts, num_partitions=num_partitions
        )
    else:
        # clean=False: cleaning runs fused with the marker/defs-header parse
        # inside derive_nodes (one Arrow round-trip over the full text column)
        ordered = reassembly.ordered_turns(
            transcripts, num_partitions=num_partitions, clean=False
        )
        derived = extract.derive_nodes(ordered)
    # the stateful per-conv stage feeds three consumers — cache it.
    # DISK_ONLY, deliberately: in-memory columnar encoding of the nested
    # extraction column costs ~50% of the whole derive stage and competes
    # with execution memory, while a disk-cached intermediate consumed
    # within the same job rides the OS page cache (measured: DISK_ONLY
    # materializes 1.5x faster than MEMORY_AND_DISK at 16M turns and frees
    # the heap for the sort/joins — same reasoning as shuffle files).
    from pyspark import StorageLevel

    derived = derived.persist(StorageLevel.DISK_ONLY)

    nodes = extract.nodes_table(derived)
    mentions = extract.extract_mentions(derived)
    defs = extract.extract_definitions(derived)

    linked = linking.link_mentions(mentions, entity_dict)
    linked_incorp = link_incorporated(defs, entity_dict)

    triples = (
        _node_triples(derived)
        .unionByName(_mention_triples(linked))
        .unionByName(_definition_triples(defs, linked_incorp))
    )

    edges = graph.hierarchy_edges(nodes).unionByName(graph.cites_edges(linked))

    if alias_edges is not None:
        labels = canonicalize.connected_components(alias_edges)
        triples = triples.unionByName(canonicalize.alias_of_triples(labels))
        if canonicalize_triples:
            triples = canonicalize.rewrite_to_canonical(triples, labels)

    return PipelineResult(
        turns=derived,
        nodes=nodes,
        mentions=linked,
        definitions=defs,
        triples=triples,
        edges=edges,
    )
