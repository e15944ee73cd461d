"""Canonicalization — iterative connected components over alias edges.

The reference ties duplicate/alias ids to a canonical node in three scattered
ways (version tags ``scrapingHelpers.py:94-98``, link normalization
``pydanticModels.py:555-636``, incorporated-hub links
``scrapeECFR.py:1435-1471``). The north rule requires the closure as
**union-find connected components**; here it is the standard iterative
min-label propagation as a DataFrame loop (no GraphFrames dependency):

    label(v) ← min(label(v), min over neighbors' label(u))

repeated until fixpoint. Converges in O(diameter) rounds; each round is one
shuffle join + one aggregation. ``localCheckpoint`` truncates the lineage so
the plan does not grow across iterations (critical for long chains at scale).
For web-scale graphs the same loop is the large-star/small-star building
block; alias graphs here have tiny diameter (version chains, link cycles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iterations: int = 25) -> DataFrame:
    """``(member, canonical)`` for every vertex in ``edges(src, dst)``,
    canonical = lexicographic-min id of the component (matches the oracle's
    union-find labeling)."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("member"))
        .distinct()
        .withColumn("canonical", F.col("member"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = labels.localCheckpoint(eager=True)
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["member"], "inner")
            .groupBy(F.col("a").alias("member"))
            .agg(F.min("canonical").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "member", "left")
            .select(
                "member",
                F.least(
                    F.col("canonical"), F.coalesce("nbr_min", "canonical")
                ).alias("canonical"),
                (F.coalesce("nbr_min", "canonical") < F.col("canonical")).alias(
                    "_changed"
                ),
            )
        )
        # checkpoint each round: the convergence check materializes the
        # frame anyway, and this truncates the growing join lineage
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter("_changed").limit(1).count()
        _ = i
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def alias_of_triples(labels: DataFrame) -> DataFrame:
    """(member, alias_of, canonical) for non-canonical members —
    FIXTURES.md §4 ``alias_of`` predicate rows (no conv provenance)."""
    return labels.filter(F.col("member") != F.col("canonical")).select(
        F.col("member").alias("subj"),
        F.lit("alias_of").alias("pred"),
        F.col("canonical").alias("obj"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
    )


def rewrite_to_canonical(
    df: DataFrame, labels: DataFrame, cols: tuple[str, ...] = ("subj", "obj")
) -> DataFrame:
    """Rewrite id columns to their canonical labels (broadcast left joins —
    the alias map is small relative to the triple stream)."""
    out = df
    for c in cols:
        lbl = labels.select(
            F.col("member").alias(f"_m_{c}"), F.col("canonical").alias(f"_c_{c}")
        )
        out = (
            out.join(F.broadcast(lbl), out[c] == F.col(f"_m_{c}"), "left")
            .withColumn(c, F.coalesce(F.col(f"_c_{c}"), F.col(c)))
            .drop(f"_m_{c}", f"_c_{c}")
        )
    return out
