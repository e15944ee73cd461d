"""Extraction kernels + hierarchy derivation — the heart of the DAG.

Re-expresses the reference's per-document imperative parse loop
(``scrapeCA.py:150-221`` parent resolution, ``scrapeECFR.py:530-837``
definition state machine, ``scrapeECFR.py:1112-1172`` mention extraction)
as:

- **Arrow-batched pandas UDFs** for the regex kernels (shared with the
  oracle via ``rules.py`` — no drift, no per-row Python through Spark's
  row UDF path);
- **window functions** for everything stateful: parent-by-rank resolution
  is "nearest preceding strictly-higher-ranked row", i.e. a greatest-by-
  position over per-rank running ``last(..., ignorenulls=True)`` columns —
  the as-of-join shape SURVEY §2.3 ``join_hierarchy_rank`` calls for;
  duplicate-id versioning is a ``row_number`` window (SURVEY §2.6
  ``dedup_version``); the definitions scope flag and "current node" are
  running ``last(..., ignorenulls=True)`` fills.

All windows share one partitioning — ``conv_id`` ordered by ``ord`` — so
Catalyst plans a single exchange for the whole stage. At 10^12 turns the
per-conv window state is O(1) per row (running lasts), so hot conversations
cost time, not memory; the expensive reassembly path is chunk-salted
separately (see ``reassembly.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import rules
from .reassembly import conv_root_col

# ---------------------------------------------------------------------------
# Arrow kernels (scalar pandas UDFs over rules.py)
# ---------------------------------------------------------------------------

_HIER_TYPE = T.StructType(
    [
        T.StructField("classifier", T.StringType()),
        T.StructField("number", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)
# fused per-turn features: one Arrow round-trip instead of three
# (clean + hierarchy marker + definitions header)
_FEATURES_TYPE = T.StructType(
    [
        T.StructField("clean_text", T.StringType()),
        T.StructField("classifier", T.StringType()),
        T.StructField("number", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("defs_header", T.BooleanType()),
    ]
)
_MENTIONS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("mention_text", T.StringType()),
            T.StructField("corpus", T.StringType()),
            T.StructField("raw_key", T.StringType()),
            T.StructField("start", T.IntegerType()),
        ]
    )
)
_DEFS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("definition", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("incorporated_from", T.StringType()),
        ]
    )
)


@pandas_udf(_FEATURES_TYPE)
def turn_features_udf(texts: pd.Series) -> pd.DataFrame:
    """Fused per-turn kernel: clean_text + parse_hierarchy_marker +
    is_definitions_header in ONE Arrow batch transfer. At 10^12 turns the
    JVM↔Python hop dominates kernel cost, so the three scalar rules run
    fused over each batch (they all need the full text anyway)."""
    cleaned = texts.map(rules.clean_text)
    parsed = cleaned.map(rules.parse_hierarchy_marker)
    return pd.DataFrame(
        {
            "clean_text": cleaned,
            "classifier": parsed.map(lambda t: t[0] if t else None),
            "number": parsed.map(lambda t: t[1] if t else None),
            "name": parsed.map(lambda t: t[2] if t else None),
            "defs_header": cleaned.map(rules.is_definitions_header),
        }
    )


_EXTRACTIONS_TYPE = T.StructType(
    [
        T.StructField("mentions", _MENTIONS_TYPE),
        T.StructField("defs", _DEFS_TYPE),
    ]
)


@pandas_udf(_EXTRACTIONS_TYPE)
def extractions_udf(texts: pd.Series, in_scope: pd.Series) -> pd.DataFrame:
    """Fused mention + definition extraction — one Arrow round-trip for the
    two content kernels (reference scrapeECFR.py:1112-1172 + 530-837)."""
    mentions = texts.map(
        lambda t: [
            (m["mention_text"], m["corpus"], m["raw_key"], m["start"])
            for m in rules.extract_mentions(t)
        ]
    )
    defs = pd.Series(
        [
            [
                (d["term"], d["definition"], d["kind"], d["incorporated_from"])
                for d in rules.extract_definitions(t, bool(s))
            ]
            for t, s in zip(texts, in_scope)
        ],
        index=texts.index,
    )
    return pd.DataFrame({"mentions": mentions, "defs": defs})


@pandas_udf(_HIER_TYPE)
def hierarchy_marker_udf(texts: pd.Series) -> pd.DataFrame:
    """parse_hierarchy_marker over an Arrow batch → nullable struct."""
    parsed = texts.map(rules.parse_hierarchy_marker)
    return pd.DataFrame(
        {
            "classifier": parsed.map(lambda t: t[0] if t else None),
            "number": parsed.map(lambda t: t[1] if t else None),
            "name": parsed.map(lambda t: t[2] if t else None),
        }
    )


@pandas_udf(T.BooleanType())
def definitions_header_udf(texts: pd.Series) -> pd.Series:
    return texts.map(rules.is_definitions_header)


@pandas_udf(_MENTIONS_TYPE)
def mentions_udf(texts: pd.Series) -> pd.Series:
    """Mention extraction (reference scrapeECFR.py:1112-1172) per batch."""
    return texts.map(
        lambda t: [
            (m["mention_text"], m["corpus"], m["raw_key"], m["start"])
            for m in rules.extract_mentions(t)
        ]
    )


@pandas_udf(_DEFS_TYPE)
def definitions_udf(texts: pd.Series, in_scope: pd.Series) -> pd.Series:
    """Definition extraction (reference scrapeECFR.py:530-837) per batch."""
    return pd.Series(
        [
            [
                (d["term"], d["definition"], d["kind"], d["incorporated_from"])
                for d in rules.extract_definitions(t, bool(s))
            ]
            for t, s in zip(texts, in_scope)
        ]
    )


# ---------------------------------------------------------------------------
# Hierarchy nodes via windows
# ---------------------------------------------------------------------------

_RANKED_LEVELS = sorted(rules.LEVEL_RANKS, key=rules.LEVEL_RANKS.get)


def _versioned(raw_id_col: str, ord_col: str = "ord"):
    """Duplicate-id versioning: rn=1 keeps the id, rn=n>1 appends ``-v_n``
    in arrival (= turn) order — deterministic re-expression of the
    reference's insert-collision retry loop (scrapingHelpers.py:61-115).

    Partitioned by ``(conv_id, raw_id)``: node ids are conv-prefixed so this
    is semantically per-raw-id, and hash(conv_id) already satisfies the
    clustered distribution — no extra exchange, and the null (non-node) rows
    spread across conversations instead of one global skew partition."""
    w = Window.partitionBy("conv_id", raw_id_col).orderBy(ord_col)
    rn = F.row_number().over(w)
    return F.when(rn == 1, F.col(raw_id_col)).otherwise(
        F.concat(F.col(raw_id_col), F.lit("-v_"), rn.cast("string"))
    )


def derive_nodes(ordered: DataFrame) -> DataFrame:
    """Attach hierarchy-node columns to the ordered turns.

    Adds: ``node_id`` (versioned, null for non-node turns), ``node_parent``,
    ``level_classifier``, ``node_name``, ``node_status``, ``current_node``
    (running scope node for every turn), ``in_defs_scope``.

    Level-by-level construction: each level's full path id depends on the
    nearest preceding higher-ranked node's *final (versioned)* id, exactly
    like the oracle's parent stack — so the windows chain per level
    (4 window stages, one shared exchange on ``conv_id``).
    """
    w = Window.partitionBy("conv_id").orderBy("ord")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)

    if "clean_text" in ordered.columns:
        # caller already cleaned (standalone use) — parse markers only
        df = (
            ordered.withColumn("hier", hierarchy_marker_udf("clean_text"))
            .withColumn("level_classifier", F.col("hier.classifier"))
            .withColumn("level_number", F.col("hier.number"))
            .withColumn("node_name", F.col("hier.name"))
            .withColumn("_defs_header_c", definitions_header_udf("clean_text"))
            .drop("hier")
        )
    else:
        # fused path (the pipeline): clean + marker + defs-header in one
        # Arrow round-trip
        df = (
            ordered.withColumn("feat", turn_features_udf("text"))
            .withColumn("clean_text", F.col("feat.clean_text"))
            .withColumn("level_classifier", F.col("feat.classifier"))
            .withColumn("level_number", F.col("feat.number"))
            .withColumn("node_name", F.col("feat.name"))
            .withColumn("_defs_header_c", F.col("feat.defs_header"))
            .drop("feat")
        )
    df = df.withColumn("root_id", conv_root_col(F.col("conv_id")))

    # per-rank running (ord, id) of the most recent final node id
    last_cols: list[str] = []
    for level in _RANKED_LEVELS:
        rank = rules.LEVEL_RANKS[level]
        # parent = max-position among running lasts of strictly higher levels
        higher = [F.col(c) for c in last_cols]
        if higher:
            parent = F.coalesce(F.greatest(*higher).getField("id") if len(higher) > 1
                                else higher[0].getField("id"), F.col("root_id"))
        else:
            parent = F.col("root_id")
        is_level = F.col("level_classifier") == level
        raw_col, fin_col, last_col = f"_raw_{level}", f"_fin_{level}", f"_last_{level}"
        df = df.withColumn(
            raw_col,
            F.when(
                is_level,
                F.concat(parent, F.lit(f"/{level}="), F.col("level_number")),
            ),
        )
        df = df.withColumn(fin_col, F.when(is_level, _versioned(raw_col)))
        df = df.withColumn(
            last_col,
            F.last(
                F.when(is_level, F.struct(F.col("ord").alias("o"), F.col(fin_col).alias("id"))),
                ignorenulls=True,
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        last_cols.append(last_col)
        _ = rank  # rank ordering is implicit in _RANKED_LEVELS iteration

    node_id = F.coalesce(*[F.col(f"_fin_{lv}") for lv in _RANKED_LEVELS])
    raw_id = F.coalesce(*[F.col(f"_raw_{lv}") for lv in _RANKED_LEVELS])
    df = (
        df.withColumn("node_id", node_id)
        .withColumn("node_raw_id", raw_id)
        .withColumn(
            "node_parent",
            F.when(
                F.col("node_id").isNotNull(),
                F.expr(
                    "array_join(slice(split(node_raw_id,'/'),1,"
                    "size(split(node_raw_id,'/'))-1),'/')"
                ),
            ),
        )
        .withColumn(
            "node_status",
            F.when(F.col("node_id").isNull(), F.lit(None)).otherwise(
                F.when(F.lower("node_name").rlike(r"\[\s*reserved"), "reserved")
                .when(F.lower("node_name").rlike(r"\brepealed\b"), "repealed")
                .when(F.lower("node_name").rlike(r"\[\s*renumbered"), "renumbered")
                .otherwise("valid")
            ),
        )
        # current node scope for every turn (running last incl. current row)
        .withColumn(
            "current_node",
            F.coalesce(
                F.last("node_id", ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                F.col("root_id"),
            ),
        )
        # definitions scope: opened by a Definitions. header, closed by any
        # hierarchy node (reference scope semantics, scrapeECFR.py:301-351)
        .withColumn(
            "in_defs_scope",
            F.coalesce(
                F.last(
                    F.when(F.col("node_id").isNotNull(), F.lit(False)).when(
                        F.col("_defs_header_c"), F.lit(True)
                    ),
                    ignorenulls=True,
                ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
                F.lit(False),
            ),
        )
        .drop("_defs_header_c", *[f"_last_{lv}" for lv in _RANKED_LEVELS],
              *[f"_fin_{lv}" for lv in _RANKED_LEVELS],
              *[f"_raw_{lv}" for lv in _RANKED_LEVELS])
    )
    # fused content kernel, computed once here so a persist() of this frame
    # caches the extractions and the downstream mention/definition explodes
    # stay JVM-only (node-marker turns yield no content extractions)
    df = df.withColumn(
        "extractions",
        F.when(
            F.col("node_id").isNull(),
            extractions_udf("clean_text", "in_defs_scope"),
        ),
    )
    _ = w_prev  # parent resolution uses up-to-current lasts of higher levels only
    return df


_DERIVED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ord", T.IntegerType()),
        T.StructField("clean_text", T.StringType()),
        T.StructField("level_classifier", T.StringType()),
        T.StructField("node_name", T.StringType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("node_raw_id", T.StringType()),
        T.StructField("node_parent", T.StringType()),
        T.StructField("node_status", T.StringType()),
        T.StructField("current_node", T.StringType()),
        T.StructField("in_defs_scope", T.BooleanType()),
        T.StructField("extractions", _EXTRACTIONS_TYPE),
    ]
)


def derive_nodes_stream(
    transcripts: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Streaming stack-machine derive — the scale path.

    ``repartition(hash(conv_id)) → sortWithinPartitions(conv_id, turn_idx,
    ts, text) → mapInPandas(kernel)``: ONE exchange, ONE JVM sort, ONE
    Python pass. The kernel walks each sorted partition with a running
    parent stack (the reference's per-document cursor, scrapeCA.py:150-221),
    first-writer-wins turn dedup (scrapingHelpers.py:110-114), duplicate-id
    versioning (scrapingHelpers.py:61-115), definitions-scope tracking
    (scrapeECFR.py:530-560), and the mention/definition regex kernels —
    state carries across Arrow batches inside a partition, so hot
    conversations cost time, not memory (state is O(stack depth)).

    Produces the same frame as :func:`derive_nodes` (windows engine); the
    equivalence of the two engines is itself a test invariant.
    """
    from collections.abc import Iterator

    df = transcripts
    if num_partitions:
        df = df.repartition(num_partitions, "conv_id")
    else:
        df = df.repartition("conv_id")
    df = df.sortWithinPartitions("conv_id", "turn_idx", "ts", "text")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = rules.LEVEL_RANKS
        # mutable per-conversation state, carried across Arrow batches
        conv = None
        stack: list[tuple[int, str]] = []
        current_node = ""
        in_defs = False
        id_counts: dict[str, int] = {}
        last_turn = -1
        ord_ctr = 0

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in _DERIVED_SCHEMA.fields}
            app = {k: v.append for k, v in out.items()}
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                if conv_id != conv:
                    conv = conv_id
                    stack = []
                    current_node = rules.conv_root_id(conv_id)
                    in_defs = False
                    id_counts = {}
                    last_turn = -1
                    ord_ctr = 0
                elif turn_idx == last_turn:
                    continue  # first-writer-wins duplicate
                last_turn = turn_idx
                ord_ctr += 1
                clean = rules.clean_text(text)
                hier = rules.parse_hierarchy_marker(clean)
                node_id = raw_id = parent = status = classifier = name = None
                extractions = None
                if hier is not None:
                    classifier, number, name = hier
                    rank = ranks[classifier]
                    while stack and stack[-1][0] >= rank:
                        stack.pop()
                    parent = stack[-1][1] if stack else rules.conv_root_id(conv_id)
                    raw_id = rules.id_add_level(parent, classifier, number)
                    n = id_counts[raw_id] = id_counts.get(raw_id, 0) + 1
                    node_id = raw_id if n == 1 else f"{raw_id}-v_{n}"
                    stack.append((rank, node_id))
                    current_node = node_id
                    in_defs = False
                    status = rules.node_status(name)
                else:
                    if rules.is_definitions_header(clean):
                        in_defs = True
                    extractions = (
                        [
                            (m["mention_text"], m["corpus"], m["raw_key"], m["start"])
                            for m in rules.extract_mentions(clean)
                        ],
                        [
                            (d["term"], d["definition"], d["kind"], d["incorporated_from"])
                            for d in rules.extract_definitions(clean, in_defs)
                        ],
                    )
                app["conv_id"](conv_id)
                app["turn_idx"](turn_idx)
                app["ord"](ord_ctr)
                app["clean_text"](clean)
                app["level_classifier"](classifier)
                app["node_name"](name)
                app["node_id"](node_id)
                app["node_raw_id"](raw_id)
                app["node_parent"](parent)
                app["node_status"](status)
                app["current_node"](current_node)
                app["in_defs_scope"](in_defs)
                app["extractions"](extractions)
            if out["conv_id"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema=_DERIVED_SCHEMA)


def nodes_table(derived: DataFrame) -> DataFrame:
    """Materialize the nodes table (reference CLAUDE.md:514-536 shape),
    including one root node per conversation."""
    node_rows = derived.filter(F.col("node_id").isNotNull()).select(
        F.col("node_id"),
        F.when(F.col("level_classifier") == "section", "content")
        .otherwise("structure")
        .alias("node_type"),
        "level_classifier",
        F.col("node_name").alias("name"),
        F.col("node_parent").alias("parent"),
        F.col("node_status").alias("status"),
        "conv_id",
        "turn_idx",
        F.col("clean_text").alias("text"),
    )
    roots = (
        derived.select("conv_id").distinct().select(
            conv_root_col(F.col("conv_id")).alias("node_id"),
            F.lit("structure").alias("node_type"),
            F.lit("conv").alias("level_classifier"),
            F.col("conv_id").alias("name"),
            F.lit(None).cast("string").alias("parent"),
            F.lit("valid").alias("status"),
            "conv_id",
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("string").alias("text"),
        )
    )
    return node_rows.unionByName(roots)


def extract_mentions(derived: DataFrame) -> DataFrame:
    """Explode citation/URL mentions from non-node turns.

    One row per mention: ``conv_id, turn_idx, current_node, mention_text,
    corpus, raw_key`` (reference Reference rows, pydanticModels.py:169-189).
    """
    return (
        derived.filter(F.col("node_id").isNull())
        .select(
            "conv_id",
            "turn_idx",
            "current_node",
            F.explode("extractions.mentions").alias("m"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "current_node",
            F.col("m.mention_text").alias("mention_text"),
            F.col("m.corpus").alias("corpus"),
            F.col("m.raw_key").alias("raw_key"),
        )
    )


def extract_definitions(derived: DataFrame) -> DataFrame:
    """Explode definitions from non-node turns.

    One row per definition: ``conv_id, turn_idx, current_node, term,
    definition, kind, incorporated_from, term_id``.
    """
    return (
        derived.filter(F.col("node_id").isNull())
        .select(
            "conv_id",
            "turn_idx",
            "current_node",
            F.explode("extractions.defs").alias("d"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "current_node",
            F.col("d.term").alias("term"),
            F.col("d.definition").alias("definition"),
            F.col("d.kind").alias("kind"),
            F.col("d.incorporated_from").alias("incorporated_from"),
            F.concat(F.col("current_node"), F.lit("/term="), F.col("d.term")).alias(
                "term_id"
            ),
        )
    )
