"""Entity linking — broadcast candidate-ladder join.

Replaces the reference's per-row linking lookups (``analyze_partial_link``,
reference ``pydanticModels.py:555-636``: repeated ``SELECT ... ILIKE`` with
pop-level / zero-pad backoff — an N+1-query correlated lookup) with:

1. a scalar pandas UDF generating the *ranked candidate keys* per mention
   (exact → zero-padded → popped level, shared with the oracle via
   ``rules.candidate_keys``);
2. one exploded **broadcast hash join** against the alias-exploded canonical
   dictionary;
3. ``min_by(priority)`` per mention to keep the highest-priority hit.

At 10^12 turns the dictionary is the small side (bounded vocabulary of
canonical entities) — broadcast keeps the join shuffle-free; the only wide
operation is the per-mention ``groupBy``, which reuses the mention id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .. import rules

_CAND_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("priority", T.IntegerType()), T.StructField("key", T.StringType())]
    )
)


@pandas_udf(_CAND_TYPE)
def candidate_keys_udf(raw_keys: pd.Series) -> pd.Series:
    return raw_keys.map(lambda k: rules.candidate_keys(k) if k is not None else [])


def alias_index(entity_dict: DataFrame) -> DataFrame:
    """Explode the dictionary to ``(alias_key, entity_id)``, first writer
    wins on alias collisions (stable by entity_id) — the oracle's
    ``build_linking_index`` as a DataFrame."""
    exploded = entity_dict.select(
        F.explode("aliases").alias("alias_key"), "entity_id"
    )
    return exploded.groupBy("alias_key").agg(F.min("entity_id").alias("entity_id"))


def link_mentions(mentions: DataFrame, entity_dict: DataFrame) -> DataFrame:
    """Attach ``entity_id`` (nullable) + ``link_priority`` to each mention.

    Misses stay as null entity_id rows — they become ``link_miss_rate``
    metrics, never silent drops (reference tags failures instead of
    retrying forever, ``3_process.py:51-56``).
    """
    idx = alias_index(entity_dict)
    with_mid = mentions.withColumn(
        "_mid", F.monotonically_increasing_id()
    )  # join-back key only; never used for ordering semantics
    cands = with_mid.select(
        "_mid", F.explode(candidate_keys_udf("raw_key")).alias("c")
    ).select("_mid", F.col("c.priority").alias("priority"), F.col("c.key").alias("key"))
    hits = (
        cands.join(F.broadcast(idx), cands["key"] == idx["alias_key"], "inner")
        .groupBy("_mid")
        .agg(
            F.min_by("entity_id", "priority").alias("entity_id"),
            F.min("priority").alias("link_priority"),
        )
    )
    return with_mid.join(hits, "_mid", "left").drop("_mid")
