"""Entity linking — broadcast candidate-ladder join.

Replaces the reference's per-row linking lookups (``analyze_partial_link``,
reference ``pydanticModels.py:555-636``: repeated ``SELECT ... ILIKE`` with
pop-level / zero-pad backoff — an N+1-query correlated lookup) with:

1. a scalar pandas UDF generating the *ranked candidate keys* per mention
   (exact → zero-padded → popped level, shared with the oracle via
   ``rules.candidate_keys``); at most ONE candidate exists per priority, so
   the ladder is three nullable key columns, not an exploded array;
2. one **broadcast hash join per rung** against the alias-exploded canonical
   dictionary — three map-side joins, zero shuffles;
3. ``coalesce`` in priority order picks the highest-priority hit.

At 10^12 turns the dictionary is the small side (bounded vocabulary of
canonical entities) — the whole linking stage is narrow: no exchange of the
mention stream at all (the earlier design exploded candidates and grouped
back by a mention id, i.e. two full shuffles of the stream; this one has
none).
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


_CAND3_TYPE = T.StructType(
    [
        T.StructField("k1", T.StringType()),
        T.StructField("k2", T.StringType()),
        T.StructField("k3", T.StringType()),
    ]
)


@pandas_udf(_CAND3_TYPE)
def candidate_keys3_udf(raw_keys: pd.Series) -> pd.DataFrame:
    """The ladder as three nullable columns (priority 1/2/3) — same
    ``rules.candidate_keys`` spec, join-friendly shape."""

    def three(k):
        out = {1: None, 2: None, 3: None}
        if k is not None:
            for p, key in rules.candidate_keys(k):
                out[p] = key
        return out

    cols = raw_keys.map(three)
    return pd.DataFrame(
        {
            "k1": cols.map(lambda d: d[1]),
            "k2": cols.map(lambda d: d[2]),
            "k3": cols.map(lambda d: d[3]),
        }
    )


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
    out = mentions.withColumn("_c", candidate_keys3_udf("raw_key"))
    for p in (1, 2, 3):
        idx_p = idx.select(
            F.col("alias_key").alias(f"_ak{p}"), F.col("entity_id").alias(f"_e{p}")
        )
        out = out.join(
            F.broadcast(idx_p),
            F.col("_c").getField(f"k{p}") == F.col(f"_ak{p}"),
            "left",
        ).drop(f"_ak{p}")
    return (
        out.withColumn("entity_id", F.coalesce("_e1", "_e2", "_e3"))
        .withColumn(
            "link_priority",
            F.when(F.col("_e1").isNotNull(), 1)
            .when(F.col("_e2").isNotNull(), 2)
            .when(F.col("_e3").isNotNull(), 3),
        )
        .drop("_c", "_e1", "_e2", "_e3")
    )
