"""Deterministic sampling and sequence packing for training-data pipelines.

Two ops a 100 TB pretraining pipeline needs around the `documents` table:

- ``split_assign``: hash-based train/eval split. NOT ``df.sample()`` —
  Bernoulli sampling is seed- and partitioning-dependent, so re-runs and
  engines disagree. An md5 prefix of the stable key is deterministic across
  runs, engines (standard MD5 of the UTF-8 key on both Spark and DuckDB),
  partitionings, and cluster sizes: a document's split NEVER changes when
  data is added — the property eval-set hygiene actually requires
  (the reference pins its per-row identity the same way: stable node ids,
  scrapingHelpers.py:34-92).
- ``pack_token_budget``: assign documents to fixed-token-budget training
  packs by running token offset WITHIN each source shard. Packing is
  windowed per `source`, never globally — a single global ordered window
  would serialize 100 TB through one partition; per-shard windows keep
  every partition independent (the same reason the KG pipeline windows
  per conv_id). Token counts reuse the exact ``text_analysis`` whitespace
  tokenizer so counts agree with ``ta_tokens`` to the token.

Both are pure JVM expressions — no Python in the scan path, whole-stage
codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_analysis import _tokens


def split_assign(
    docs: DataFrame, key: str = "doc_id", eval_prefix_lt: str = "1a"
) -> DataFrame:
    """(doc_id, split) — 'eval' iff the first two hex chars of
    md5(cast(key as string)) sort lexicographically below
    ``eval_prefix_lt`` ('1a' → 26/256 ≈ 10.2%), else 'train'.

    String-prefix comparison (not modular arithmetic on a parsed int) so
    the predicate is bit-identical on any engine with a standard md5():
    no integer-parsing, endianness, or signed-overflow variance.
    """
    pfx = F.substring(F.md5(F.col(key).cast("string")), 1, 2)
    return docs.select(
        key,
        F.when(pfx < F.lit(eval_prefix_lt), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def pack_token_budget(docs: DataFrame, budget: int = 512) -> DataFrame:
    """(doc_id, source, n_tokens, pack_id) — contiguous sequence packing:
    documents ordered by doc_id within their source shard are laid into
    packs of ``budget`` tokens by exclusive running offset
    (pack_id = floor(offset / budget)).

    A document straddling a boundary starts the next pack's count but is
    assigned by its own starting offset — the standard "greedy concat then
    chunk" layout LLM dataloaders use. The window is PARTITIONED BY source:
    per-shard prefix sums run embarrassingly parallel; there is no global
    ordering anywhere in the plan.
    """
    n_tokens = F.size(_tokens(F.col("text")))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_counts = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_counts.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(offset / budget).cast("bigint").alias("pack_id"),
    )
