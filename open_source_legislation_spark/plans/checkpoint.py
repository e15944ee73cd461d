"""Per-partition checkpointed, resumable execution with lineage + metrics.

The reference's resume design keeps state in the data itself: ``WHERE
embedding IS NULL ... LIMIT batch`` loops until no pending rows, tagging
failures instead of retrying forever (reference ``3_process.py:18-36``,
``processingHelpers.py:55-76``). The Spark analog:

- work is split into ``num_buckets`` deterministic conversation buckets
  (``pmod(hash(conv_id), B)`` — Murmur3, stable across runs/executors);
- each bucket is processed independently and written to its own parquet
  partition directory with ``mode=overwrite`` (idempotent retries);
- a manifest row ``(run_id, stage, partition_id, status, rows_in, rows_out,
  committed_at)`` is appended after each bucket commit — the lineage ledger;
- resume = anti-join against the manifest's succeeded buckets: a killed run
  re-executes only unfinished buckets and converges to the identical final
  tables (tested by kill-and-resume).

On a real cluster the same structure maps to Iceberg snapshot-per-bucket
commits; parquet directories are the sandbox stand-in (SURVEY §7.4.5).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import run_pipeline

MANIFEST_DIR = "_manifest"
METRICS_DIR = "_metrics"
INPUT_DIR = "_input"


def bucket_col(conv_id_col, num_buckets: int):
    return F.pmod(F.hash(conv_id_col), F.lit(num_buckets)).cast("int")


@dataclass
class BucketStats:
    partition_id: int
    rows_in: int
    rows_out: int
    mentions: int
    mentions_linked: int
    wall_ms: float


class CheckpointedRunner:
    """Resumable bucket-at-a-time executor for the KG pipeline."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        run_id: str,
        num_buckets: int = 8,
        max_conv_turns: int | None = None,
    ) -> None:
        self.spark = spark
        self.out_dir = out_dir
        self.run_id = run_id
        self.num_buckets = num_buckets
        # skew escape hatch, forwarded to run_pipeline: conversations past
        # this turn count are derived in (conv_id, turn_range) shards
        self.max_conv_turns = max_conv_turns
        os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(out_dir, METRICS_DIR), exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.out_dir, MANIFEST_DIR, "manifest.jsonl")

    def completed_buckets(self) -> set[int]:
        path = self._manifest_path()
        done: set[int] = set()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    row = json.loads(line)
                    if row["status"] == "success" and row["stage"] == "triples":
                        done.add(int(row["partition_id"]))
        return done

    def _commit(self, stats: BucketStats) -> None:
        """Append manifest + metrics rows — the per-partition lineage commit
        (analog of the reference's per-batch conn.commit(),
        processingHelpers.py:93-95)."""
        with open(self._manifest_path(), "a") as f:
            f.write(
                json.dumps(
                    {
                        "run_id": self.run_id,
                        "stage": "triples",
                        "partition_id": stats.partition_id,
                        "status": "success",
                        "rows_in": stats.rows_in,
                        "rows_out": stats.rows_out,
                        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                    }
                )
                + "\n"
            )
        miss_rate = (
            1.0 - stats.mentions_linked / stats.mentions if stats.mentions else 0.0
        )
        metrics = [
            ("triples_emitted", float(stats.rows_out)),
            ("mentions_linked", float(stats.mentions_linked)),
            ("link_miss_rate", miss_rate),
            ("wall_ms", stats.wall_ms),
        ]
        with open(os.path.join(self.out_dir, METRICS_DIR, "metrics.jsonl"), "a") as f:
            for metric, value in metrics:
                f.write(
                    json.dumps(
                        {
                            "run_id": self.run_id,
                            "stage": "triples",
                            "partition_id": stats.partition_id,
                            "metric": metric,
                            "value": value,
                        }
                    )
                    + "\n"
                )

    # -- execution ---------------------------------------------------------
    @staticmethod
    def _parquet_rows(path: str) -> int:
        """Row count from the written parquet FOOTERS (pyarrow metadata
        read — zero Spark jobs, zero data bytes): the write-side metric
        the round-1 re-read count() action was paying a full scan for.
        (``Observation`` was tried first and delivers empty metric rows
        under multi-threaded job submission in this PySpark build, so the
        committed files themselves are the source of truth.)"""
        import pyarrow.parquet as pq

        total = 0
        for root, _dirs, files in os.walk(path):
            for fn in files:
                if fn.endswith(".parquet"):
                    total += pq.read_metadata(os.path.join(root, fn)).num_rows
        return total

    # -- bucketed input materialization -----------------------------------
    def _input_path(self) -> str:
        return os.path.join(self.out_dir, INPUT_DIR)

    def _materialize_input(self, transcripts: DataFrame) -> None:
        """Write the input ONCE, hash-partitioned into per-bucket
        directories, so each bucket run reads exactly its own partition
        instead of filter-scanning the full input B times (round-2 verdict
        #8). On a real deployment this is the transcripts table's Iceberg
        ``bucket(B, conv_id)`` partition spec (SCALE.md) and costs nothing
        per run; here one ``repartition(B, _bucket)`` write stands in.
        A completed write (Spark's ``_SUCCESS`` marker) is REUSED on
        resume — but only after validating the sidecar ``_input_meta.json``
        (bucket count + input row fingerprint): a resume with a different
        ``num_buckets``, or an out_dir re-pointed at different input, would
        otherwise silently commit empty buckets — data loss
        indistinguishable from genuinely empty hash buckets. A reuse whose
        meta sidecar is missing (crash between the parquet write and the
        meta rename) is re-materialized, not trusted."""
        path = self._input_path()
        meta_path = os.path.join(path, "_input_meta.json")
        if os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(
            meta_path
        ):
            with open(meta_path) as fh:
                meta = json.load(fh)
            if meta["num_buckets"] != self.num_buckets:
                raise ValueError(
                    f"checkpoint resume: materialized input at {path} was "
                    f"bucketed with num_buckets={meta['num_buckets']} but "
                    f"this run uses {self.num_buckets}; clear {INPUT_DIR} "
                    f"(and the manifest) or restore the original bucket "
                    f"count — reusing it would mislabel every bucket"
                )
            if "sum_crc32" not in meta:
                raise ValueError(
                    f"checkpoint resume: the meta sidecar at {meta_path} "
                    f"predates content fingerprinting (no sum_crc32 key), "
                    f"so the materialized input cannot be validated "
                    f"against the incoming transcripts; clear {INPUT_DIR} "
                    f"(and the manifest) to re-materialize"
                )
            incoming = self._input_fingerprint(transcripts)
            # a row count alone passes when the out_dir is re-pointed at
            # DIFFERENT input of equal size — exactly the silent-stale
            # failure this guard exists to close, so compare content too
            if meta["rows"] != incoming["rows"] or meta[
                "sum_crc32"
            ] != incoming["sum_crc32"]:
                raise ValueError(
                    f"checkpoint resume: materialized input at {path} holds "
                    f"rows={meta['rows']} sum_crc32={meta['sum_crc32']} "
                    f"but the incoming transcripts fingerprint as "
                    f"rows={incoming['rows']} sum_crc32="
                    f"{incoming['sum_crc32']}; the out_dir points at "
                    f"different input — clear it instead of silently "
                    f"resuming over stale buckets"
                )
            return
        from pyspark.sql import Observation

        bucketed = transcripts.withColumn(
            "_bucket", bucket_col(F.col("conv_id"), self.num_buckets)
        )
        # Observation rides the write itself: the incoming row count comes
        # from the SAME evaluation that produced the files — zero extra
        # scans — and cross-checks the committed footers below, so a write
        # that silently drops rows (failed task commit, partial overwrite)
        # is caught at materialization, not mis-diagnosed at resume
        obs = Observation("materialize_rows")
        (
            bucketed.observe(obs, F.count(F.lit(1)).alias("rows"))
            .repartition(self.num_buckets, F.col("_bucket"))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(path)
        )
        incoming_rows = int(obs.get["rows"])
        durable_rows = self._parquet_rows(path)
        if incoming_rows != durable_rows:
            raise RuntimeError(
                f"materialized input at {path} lost rows in flight: "
                f"incoming {incoming_rows} vs committed {durable_rows}"
            )
        # fingerprint the COMMITTED parquet, not the incoming plan: what
        # must be recorded is what was actually made durable (a second
        # evaluation of an expensive derived plan could also diverge from
        # the first)
        meta = {
            "num_buckets": self.num_buckets,
            **self._input_fingerprint(self.spark.read.parquet(path)),
        }
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, meta_path)

    @staticmethod
    def _input_fingerprint(transcripts: DataFrame) -> dict:
        """Order-independent content fingerprint of the input in ONE
        aggregate scan: row count + SUM of per-row crc32 over the identity
        columns (conv_id, turn_idx, text). Sum is commutative so the value
        is partitioning-independent, and unlike XOR it does NOT cancel on
        even multiplicities (two identical rows XOR to zero, so a swapped
        duplicate PAIR would slip through an xor fingerprint — duplicated
        turns are a real input class here). Accumulated in DECIMAL(38,0):
        1e12 rows x 2^32 exceeds int64.

        Every field is coalesced to a DISTINCT NULL sentinel before the
        concat: concat_ws silently DROPS null arguments, so without the
        sentinels (NULL, '5', t) and ('5', NULL, t) would concat to the
        same string and the stale-input guard could false-pass on inputs
        differing only in which key column is null. The sentinels embed
        the field name, so a null in one position can never collide with
        a null (or a literal) in another."""
        row = transcripts.select(
            F.count("*").alias("n"),
            F.sum(
                F.crc32(
                    F.concat_ws(
                        "\x1f",
                        F.coalesce(F.col("conv_id"), F.lit("\x00nul:conv_id")),
                        F.coalesce(
                            F.col("turn_idx").cast("string"),
                            F.lit("\x00nul:turn_idx"),
                        ),
                        F.coalesce(F.col("text"), F.lit("\x00nul:text")),
                    )
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return {
            "rows": int(row["n"]),
            "sum_crc32": int(row["h"]) if row["h"] is not None else 0,
        }

    def _run_bucket(self, entity_dict: DataFrame, b: int) -> BucketStats:
        """One bucket end-to-end. rows_out comes from the committed parquet
        footers (no re-read scan); mention stats are ONE aggregate over the
        cached derived frame; rows_in comes from the bucket partition's own
        footers (metadata-only, zero Spark jobs)."""
        t0 = time.time()
        # per-bucket scheduler pool: with FAIR mode, concurrent bucket jobs
        # share executors instead of queueing behind each other. Thread-local
        # properties only isolate per-bucket when PySpark pinned-thread mode
        # is active — without it the property bleeds across Python threads
        # and buckets land in arbitrary pools (scheduling-only; results are
        # unaffected). Skip the property rather than mis-scope it.
        if os.environ.get("PYSPARK_PIN_THREAD", "true").lower() != "false":
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"bucket-{b}"
            )
        part_path = os.path.join(self._input_path(), f"_bucket={b}")
        if not os.path.exists(part_path):
            # hash bucket with no conversations: commit an empty success
            # row so resume skips it
            return BucketStats(
                partition_id=b, rows_in=0, rows_out=0, mentions=0,
                mentions_linked=0, wall_ms=(time.time() - t0) * 1000.0,
            )
        # directory-level pruning: only this bucket's files are ever opened
        # (the analog of Iceberg partition pruning on bucket(B, conv_id))
        part = self.spark.read.parquet(part_path)
        rows_in = self._parquet_rows(part_path)
        res = run_pipeline(
            self.spark, part, entity_dict, max_conv_turns=self.max_conv_turns
        )
        tri_path = os.path.join(self.out_dir, "triples", f"bucket={b}")
        nodes_path = os.path.join(self.out_dir, "nodes", f"bucket={b}")
        # overwrite per-bucket dirs → retries of a half-written bucket
        # are idempotent (reference: idempotent batches, 3_process.py)
        res.triples.write.mode("overwrite").parquet(tri_path)
        res.nodes.write.mode("overwrite").parquet(nodes_path)
        m = res.mentions.agg(
            F.count(F.lit(1)).alias("n"), F.count("entity_id").alias("linked")
        ).first()
        res.cleanup()
        return BucketStats(
            partition_id=b,
            rows_in=rows_in,
            rows_out=self._parquet_rows(tri_path),
            mentions=int(m.n),
            mentions_linked=int(m.linked),
            wall_ms=(time.time() - t0) * 1000.0,
        )

    def run(
        self,
        transcripts: DataFrame,
        entity_dict: DataFrame,
        fail_after: int | None = None,
        max_concurrency: int = 4,
    ) -> int:
        """Process all unfinished buckets; returns #buckets processed.

        Buckets run as CONCURRENT Spark jobs (thread pool + FAIR scheduler
        pools) so a small bucket never waits behind a big one; the manifest
        append is serialized under a lock. ``fail_after`` aborts after N
        bucket commits — the kill-and-resume test hook (simulates a mid-run
        driver loss at a partition boundary); it forces sequential execution
        so the kill point is deterministic.
        """
        import threading
        from concurrent.futures import ThreadPoolExecutor

        done = self.completed_buckets()
        self._materialize_input(transcripts)
        todo = [b for b in range(self.num_buckets) if b not in done]
        if fail_after is not None:
            max_concurrency = 1

        lock = threading.Lock()
        processed = 0

        def one(b: int) -> None:
            nonlocal processed
            stats = self._run_bucket(entity_dict, b)
            with lock:
                self._commit(stats)
                processed += 1
                if fail_after is not None and processed >= fail_after:
                    raise RuntimeError(f"injected failure after {processed} buckets")

        if max_concurrency <= 1:
            for b in todo:
                one(b)
        else:
            with ThreadPoolExecutor(max_workers=max_concurrency) as ex:
                futures = [ex.submit(one, b) for b in todo]
                for f in futures:
                    f.result()  # propagate the first failure
        return processed

    # -- reads -------------------------------------------------------------
    def triples(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, "triples"))

    def nodes(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, "nodes"))

    def metrics(self) -> DataFrame:
        return self.spark.read.json(
            os.path.join(self.out_dir, METRICS_DIR, "metrics.jsonl")
        )
