"""Bucket-mode vs single-job wall — evidence for the checkpointed runner.

Round-2 verdict #8 asked for a bench showing that the 8-bucket
checkpointed run (directory-pruned bucketed input, concurrent FAIR-pool
jobs) costs roughly the single-job wall — i.e. that resumability is not
paid for with a B× input re-scan. Both modes run in ONE session,
interleaved (single, bucket, single, bucket) so host-throughput swings
hit both alike; best-of per mode is reported (the builder's standard
methodology for this VM, see SCALE.md "measurement methodology").

Usage: python scripts/bench_buckets.py   # writes one JSON line to stdout
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(os.environ.get("SPARK_GRAFT_BUCKET_ROUNDS", "2"))
NUM_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "8"))


def single_job(spark, transcripts_path: str, entity_dict) -> float:
    from open_source_legislation_spark.plans.pipeline import run_pipeline
    from open_source_legislation_spark.sources.io import read_transcripts

    out = tempfile.mkdtemp(prefix="oslspark_single_")
    transcripts = read_transcripts(spark, transcripts_path)
    t0 = time.time()
    res = run_pipeline(spark, transcripts, entity_dict)
    res.triples.write.mode("overwrite").parquet(os.path.join(out, "triples"))
    res.nodes.write.mode("overwrite").parquet(os.path.join(out, "nodes"))
    wall = time.time() - t0
    res.cleanup()
    shutil.rmtree(out, ignore_errors=True)
    return wall


def bucket_job(spark, transcripts_path: str, entity_dict) -> float:
    from open_source_legislation_spark.plans.checkpoint import CheckpointedRunner
    from open_source_legislation_spark.sources.io import read_transcripts

    out = tempfile.mkdtemp(prefix="oslspark_buckets_")
    transcripts = read_transcripts(spark, transcripts_path)
    runner = CheckpointedRunner(
        spark, out_dir=out, run_id="bench", num_buckets=NUM_BUCKETS
    )
    t0 = time.time()
    runner.run(transcripts, entity_dict, max_concurrency=4)
    wall = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return wall


def main() -> None:
    from bench import ensure_bench_transcripts

    from open_source_legislation_spark import schemas, synth
    from open_source_legislation_spark.session import get_spark

    spark = get_spark(app_name="osl-bench-buckets", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    transcripts_path = ensure_bench_transcripts(spark)
    entity_dict = spark.createDataFrame(
        synth.make_entity_dictionary(), schema=schemas.ENTITY_DICTIONARY
    )

    # warm-up (JIT, Arrow workers, page cache)
    single_job(spark, transcripts_path, entity_dict)

    singles, buckets = [], []
    for _ in range(ROUNDS):
        singles.append(single_job(spark, transcripts_path, entity_dict))
        buckets.append(bucket_job(spark, transcripts_path, entity_dict))

    result = {
        "metric": "bucket_overhead_ratio",
        "value": round(min(buckets) / min(singles), 3),
        "unit": "x_single_job_wall",
        "num_buckets": NUM_BUCKETS,
        "single_runs_sec": [round(s, 3) for s in singles],
        "bucket_runs_sec": [round(b, 3) for b in buckets],
        "single_best_sec": round(min(singles), 3),
        "bucket_best_sec": round(min(buckets), 3),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
