"""Interleaved A/B: derived-frame materialization `spill="parquet"` vs
`spill="persist"` (round-2 verdict #3).

Round 2 changed the pipeline's default materialization to a columnar
parquet spill in the same window the recorded kg_pipeline bench regressed
(warm 3.44 s → 5.74 s); the two candidate explanations are host-throughput
noise (the VM's deliverable cores swing 30-50% between runs) and real
spill overhead. This script separates them the only way that works here:
both configs run INTERLEAVED in ONE session (A B A B …), warm-up first,
best-of and median per config reported side by side — any host swing hits
both configs equally.

Usage: python scripts/bench_spill_ab.py [rounds]   (default 4)
Writes one JSON line; paste the verdict into SCALE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "500000"))
DATA = os.path.join(REPO, "BENCH", "data", f"transcripts_{TURNS}")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from open_source_legislation_spark import schemas, synth
    from open_source_legislation_spark.plans.pipeline import run_pipeline
    from open_source_legislation_spark.session import get_spark
    from open_source_legislation_spark.sources.io import read_transcripts

    spark = get_spark(app_name="osl-spill-ab")
    spark.sparkContext.setLogLevel("ERROR")
    entity_dict = spark.createDataFrame(
        synth.make_entity_dictionary(), schema=schemas.ENTITY_DICTIONARY
    )
    transcripts = read_transcripts(spark, DATA)

    def one(spill: str) -> float:
        t0 = time.time()
        res = run_pipeline(spark, transcripts, entity_dict, spill=spill)
        res.triples.count()
        wall = time.time() - t0
        res.cleanup()
        return wall

    # one warm-up per config (JIT/codegen + Python worker spin-up)
    for mode in ("parquet", "persist"):
        one(mode)

    times: dict[str, list[float]] = {"parquet": [], "persist": []}
    for _ in range(rounds):
        for mode in ("parquet", "persist"):
            times[mode].append(round(one(mode), 3))

    out = {"turns": TURNS, "rounds": rounds, "runs": times}
    for mode, ts in times.items():
        out[f"{mode}_best"] = min(ts)
        out[f"{mode}_median"] = round(statistics.median(ts), 3)
        out[f"{mode}_spread_pct"] = round(100 * (max(ts) - min(ts)) / min(ts), 1)
    out["best_ratio_parquet_over_persist"] = round(
        out["parquet_best"] / out["persist_best"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
