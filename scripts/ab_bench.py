"""One A/B sample: run the KG headline (pipeline cold + best-of-2 warm,
nodes-full once) from a given repo checkout, print ONE JSON line.

Usage: python scripts/ab_bench.py <repo_path> <label> [master]

Both sides read the SAME cached transcripts parquet (the main repo's
BENCH/data), so the comparison isolates engine-code differences from
input generation. Interleave invocations (A,B,A,B,...) under `taskset`
and take best-of per side — the protocol BENCH/BASELINE.md uses for
this host's unreliable core delivery.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(sys.argv[1])
LABEL = sys.argv[2]
MASTER = sys.argv[3] if len(sys.argv) > 3 else "local[16]"
TRANSCRIPTS = os.environ.get(
    "AB_TRANSCRIPTS",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "BENCH", "data", "transcripts_500000"),
)

sys.path.insert(0, REPO)

from open_source_legislation_spark import schemas, synth  # noqa: E402
from open_source_legislation_spark.plans.pipeline import run_pipeline  # noqa: E402
from open_source_legislation_spark.session import get_spark  # noqa: E402
from open_source_legislation_spark.sources.io import read_transcripts  # noqa: E402


def one_pipeline(spark, transcripts, entity_dict, count_nodes=False):
    t0 = time.time()
    res = run_pipeline(spark, transcripts, entity_dict, num_partitions=None)
    if count_nodes:
        res.nodes.write.format("noop").mode("overwrite").save()
        n = -1
    else:
        n = res.triples.count()
    wall = time.time() - t0
    res.cleanup()
    return wall, n


def main():
    spark = get_spark(app_name=f"ab-{LABEL}", master=MASTER)
    spark.sparkContext.setLogLevel("ERROR")
    entity_dict = spark.createDataFrame(
        synth.make_entity_dictionary(), schema=schemas.ENTITY_DICTIONARY
    )
    transcripts = read_transcripts(spark, TRANSCRIPTS)

    cold, _ = one_pipeline(spark, transcripts, entity_dict)
    w1, n = one_pipeline(spark, transcripts, entity_dict)
    w2, _ = one_pipeline(spark, transcripts, entity_dict)
    nodes, _ = one_pipeline(spark, transcripts, entity_dict, count_nodes=True)
    warm = min(w1, w2)
    print(json.dumps({
        "label": LABEL,
        "repo": REPO,
        "master": MASTER,
        "kg_cold": round(cold, 3),
        "kg_warm_best2": round(warm, 3),
        "kg_warm_both": [round(w1, 3), round(w2, 3)],
        "kg_nodes_full": round(nodes, 3),
        "triples": n,
        "triples_per_sec": round(n / warm, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
