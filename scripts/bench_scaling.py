"""Two-cluster-size scaling benchmark → BENCH/BASELINE.md.

The north rule requires throughput scaling efficiency >= 0.8 between N and
4N executor clusters. In-sandbox substitute (per driver instruction): run the
SAME KG-construction job on the SAME deterministic input at two parallelism
levels — local[8] and local[32] — in separate JVMs, and report triples/sec at
both plus efficiency = throughput(32) / (4 * throughput(8)).

Usage:
    python scripts/bench_scaling.py                # parent: runs both, writes md
    python scripts/bench_scaling.py --child local[8]   # child: one timed run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "500000"))
DATA = os.path.join(REPO, "BENCH", "data", f"transcripts_{TURNS}")


def child(master: str) -> None:
    """One warm-up + two timed end-to-end pipeline runs at the given master."""
    cores = int(master.split("[")[1].rstrip("]"))
    from open_source_legislation_spark import schemas, synth
    from open_source_legislation_spark.plans.pipeline import run_pipeline
    from open_source_legislation_spark.session import get_spark
    from open_source_legislation_spark.sources.io import read_transcripts

    spark = get_spark(
        app_name=f"osl-scaling-{cores}",
        master=master,
        # shuffle partitions scale with cores (what spark-submit conf would
        # do on a real N vs 4N cluster); AQE coalesces the tail.
        extra_conf={"spark.sql.shuffle.partitions": str(cores)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    entity_dict = spark.createDataFrame(
        synth.make_entity_dictionary(), schema=schemas.ENTITY_DICTIONARY
    )

    def one_run() -> tuple[float, int]:
        transcripts = read_transcripts(spark, DATA)
        t0 = time.time()
        res = run_pipeline(spark, transcripts, entity_dict, num_partitions=cores)
        n = res.triples.count()
        wall = time.time() - t0
        res.turns.unpersist()
        return wall, n

    one_run()  # warm-up: JIT/codegen, Python worker pool spin-up
    walls, n_triples = [], 0
    for _ in range(2):
        w, n_triples = one_run()
        walls.append(w)
    spark.stop()
    wall = min(walls)
    print(
        "CHILD_RESULT "
        + json.dumps(
            {
                "master": master,
                "cores": cores,
                "wall_sec": round(wall, 3),
                "triples": n_triples,
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )


def run_child(master: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", master],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"child {master} produced no result")


def main() -> None:
    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        raise SystemExit(f"bench input missing: {DATA} (run bench.py once first)")
    small = run_child("local[8]")
    print(json.dumps(small))
    big = run_child("local[32]")
    print(json.dumps(big))
    eff = big["triples_per_sec"] / (4.0 * small["triples_per_sec"])
    result = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "small": small,
        "big": big,
        "turns": TURNS,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    write_md(result)


def write_md(r: dict) -> None:
    md = f"""# BENCH/BASELINE.md — scaling + throughput evidence

North rule: throughput scaling efficiency >= 0.8 between N and 4N executors.
Sandbox substitute (no real cluster available): the SAME end-to-end
KG-construction job (ordered reassembly -> hierarchy windows -> mention +
definition Arrow kernels -> broadcast entity linking -> triples materialize)
on the SAME deterministic input ({r["turns"]:,} transcript turns, seed 42,
`BENCH/data/transcripts_{r["turns"]}`) at two parallelism levels in separate
JVMs, `spark.sql.shuffle.partitions` = cores (as spark-submit conf would set
per cluster size), AQE on. One warm-up run then best of 2 timed runs.

| config | cores | wall (s) | triples | triples/sec |
|---|---|---|---|---|
| local[8]  (N)  | 8  | {r["small"]["wall_sec"]} | {r["small"]["triples"]:,} | {r["small"]["triples_per_sec"]:,} |
| local[32] (4N) | 32 | {r["big"]["wall_sec"]} | {r["big"]["triples"]:,} | {r["big"]["triples_per_sec"]:,} |

**Scaling efficiency** = throughput(32) / (4 x throughput(8)) =
**{r["value"]}** ({"PASS" if r["pass"] else "FAIL"} vs the >= 0.8 target).

Reference baseline context (`BASELINE.md`): the reference is a single-process
per-row loop (one Postgres round-trip per node, ThreadPool of 10 for
embedding calls) and publishes no throughput numbers; its batch knobs are
100/1000 rows. Our engine processes the whole corpus as one DataFrame DAG
with a single wide exchange on `hash(conv_id)` plus broadcast joins, so
per-turn cost is dominated by the two Arrow kernels and scales with cores
until the input is partition-starved.

Regenerate: `python scripts/bench_scaling.py` (input auto-generated by
`bench.py` on first run).
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()
