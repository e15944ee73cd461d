"""End-to-end spark-submit --py-files exercise (north rule: the job must
run via ``spark-submit --py-files`` and resume from checkpoint).

Runs the real ``spark-submit`` binary in a subprocess against a zipped copy
of the package — the exact cluster deployment path — then kills a run at a
bucket boundary and proves the resume completes to identical output.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _build_zip(tmp_path) -> str:
    zpath = str(tmp_path / "osl_spark.zip")
    pkg = os.path.join(REPO, "open_source_legislation_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(zpath: str, *job_args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # keep the subprocess from inheriting the repo on PYTHONPATH so the
    # --py-files zip is genuinely what provides the package
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=4",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "submit_job.py"),
            *job_args,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(os.path.dirname(zpath)),
    )


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_submit_and_resume(tmp_path, spark):
    from open_source_legislation_spark import schemas, synth

    tdata = str(tmp_path / "transcripts")
    pdf = synth.make_transcripts(seed=11, n_turns_target=600)
    spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS).write.parquet(tdata)

    zpath = _build_zip(tmp_path)
    out1 = str(tmp_path / "out_full")
    res = _submit(zpath, "--input", tdata, "--out", out1, "--buckets", "4")
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["buckets_processed"] == 4
    assert summary["triples"] > 0

    # kill after 2 buckets, then resume — resumed output == one-shot output
    out2 = str(tmp_path / "out_resume")
    killed = _submit(
        zpath, "--input", tdata, "--out", out2, "--buckets", "4",
        "--run-id", "r1", "--fail-after", "2",
    )
    assert killed.returncode != 0  # injected failure propagates
    resumed = _submit(
        zpath, "--input", tdata, "--out", out2, "--buckets", "4",
        "--run-id", "r1",
    )
    assert resumed.returncode == 0, resumed.stderr[-3000:]
    summary2 = json.loads(resumed.stdout.strip().splitlines()[-1])
    assert summary2["buckets_processed"] == 2  # only the unfinished half

    full = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out1, "triples"))
        .select("subj", "pred", "obj")
        .collect()
    }
    res2 = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(out2, "triples"))
        .select("subj", "pred", "obj")
        .collect()
    }
    assert full == res2
