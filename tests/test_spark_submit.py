"""Real `spark-submit --py-files` deployment drive — the submission
surface the north rule names (the in-process CLI tests in test_cli.py
cover flag semantics; this one proves the packaged artifact actually
ships and runs under a fresh driver JVM with the package resolved from
the zip, plus checkpoint/resume across two submissions)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from redeye_spark.schema import RAW_SEQUENCES
from redeye_spark.sources.datagen import gen_frame

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("submit"))
    pdf = gen_frame(1500, fmt="common", seed=23)
    spark.createDataFrame(pdf.drop(columns=["line"]), schema=RAW_SEQUENCES) \
        .write.mode("overwrite").parquet(base + "/raw")
    return base


@pytest.fixture(scope="module")
def pkg_zip(tmp_path_factory):
    zpath = str(tmp_path_factory.mktemp("pkg") / "redeye_spark.zip")
    pkg = os.path.join(_REPO, "redeye_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO))
    return zpath


def _submit(pkg_zip, *job_args):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")
    env = dict(os.environ)
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    cmd = [
        submit, "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.ui.enabled=false",
        "--py-files", pkg_zip,
        os.path.join(_REPO, "redeye_spark", "job.py"),
        *job_args,
    ]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=420)


def test_submit_runs_pipeline_and_resumes(corpus, pkg_zip, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    args = ("--common-format", "--input", corpus + "/raw", "--output", out,
            "--checkpoint-dir", ckpt, "--chunks", "3")

    first = _submit(pkg_zip, *args)
    assert first.returncode == 0, first.stderr[-4000:]
    stats = json.loads(first.stdout.strip().splitlines()[-1])
    assert stats["rows_in"] == 1500
    assert stats["rows_ok"] + stats["rows_err"] == 1500
    assert os.path.isdir(out) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(out) for f in fs
    )
    manifest = json.load(open(os.path.join(ckpt, "manifest.json")))
    done = {k: e["completed_at"] for k, e in manifest["chunks"].items()
            if e["status"] == "complete"}
    assert len(done) == 3

    # second submission resumes from the manifest: all chunks already
    # complete -> zero recompute (completed_at stamps unchanged), same
    # totals reported from the per-chunk lineage
    second = _submit(pkg_zip, *args, "--resume")
    assert second.returncode == 0, second.stderr[-4000:]
    stats2 = json.loads(second.stdout.strip().splitlines()[-1])
    assert stats2["rows_in"] == stats["rows_in"]
    assert stats2["chunks"] == 3
    manifest2 = json.load(open(os.path.join(ckpt, "manifest.json")))
    assert {k: e["completed_at"] for k, e in manifest2["chunks"].items()} == done
