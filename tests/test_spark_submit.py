"""spark-submit --py-files packaging: the index-build job runs end-to-end
from the zipped package, as the north rule requires."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from tools.make_pyfiles_zip import make_zip

    zip_path = make_zip(str(tmp_path / "koncorde_spark.zip"), repo)
    out_dir = str(tmp_path / "idx")

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(os.__file__)),
        "site-packages", "pyspark", "bin", "spark-submit",
    )
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # prove imports come from the zip
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=2",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(repo, "jobs", "build_index_job.py"),
            "--output", out_dir,
            "--shards", "2",
            "--synthetic-rows", "200",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # not the repo dir — the zip must provide the pkg
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    meta_line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    meta = json.loads(meta_line)
    assert meta["n_docs"] == 200
    assert os.path.exists(os.path.join(out_dir, "postings"))
    assert os.path.exists(os.path.join(out_dir, "meta.json"))
