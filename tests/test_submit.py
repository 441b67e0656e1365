"""spark-submit run surface (north rule: `spark-submit --py-files` at two
cluster sizes): the packaging tool, the job runner, and one true
subprocess spark-submit round trip."""

import json
import os
import subprocess
import sys
import zipfile

from .conftest import MTX_DIR, REPO


def test_package_zip_contents(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    out = package.build(tmp_path)
    with zipfile.ZipFile(out) as z:
        names = z.namelist()
    assert "leiden_communities_openmp_spark/operators/leiden.py" in names
    assert "leiden_communities_openmp_spark/session.py" in names
    assert not any("__pycache__" in n or "/tests/" in n for n in names)


def test_run_job_pagerank_inprocess(spark, tmp_path):
    """The job runner on an existing session (getOrCreate path): pagerank
    over a parquet edge table, normalized like any raw input."""
    import main as submit_main

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (4, 1, 1.0)],
        "src long, dst long, w double")
    inp = str(tmp_path / "edges")
    edges.write.parquet(inp)
    out = str(tmp_path / "pr")
    args = submit_main._parse(["pagerank", "--input", inp, "--output", out,
                               "--iterations", "3"])
    metrics = submit_main.run_job(spark, args)
    assert metrics["rows"] == 4
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "rank"}
    assert got.count() == 4


def test_spark_submit_leiden_roundtrip(tmp_path):
    """True spark-submit: package with tools/package.py, submit main.py with
    --py-files at local[4], and check membership parquet + metrics JSON +
    S7 CSV against the karate golden modularity."""
    import pathlib

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import package

    zip_path = package.build(tmp_path)
    out = tmp_path / "membership"
    metrics = tmp_path / "metrics.json"
    csv_out = tmp_path / "results.csv"
    cmd = [
        "spark-submit", "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", str(zip_path),
        os.path.join(REPO, "main.py"), "leiden",
        "--input", os.path.join(MTX_DIR, "karate.mtx"),
        "--output", str(out), "--metrics", str(metrics),
        "--csv", str(csv_out), "--graph-name", "karate",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-3000:]
    m = json.loads(metrics.read_text())
    gold = json.loads(pathlib.Path(
        os.path.join(REPO, "tests", "golden", "karate.leiden.txt")
    ).read_text().splitlines()[0])
    assert abs(m["modularity"] - gold["modularity"]) < 1e-6
    assert csv_out.exists() and "leidenSpark" in csv_out.read_text()
    assert any(f.endswith(".parquet") for f in os.listdir(out))
