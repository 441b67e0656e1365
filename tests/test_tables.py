"""Iceberg-style snapshot table layout (plans/tables.py): snapshot
isolation, time travel, history, and the atomic current-pointer commit."""

from leiden_communities_openmp_spark.plans.tables import (
    current_snapshot_id, read_snapshot, snapshot_history, write_snapshot,
)


def test_snapshot_write_read_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    s1 = write_snapshot(d1, root)
    assert s1 == 1 and current_snapshot_id(root) == 1

    d2 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    s2 = write_snapshot(d2, root, operation="append")
    assert s2 == 2 and current_snapshot_id(root) == 2

    # current read sees snapshot 2; time travel to 1 sees the old rows
    assert read_snapshot(spark, root).count() == 3
    old = {r["id"] for r in read_snapshot(spark, root, snapshot_id=1).collect()}
    assert old == {1, 2}

    hist = snapshot_history(root)
    assert [h["snapshot_id"] for h in hist] == [1, 2]
    assert hist[1]["parent_id"] == 1 and hist[0]["parent_id"] is None
    assert hist[1]["row_count"] == 3


def test_partitioned_snapshot_prunes(spark, tmp_path):
    """partition_by produces hive-layout dirs a filtered read can prune."""
    root = str(tmp_path / "ptbl")
    d = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "id long, lang string")
    write_snapshot(d, root, partition_by=["lang"])
    got = read_snapshot(spark, root).filter("lang = 'en'")
    assert got.count() == 2
    # the pruned scan must carry the partition filter, not scan both dirs
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "lang" in plan


def test_run_job_snapshot_output(spark, tmp_path):
    """--output-format snapshot routes job results through the Iceberg-style
    layout: manifest + current pointer, readable via read_snapshot and by a
    second run committing snapshot 2 with snapshot-1 history intact."""
    import main as submit_main

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src long, dst long, w double")
    inp = str(tmp_path / "edges")
    edges.write.parquet(inp)
    out = str(tmp_path / "cc_snap")
    argv = ["cc", "--input", inp, "--output", out, "--output-format", "snapshot"]
    m1 = submit_main.run_job(spark, submit_main._parse(argv))
    assert m1["rows"] == 3 and current_snapshot_id(out) == 1
    submit_main.run_job(spark, submit_main._parse(argv))
    assert current_snapshot_id(out) == 2
    assert read_snapshot(spark, out, snapshot_id=1).count() == 3
    assert [h["snapshot_id"] for h in snapshot_history(out)] == [1, 2]
