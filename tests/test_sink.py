"""Idempotency / resume contract of the snapshot-table sink (K1, J2)."""

from __future__ import annotations

import os

from biomedical_knowledge_graph_spark.sinks.table_format import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "subj string, obj string, w long")


def test_merge_append_idempotent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "edges"), key_cols=["subj", "obj"])
    r1 = t.merge_append(_df(spark, [("a", "b", 1), ("a", "c", 2)]), run_id="r1")
    assert r1["rows_added"] == 2
    # replay of the same batch: zero new rows
    r2 = t.merge_append(_df(spark, [("a", "b", 1), ("a", "c", 2)]), run_id="r2")
    assert r2["rows_added"] == 0
    # overlapping batch: only the new key lands
    r3 = t.merge_append(_df(spark, [("a", "c", 9), ("d", "e", 3)]), run_id="r3")
    assert r3["rows_added"] == 1
    assert t.count(spark) == 3
    t.assert_unique_keys(spark)
    assert [line["run_id"] for line in t.lineage()] == ["r1", "r2", "r3"]


def test_crash_before_commit_is_invisible(spark, tmp_path):
    root = str(tmp_path / "t")
    t = SnapshotTable(root, key_cols=["subj", "obj"])
    t.merge_append(_df(spark, [("a", "b", 1)]))
    # simulate a crashed writer: orphan parquet directory, no manifest
    orphan = os.path.join(root, "data", "part-999999-deadbeef")
    _df(spark, [("zz", "zz", 0)]).write.parquet(orphan)
    assert t.count(spark) == 1  # reader sees only manifest-listed files
    # resume: rerun the batch that "crashed" — lands exactly once
    t.merge_append(_df(spark, [("zz", "zz", 0)]))
    assert t.count(spark) == 2


def test_dedup_within_batch(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "d"), key_cols=["subj", "obj"])
    r = t.merge_append(_df(spark, [("a", "b", 1), ("a", "b", 2)]))
    assert r["rows_added"] == 1


def test_partitioned_bucketed_sink(spark, tmp_path):
    import os

    t = SnapshotTable(
        str(tmp_path / "p"),
        key_cols=["subj", "obj"],
        bucket_expr="pmod(xxhash64(subj), 4)",
    )
    rows = [(f"s{i}", f"o{i}", i) for i in range(40)]
    t.merge_append(_df(spark, rows))
    # hive-style bucket dirs exist
    data_root = os.path.join(str(tmp_path / "p"), "data")
    part = os.listdir(data_root)[0]
    buckets = [
        d for d in os.listdir(os.path.join(data_root, part))
        if d.startswith("_bucket=")
    ]
    assert len(buckets) >= 2
    # read-back is complete and idempotent merge still holds
    assert t.count(spark) == 40
    t.merge_append(_df(spark, rows))
    assert t.count(spark) == 40
    # partition pruning: a _bucket filter reaches PartitionFilters
    df = t.read(spark).filter("_bucket = 1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_bucket" in plan
