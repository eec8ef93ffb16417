"""Snapshot-table sink: idempotent, resumable, deduplicated materialization.

Contract (north_rule): "resumable from checkpoint with per-partition
lineage + metrics". The reference implements resume as *offset skipping* —
count already-written edges per source_file and skip that many input rows
(kg_scripts/go_kg_builder.py:1551-1572, 1514-1515) — which is
ordering-fragile. This sink is **key-based**: a write is an anti-join of
staged rows against already-committed keys, so replays are exact no matter
the order (SURVEY.md §4 "resume-from-progress" row).

On a real deployment this module is Iceberg:
    df.writeTo(tbl).append()  /  MERGE INTO tbl USING stage ON keys ...
with snapshot ids as checkpoints. The Iceberg runtime jar is unavailable
offline, so the same contract is implemented over parquet + an atomically
renamed JSON manifest per snapshot:

    <root>/data/part-<snapshot>-*.parquet       immutable data files
    <root>/snapshots/<n>.json                   manifest: files, lineage
    <root>/HEAD                                 current snapshot number

A crashed write leaves orphan parquet parts that no manifest references —
readers only read manifest-listed files, so partial writes are invisible
(same reader contract as Iceberg).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(
        self,
        root: str,
        key_cols: list[str],
        partition_cols: list[str] | None = None,
        bucket_expr: str | None = None,
    ):
        """``partition_cols``: hive-style partition columns for each data
        part (Iceberg identity partitioning). ``bucket_expr``: a SQL
        expression computed into a ``_bucket`` partition column (Iceberg
        ``bucket(n, col)`` transform analogue, e.g.
        ``"pmod(xxhash64(subj), 16)"``) so point lookups and co-located
        joins prune files."""
        self.root = root
        self.key_cols = list(key_cols)
        self.partition_cols = list(partition_cols or [])
        self.bucket_expr = bucket_expr
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest plumbing ---------------------------------------------------
    def _head(self) -> int:
        p = os.path.join(self.root, "HEAD")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, snap: int) -> dict:
        with open(os.path.join(self.root, "snapshots", f"{snap}.json")) as f:
            return json.load(f)

    def current_files(self) -> list[str]:
        snap = self._head()
        if snap == 0:
            return []
        return self._manifest(snap)["files"]

    def lineage(self) -> list[dict]:
        """Per-commit lineage rows: snapshot, run_id, rows added, wall time."""
        out = []
        for snap in range(1, self._head() + 1):
            m = self._manifest(snap)
            out.append(m["lineage"])
        return out

    # -- read ------------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        files = self.current_files()
        if not files:
            return None
        # each committed part dir is its own hive-partitioned root (its
        # partition values are self-describing), so multiple snapshots must
        # be loaded per-root and unioned — one multi-path read throws
        # CONFLICTING_DIRECTORY_STRUCTURES as soon as a table has two
        # row-adding commits
        out = None
        for f in files:
            df = spark.read.parquet(f)
            out = df if out is None else out.unionByName(
                df, allowMissingColumns=True
            )
        return out

    # -- write -------------------------------------------------------------------
    def merge_append(self, df: DataFrame, run_id: str | None = None) -> dict:
        """Append rows whose key is not yet committed (Iceberg
        ``MERGE INTO ... WHEN NOT MATCHED INSERT`` / J2 duplicate-edge
        anti-join, go_kg_builder.py:1317-1343). Returns the lineage row.

        Idempotent: re-running the same staged batch after a crash commits
        zero new rows."""
        spark = df.sparkSession
        t0 = time.time()
        existing = self.read(spark)
        staged = df.dropDuplicates(self.key_cols)
        if existing is not None:
            staged = staged.join(
                existing.select(self.key_cols), self.key_cols, "left_anti"
            )

        snap = self._head() + 1
        part_dir = os.path.join(
            self.root, "data", f"part-{snap:06d}-{uuid.uuid4().hex[:8]}"
        )
        # count before write: an all-duplicates batch writes nothing (an
        # empty partitioned dir would carry no schema and break readers)
        staged = staged.persist()
        added = staged.count()
        partition_counts: list[dict] | None = None
        if added:
            writer = staged
            part_cols = list(self.partition_cols)
            if self.bucket_expr:
                from pyspark.sql import functions as _F

                writer = writer.withColumn("_bucket", _F.expr(self.bucket_expr))
                part_cols.append("_bucket")
            if part_cols:
                # per-partition counters in the lineage row (north_rule:
                # "every partition emits lineage rows + counters"); reads
                # the persisted stage, so this is one cheap aggregate. The
                # limit is applied BEFORE collect so a pathological
                # partition count bounds driver memory, not just the
                # manifest size — the rows_added total is always exact.
                counts = (
                    writer.groupBy(*part_cols)
                    .count()
                    .orderBy(*part_cols)
                    .limit(10_001)
                ).collect()
                if len(counts) <= 10_000:
                    partition_counts = [
                        {**{c: r[c] for c in part_cols}, "rows": r["count"]}
                        for r in counts
                    ]
                else:  # pragma: no cover - bounded-manifest guard
                    partition_counts = [
                        {"partitions": "10000+", "rows": added}
                    ]
            w = writer.write.mode("overwrite")
            if part_cols:
                w = w.partitionBy(*part_cols)
            w.parquet(part_dir)
        staged.unpersist()

        lineage = {
            "snapshot": snap,
            "run_id": run_id or uuid.uuid4().hex,
            "rows_added": added,
            "key_cols": self.key_cols,
            "wall_s": round(time.time() - t0, 3),
            "partition_counts": partition_counts,
        }
        manifest = {
            "files": self.current_files() + ([part_dir] if added else []),
            "lineage": lineage,
        }
        tmp = os.path.join(self.root, "snapshots", f".{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, "snapshots", f"{snap}.json"))
        # HEAD flip is the atomic commit point
        tmp_head = os.path.join(self.root, ".HEAD.tmp")
        with open(tmp_head, "w") as f:
            f.write(str(snap))
        os.replace(tmp_head, os.path.join(self.root, "HEAD"))
        return lineage

    def count(self, spark: SparkSession) -> int:
        df = self.read(spark)
        return 0 if df is None else df.count()

    def assert_unique_keys(self, spark: SparkSession) -> None:
        df = self.read(spark)
        if df is None:
            return
        dupes = (
            df.groupBy(self.key_cols).count().filter(F.col("count") > 1).count()
        )
        if dupes:
            raise AssertionError(f"{dupes} duplicate keys in {self.root}")
