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

    <root>/data/_snap=<n>/[part_col=v/...][_bucket=k/]*.parquet
    <root>/snapshots/<n>.json          manifest: snapshot roots, lineage
    <root>/HEAD                        current snapshot number

The snapshot id is itself a hive partition directory (``_snap=<n>``), so
ALL committed snapshots read as ONE parquet relation (multi-path +
``basePath``): plan depth is O(1) in commit count, and filters on the
``_bucket`` column prune files via ordinary partition pruning. A crashed
write leaves files under a ``_snap`` dir no manifest references — readers
load only manifest-listed snapshot roots, so partial writes are invisible
(same reader contract as Iceberg).

Scale design (round-3 hardening, VERDICT r2 items 1/3):
- ``merge_append`` anti-joins staged rows against ONLY the committed
  buckets the staged batch touches (``_bucket`` partition pruning), not
  the full table — per-commit read cost is proportional to the staged
  batch's key space, mirroring Iceberg's MERGE scan pruning and the
  reference's index-backed duplicate pre-check
  (go_kg_builder.py:1317-1343, neo4j_indexes.txt).
- ``compact()`` rewrites all live snapshots into one (Iceberg
  ``rewrite_data_files`` maintenance analogue); ``compact_after`` runs it
  automatically once the snapshot count exceeds a bound, keeping file
  count and manifest size O(1) for long-lived tables.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# more distinct staged buckets than this → skip pruning (the filter would
# enumerate too many literals; a batch touching >4096 buckets is close to
# a full-table merge anyway, where pruning buys nothing)
_MAX_PRUNE_BUCKETS = 4096


class SnapshotTable:
    def __init__(
        self,
        root: str,
        key_cols: list[str],
        partition_cols: list[str] | None = None,
        bucket_expr: str | None = None,
        compact_after: int | None = None,
    ):
        """``partition_cols``: hive-style partition columns for each data
        part (Iceberg identity partitioning). ``bucket_expr``: a SQL
        expression computed into a ``_bucket`` partition column (Iceberg
        ``bucket(n, col)`` transform analogue, e.g.
        ``"pmod(xxhash64(subj), 16)"``) so point lookups and co-located
        joins prune files. The expression MUST be a deterministic function
        of the key columns (the Iceberg bucket-transform contract) — merge
        pruning relies on a key always landing in the same bucket.
        ``compact_after``: auto-compact when live snapshots exceed this."""
        self.root = root
        self.key_cols = list(key_cols)
        self.partition_cols = list(partition_cols or [])
        self.bucket_expr = bucket_expr
        self.compact_after = compact_after
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

    def _data_dir(self) -> str:
        return os.path.join(self.root, "data")

    def _snap_dir(self, snap: int) -> str:
        return os.path.join(self._data_dir(), f"_snap={snap}")

    def current_files(self) -> list[str]:
        """Live snapshot roots (``.../data/_snap=<n>`` dirs).

        Manifest entries are re-rooted under THIS handle's ``root``
        spelling: the manifest stores the writing handle's path strings,
        and an equivalent-but-differently-spelled root (``./tbl`` vs
        ``tbl``, abspath vs relative, a symlinked parent) must not change
        which snapshots are considered live — vacuum deletes anything not
        in this list, so a string mismatch here would be data loss."""
        snap = self._head()
        if snap == 0:
            return []
        return [self._snap_dir(n) for n in self._live_snap_numbers(snap)]

    def _live_snap_numbers(self, head: int) -> list[int]:
        """Snapshot numbers referenced by the HEAD manifest, parsed from
        each entry's ``_snap=<n>`` basename (spelling-independent)."""
        out = []
        for f in self._manifest(head)["files"]:
            base = os.path.basename(os.path.normpath(f))
            prefix, _, num = base.partition("=")
            if prefix != "_snap" or not num.isdigit():
                raise ValueError(
                    f"corrupt manifest entry {f!r} in snapshot {head}"
                )
            out.append(int(num))
        return out

    def lineage(self) -> list[dict]:
        """Per-commit lineage rows: snapshot, run_id, rows added, wall time."""
        out = []
        for snap in range(1, self._head() + 1):
            m = self._manifest(snap)
            out.append(m["lineage"])
        return out

    # -- read ------------------------------------------------------------------
    def read(
        self, spark: SparkSession, as_of: int | None = None
    ) -> DataFrame | None:
        """One multi-path parquet relation over all live snapshot roots.

        ``basePath`` makes ``_snap`` (and ``_bucket``/partition cols) hive
        partition columns of a SINGLE FileScan — plan depth no longer grows
        with commit count, and ``_bucket`` filters become PartitionFilters.
        Falls back to a per-root union chain only if the merged read is
        impossible (conflicting data types across commits).

        ``as_of``: time travel — read the table as of snapshot number
        ``as_of`` (every commit's manifest is retained, so any historical
        state is one manifest lookup). Iceberg's caveat applies verbatim:
        ``compact()``'s vacuum deletes data dirs no longer referenced by
        HEAD, after which older snapshots that referenced them raise
        (snapshot EXPIRED) rather than silently returning partial data."""
        if as_of is None:
            files = self.current_files()
        else:
            head = self._head()
            if not (1 <= as_of <= head):
                raise ValueError(
                    f"as_of={as_of} out of range: table has snapshots"
                    f" 1..{head}"
                )
            files = [
                self._snap_dir(n) for n in self._live_snap_numbers(as_of)
            ]
            missing = [f for f in files if not os.path.isdir(f)]
            if missing:
                raise ValueError(
                    f"snapshot {as_of} EXPIRED: its data dirs were "
                    f"vacuumed by a later compaction: {missing}"
                )
        if not files:
            return None
        try:
            df = (
                spark.read.option("basePath", self._data_dir())
                .option("mergeSchema", "true")
                .parquet(*files)
            )
            return df.drop("_snap")
        except Exception:  # pragma: no cover - type-conflict fallback
            out = None
            for f in files:
                df = spark.read.parquet(f).drop("_snap")
                out = df if out is None else out.unionByName(
                    df, allowMissingColumns=True
                )
            return out

    # -- write -------------------------------------------------------------------
    def _existing_for_merge(
        self, spark: SparkSession, staged_buckets: list | None
    ) -> DataFrame | None:
        """The committed side of the duplicate anti-join, bucket-pruned.

        When the staged batch's distinct ``_bucket`` values are known (and
        few), the committed relation is filtered to those buckets BEFORE
        the key anti-join — since ``bucket_expr`` is a function of the key
        columns, a duplicate key can only live in the same bucket, so the
        prune is exact while the scan touches only the staged buckets'
        files (PartitionFilters; asserted by test_sink)."""
        existing = self.read(spark)
        if existing is None:
            return None
        if (
            staged_buckets is not None
            and "_bucket" in existing.columns
            and len(staged_buckets) <= _MAX_PRUNE_BUCKETS
        ):
            # A caller-supplied bucket_expr may yield NULL; `isin([None,...])`
            # never matches the NULL-bucket partition under three-valued
            # logic, which would let duplicates in that bucket bypass the
            # anti-join. Add an explicit IS NULL disjunct for that case.
            non_null = [b for b in staged_buckets if b is not None]
            pred = F.col("_bucket").isin(non_null) if non_null else F.lit(False)
            if len(non_null) < len(staged_buckets):
                pred = pred | F.col("_bucket").isNull()
            existing = existing.filter(pred)
        return existing

    def merge_append(
        self,
        df: DataFrame,
        run_id: str | None = None,
        extra_lineage: dict | None = None,
    ) -> dict:
        """Append rows whose key is not yet committed (Iceberg
        ``MERGE INTO ... WHEN NOT MATCHED INSERT`` / J2 duplicate-edge
        anti-join, go_kg_builder.py:1317-1343). Returns the lineage row.

        Idempotent: re-running the same staged batch after a crash commits
        zero new rows. ``extra_lineage``: caller-supplied JSON-serializable
        fields merged into the lineage row (plan decisions, upstream
        counters) — reserved keys win over collisions."""
        spark = df.sparkSession
        t0 = time.time()
        reserved = {"_snap", "_bucket"} & set(df.columns)
        if reserved:
            raise ValueError(
                f"staged columns {sorted(reserved)} collide with the "
                "sink's reserved partition columns"
            )
        staged = df.dropDuplicates(self.key_cols)
        part_cols = list(self.partition_cols)
        staged_buckets = None
        if self.bucket_expr:
            staged = staged.withColumn("_bucket", F.expr(self.bucket_expr))
            part_cols.append("_bucket")
        # persist once: the stage feeds the bucket probe, the anti-join,
        # the count, the partition counters and the write
        pinned = [staged.persist()]
        try:
            if self.bucket_expr:
                # distinct staged buckets, probe-bounded: pmod-style bucket
                # transforms yield at most n values, so this collect is tiny;
                # a pathological expression overflowing the cap just skips
                # pruning instead of building a giant IN-list
                rows = (
                    staged.select("_bucket")
                    .distinct()
                    .limit(_MAX_PRUNE_BUCKETS + 1)
                    .collect()
                )
                if len(rows) <= _MAX_PRUNE_BUCKETS:
                    staged_buckets = [r["_bucket"] for r in rows]
            existing = self._existing_for_merge(spark, staged_buckets)
            if existing is not None:
                staged = staged.join(
                    existing.select(self.key_cols), self.key_cols, "left_anti"
                ).persist()
                pinned.append(staged)
            added = staged.count()
            snap = self._head() + 1
            partition_counts: list[dict] | None = None
            if added:
                writer = staged.withColumn("_snap", F.lit(snap))
                if part_cols:
                    # per-partition counters in the lineage row (north_rule:
                    # "every partition emits lineage rows + counters"); reads
                    # the persisted stage, so this is one cheap aggregate. The
                    # limit is applied BEFORE collect so a pathological
                    # partition count bounds driver memory, not just the
                    # manifest size — the rows_added total is always exact.
                    counts = (
                        staged.groupBy(*part_cols)
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
                self._write_snapshot(writer, snap, ["_snap"] + part_cols)
        finally:
            for p in pinned:
                p.unpersist()

        lineage = {
            **(extra_lineage or {}),
            "snapshot": snap,
            "run_id": run_id or uuid.uuid4().hex,
            "rows_added": added,
            "key_cols": self.key_cols,
            "wall_s": round(time.time() - t0, 3),
            "partition_counts": partition_counts,
            "pruned_buckets": (
                len(staged_buckets) if staged_buckets is not None else None
            ),
        }
        files = self.current_files() + ([self._snap_dir(snap)] if added else [])
        self._commit(snap, files, lineage)
        if self.compact_after and len(files) > self.compact_after:
            self.compact(spark, run_id=run_id)
        return lineage

    def _write_snapshot(
        self, writer: DataFrame, snap: int, part_cols: list[str]
    ) -> None:
        """Write one snapshot dir. ``mode("append")`` on the shared data
        root only touches ``_snap=<snap>``; a crash-leftover dir for this
        (by construction uncommitted) snapshot is removed first so retries
        never double-write."""
        target = self._snap_dir(snap)
        if os.path.exists(target):  # pragma: no cover - crash leftover
            shutil.rmtree(target)
        writer.write.mode("append").partitionBy(*part_cols).parquet(
            self._data_dir()
        )

    def _commit(self, snap: int, files: list[str], lineage: dict) -> None:
        manifest = {"files": files, "lineage": lineage}
        tmp = os.path.join(self.root, "snapshots", f".{snap}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.root, "snapshots", f"{snap}.json"))
        # HEAD flip is the atomic commit point
        tmp_head = os.path.join(self.root, ".HEAD.tmp")
        with open(tmp_head, "w") as f:
            f.write(str(snap))
        os.replace(tmp_head, os.path.join(self.root, "HEAD"))

    def compact(self, spark: SparkSession, run_id: str | None = None) -> dict:
        """Rewrite all live snapshots into one (Iceberg
        ``rewrite_data_files`` + ``expire_snapshots`` analogue): bounds
        file count and manifest size for long-lived tables; the superseded
        snapshot dirs are deleted after the new manifest commits.

        Concurrency contract (VERDICT r4 item 9): SINGLE WRITER, and
        readers get snapshot isolation at action granularity. A DataFrame
        planned from the pre-compaction manifest whose actions COMPLETE
        before ``compact()`` runs is unaffected; an action still in
        flight when the post-commit dir deletion lands can fail with
        FileNotFound and must re-plan via ``read()`` (which re-resolves
        the manifest) — the same exposure as Iceberg
        ``expire_snapshots`` with zero retention. Callers needing
        longer-lived reader leases should defer ``compact()`` (leave
        ``compact_after=None`` and run it in a maintenance window)."""
        t0 = time.time()
        # crash-window recovery first: a prior compact that died between
        # its manifest commit and dir cleanup leaves superseded _snap dirs
        # on disk. Readers never see them (manifest-listed roots only) but
        # they leak space — reclaim any dir numbered <= HEAD that the live
        # manifest doesn't reference. Dirs numbered > HEAD are an
        # in-flight writer's stage and are never touched.
        self._vacuum_orphans()
        old_files = self.current_files()
        if len(old_files) <= 1:
            return {"compacted": 0}
        df = self.read(spark)
        part_cols = list(self.partition_cols)
        if self.bucket_expr:
            part_cols.append("_bucket")
        snap = self._head() + 1
        rows = df.count()
        self._write_snapshot(
            df.withColumn("_snap", F.lit(snap)), snap, ["_snap"] + part_cols
        )
        lineage = {
            "snapshot": snap,
            "run_id": run_id or uuid.uuid4().hex,
            "rows_added": 0,
            "compacted_snapshots": len(old_files),
            "rows_total": rows,
            "key_cols": self.key_cols,
            "wall_s": round(time.time() - t0, 3),
            "partition_counts": None,
        }
        self._commit(snap, [self._snap_dir(snap)], lineage)
        for f in old_files:  # superseded, no longer referenced
            shutil.rmtree(f, ignore_errors=True)
        return lineage

    def _vacuum_orphans(self) -> None:
        """Delete committed-then-superseded ``_snap`` dirs (<= HEAD, not in
        the live manifest). Idempotent; safe alongside an in-flight
        merge_append, whose stage dir is numbered HEAD+1.

        Liveness is decided by SNAPSHOT NUMBER, never by path-string
        equality: the manifest stores the writer's spelling of each root,
        and comparing strings would mark every live dir orphaned when the
        table is reopened under an equivalent spelling (``./tbl`` vs
        ``tbl``) — deleting the whole table on a routine compact."""
        head = self._head()
        if head == 0:
            return
        live_snaps = set(self._live_snap_numbers(head))
        data_dir = self._data_dir()
        if not os.path.isdir(data_dir):
            return
        for entry in os.listdir(data_dir):
            if not entry.startswith("_snap="):
                continue
            try:
                n = int(entry.split("=", 1)[1])
            except ValueError:  # pragma: no cover - foreign dir, leave it
                continue
            if n <= head and n not in live_snaps:
                shutil.rmtree(
                    os.path.join(data_dir, entry), ignore_errors=True
                )

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


class AggregatingSnapshotTable(SnapshotTable):
    """MERGE-ON-READ counter table (round 5): the additive-aggregate side
    of the Iceberg merge-on-read / LSM-tree pattern.

    For ADDITIVE value columns (counts, sums, min/max) the key-based
    anti-join MERGE is the wrong tool — an increment does not need to know
    whether a key exists, it needs its contribution ADDED. So:

    - ``delta_append`` commits the increment's PARTIAL rows as-is (one
      cheap pre-aggregated append; no read of the committed table, no
      anti-join, no shuffle against existing data — per-commit cost is
      proportional to the increment alone, never to table size);
    - ``read_merged`` folds all deltas at read time (one groupBy over the
      single multi-snapshot FileScan; map-side partial aggregation does
      most of the work before the shuffle);
    - ``compact`` (inherited trigger, overridden body) collapses the
      deltas back to one row per key, bounding read amplification — the
      LSM compaction analogue, auto-run via ``compact_after``.

    Exactly-once is BATCH-granular, not row-granular: every commit's
    ``run_id`` is recorded in its manifest lineage, and ``delta_append``
    with an already-committed run_id is a no-op — a crashed-and-replayed
    increment can never double its counts. (Manifest files persist across
    compaction, so replay protection survives it.) This is precisely the
    foreachBatch/epoch-id contract Structured Streaming needs from an
    idempotent sink.

    Primary use: incremental KG construction (plans/pipeline.py
    ``build_kg_increment``) — co-occurrence counts over DISJOINT document
    batches are additive, so each crawl increment appends its partial
    pair counts and the published edge view thresholds/tiers the merged
    totals at read time.
    """

    def __init__(
        self,
        root: str,
        key_cols: list[str],
        agg_spec: dict[str, str],
        bucket_expr: str | None = None,
        compact_after: int | None = None,
    ):
        super().__init__(
            root,
            key_cols,
            partition_cols=None,
            bucket_expr=bucket_expr,
            compact_after=compact_after,
        )
        bad = set(agg_spec.values()) - {"sum", "min", "max"}
        if bad:
            raise ValueError(f"unsupported merge functions: {sorted(bad)}")
        self.agg_spec = dict(agg_spec)

    # -- replay protection ----------------------------------------------------
    def committed_run_ids(self) -> set[str]:
        return {row["run_id"] for row in self.lineage()}

    def _merge_exprs(self) -> list:
        return [
            F.expr(f"{fn}({col})").alias(col)
            for col, fn in self.agg_spec.items()
        ]

    def delta_append(
        self,
        df: DataFrame,
        run_id: str,
        extra_lineage: dict | None = None,
    ) -> dict:
        """Commit one increment's partial aggregates. Idempotent per
        run_id (replays are no-ops). The staged frame must carry exactly
        key_cols + agg columns."""
        if not run_id:
            raise ValueError(
                "delta_append requires an explicit run_id — it is the "
                "exactly-once replay key"
            )
        t0 = time.time()
        expected = set(self.key_cols) | set(self.agg_spec)
        got = set(df.columns)
        if got != expected:
            raise ValueError(
                f"staged columns {sorted(got)} != contract {sorted(expected)}"
            )
        if run_id in self.committed_run_ids():
            return {"run_id": run_id, "rows_added": 0, "replayed": True}
        # pre-aggregate the increment per key: the stored delta is as
        # small as this increment allows, and the write shuffles only the
        # increment's keyspace
        staged = df.groupBy(self.key_cols).agg(*self._merge_exprs())
        part_cols = []
        if self.bucket_expr:
            staged = staged.withColumn("_bucket", F.expr(self.bucket_expr))
            part_cols.append("_bucket")
        staged = staged.persist()
        try:
            added = staged.count()
            snap = self._head() + 1
            if added:
                self._write_snapshot(
                    staged.withColumn("_snap", F.lit(snap)),
                    snap,
                    ["_snap"] + part_cols,
                )
        finally:
            staged.unpersist()
        lineage = {
            **(extra_lineage or {}),
            "snapshot": snap,
            "run_id": run_id,
            "rows_added": added,
            "key_cols": self.key_cols,
            "agg_spec": self.agg_spec,
            "wall_s": round(time.time() - t0, 3),
        }
        files = self.current_files() + ([self._snap_dir(snap)] if added else [])
        self._commit(snap, files, lineage)
        if self.compact_after and len(files) > self.compact_after:
            self.compact(df.sparkSession, run_id=f"{run_id}-compact")
        return lineage

    def read_merged(
        self, spark: SparkSession, as_of: int | None = None
    ) -> DataFrame | None:
        """One row per key with fully merged aggregates (threshold/tier
        on top of THIS, never on the raw deltas). ``as_of`` time-travels
        the merge to a historical snapshot number — the counter-table
        form of the base class's snapshot read: the merged view as of
        commit N folds exactly the deltas commits 1..N appended."""
        df = self.read(spark, as_of=as_of)
        if df is None:
            return None
        return df.groupBy(self.key_cols).agg(*self._merge_exprs())

    def compact(self, spark: SparkSession, run_id: str | None = None) -> dict:
        """LSM compaction: rewrite all deltas as one merged snapshot.
        Read-time semantics are unchanged (merge functions are
        associative); read amplification drops to one file set."""
        t0 = time.time()
        self._vacuum_orphans()
        old_files = self.current_files()
        if len(old_files) <= 1:
            return {"compacted": 0}
        merged = self.read_merged(spark)
        part_cols = []
        if self.bucket_expr:
            merged = merged.withColumn("_bucket", F.expr(self.bucket_expr))
            part_cols.append("_bucket")
        snap = self._head() + 1
        rows = merged.persist().count()
        try:
            self._write_snapshot(
                merged.withColumn("_snap", F.lit(snap)),
                snap,
                ["_snap"] + part_cols,
            )
        finally:
            merged.unpersist()
        lineage = {
            "snapshot": snap,
            "run_id": run_id or uuid.uuid4().hex,
            "rows_added": 0,
            "compacted_snapshots": len(old_files),
            "rows_total": rows,
            "key_cols": self.key_cols,
            "agg_spec": self.agg_spec,
            "wall_s": round(time.time() - t0, 3),
        }
        self._commit(snap, [self._snap_dir(snap)], lineage)
        for f in old_files:
            shutil.rmtree(f, ignore_errors=True)
        return lineage
