"""Streaming CDC apply: maintain an upserted snapshot table from a
live change stream via ``foreachBatch`` + the batch MERGE operator.

This is the standard Structured Streaming pattern for "MERGE INTO a
table from a stream" (the sink-side dual of ``cdc.streaming_latest_by_key``,
which folds the stream into in-memory state): each micro-batch of
change rows is applied to the persisted snapshot with
``operators/merge.py::merge_changes`` and the result swapped in.

Scale notes
-----------
* Within a micro-batch, multi-version keys are compacted first
  (``order_cols``) — the same latest-change-wins semantics Delta/
  Iceberg MERGE users implement in their foreachBatch functions.
* A micro-batch is small relative to the snapshot by construction,
  so the merge runs with ``broadcast_changes=True``: the snapshot
  scan never shuffles; per batch the cost is one broadcast + one
  map-side anti-join + a rewrite of the output files.
* The parquet swap here is overwrite-directory (read snapshot,
  merge, write tmp, atomic-rename expectations are the table
  format's job); on a real deployment the same ``apply`` callback
  body targets Delta/Iceberg ``MERGE`` semantics with file-level
  pruning instead of full rewrite. The operator keeps the Spark
  plumbing (trigger/checkpoint/exactly-once batch ids) real and the
  table-format swap pluggable.
* foreachBatch gives at-least-once executions of the callback with
  the SAME batch_id on retry; the swap writes to
  ``<target>/_v=<batch_id>`` so replays are idempotent (last write
  of one batch id wins, no partial mixed state).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from sparklyclean_spark.operators.merge import merge_changes


class ParquetUpsertSink:
    """foreachBatch callback maintaining a parquet snapshot.

    Parameters mirror ``merge_changes``; ``target_dir`` holds the
    ``keep_versions`` most recent versioned snapshot directories
    (older versions are garbage-collected after each publish),
    ``current_path`` naming the latest complete version so readers
    never see a half-written snapshot.

    Reader-latency assumption: the retained-version window is a
    GRACE HEURISTIC, not a guarantee — a reader that resolved the
    ``_CURRENT`` marker ``keep_versions`` publishes ago and is still
    scanning has its files removed mid-read (FileNotFoundException).
    Size ``keep_versions`` to exceed the slowest expected reader scan
    time divided by the micro-batch interval (default 2 = current +
    previous). A real deployment delegates this to a table format's
    snapshot-retention policy (Delta VACUUM / Iceberg expire_snapshots).
    """

    def __init__(
        self,
        spark,
        target_dir: str,
        keys: list[str],
        op_col: str = "op",
        delete_op: str = "D",
        order_cols: list[str] | None = None,
        keep_versions: int = 2,
    ) -> None:
        self.spark = spark
        self.target_dir = target_dir
        self.keys = keys
        self.op_col = op_col
        self.delete_op = delete_op
        self.order_cols = order_cols
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        self.keep_versions = keep_versions

    def _current_marker(self) -> str:
        return os.path.join(self.target_dir, "_CURRENT")

    def current_path(self) -> str | None:
        marker = self._current_marker()
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return fh.read().strip()

    def snapshot(self) -> DataFrame | None:
        path = self.current_path()
        return self.spark.read.parquet(path) if path else None

    def apply(self, changes: DataFrame, batch_id: int) -> None:
        """The foreachBatch callback: merge this micro-batch into the
        current snapshot and publish the new version."""
        from pyspark.sql import functions as F

        target = self.snapshot()
        if target is None:
            # first batch bootstraps the snapshot from the upserts
            # (compact first when ordered; NULL op = upsert, matching
            # merge_changes' null-safe delete predicate)
            if self.order_cols:
                from sparklyclean_spark.operators.cdc import latest_by_key

                payload = [
                    c
                    for c in changes.columns
                    if c not in self.keys and c not in self.order_cols
                ]
                # CONTRACT: a self-bootstrapped snapshot treats
                # order_cols as change-log transport metadata and
                # excludes them (test-pinned); because later merges
                # drop order columns absent from the target schema,
                # every subsequent snapshot stays consistent. To KEEP
                # an order column (e.g. an updated_at ts) in the
                # snapshot, pre-seed target_dir with a snapshot that
                # carries it — merge_changes' target-schema rule then
                # preserves it on every path (r9 review note: the two
                # deployment histories differ by this choice, by
                # design, not by accident).
                changes = latest_by_key(
                    changes, self.keys, self.order_cols, payload
                ).drop(*self.order_cols)
            merged = changes.where(
                ~changes[self.op_col].eqNullSafe(F.lit(self.delete_op))
            ).drop(self.op_col)
        else:
            merged = merge_changes(
                target,
                changes,
                self.keys,
                op_col=self.op_col,
                delete_op=self.delete_op,
                order_cols=self.order_cols,
                broadcast_changes=True,
            )
        # attempt-suffixed version dir: a replayed batch id must not
        # overwrite the directory the merge is READING (Spark rejects
        # read-overwrite of one path); re-applying the same changes on
        # top of an already-applied snapshot is semantically idempotent
        # (upserts converge, deletes converge), so any attempt's output
        # is a valid snapshot and publishing the newest wins
        attempt = 0
        out = os.path.join(self.target_dir, f"_v={batch_id}-{attempt}")
        while os.path.exists(out):
            attempt += 1
            out = os.path.join(self.target_dir, f"_v={batch_id}-{attempt}")
        merged.write.mode("overwrite").parquet(out)
        prev = self.current_path()
        tmp = self._current_marker() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(out)
        os.replace(tmp, self._current_marker())
        # GC superseded versions — disk would otherwise grow as
        # O(batches x snapshot size). Keep the newest `keep_versions`
        # publishes (in-flight readers that resolved an older marker
        # may still be scanning; see class docstring for the
        # reader-latency assumption behind this window). Retention is
        # decided from the DIRECTORY LISTING by mtime, not in-memory
        # history: a restarted process has no history, and rebuilding
        # it from just the marker would shrink the window to 2 and
        # delete snapshots still inside the configured grace.
        import shutil

        versions = sorted(
            (
                p
                for name in os.listdir(self.target_dir)
                if name.startswith("_v=")
                and os.path.isdir(p := os.path.join(self.target_dir, name))
            ),
            key=os.path.getmtime,
            reverse=True,
        )
        keep = set(versions[: self.keep_versions]) | ({out, prev} - {None})
        for p in versions:
            if p not in keep:
                shutil.rmtree(p, ignore_errors=True)


def streaming_upsert(
    spark,
    source_path: str,
    schema: str,
    sink: ParquetUpsertSink,
    checkpoint_dir: str,
):
    """Wire a parquet change-file stream into the sink. Returns the
    StreamingQuery (caller awaits/stops)."""
    src = spark.readStream.schema(schema).parquet(source_path)
    return (
        src.writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
