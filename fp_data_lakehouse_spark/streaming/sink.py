"""Streaming warehouse ingest: foreachBatch + idempotent MERGE.

The composition that turns an at-least-once stream into an
exactly-once-per-key table: the checkpoint makes batch REPLAY the
failure mode (a batch can re-run, never be skipped), and the
key-merged write makes replay a no-op — the same idempotence
contract the batch incremental loader (etl/incremental.py) gives
re-delivered files. On Delta/Iceberg the merge becomes transactional
file-level MERGE; the foreachBatch shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.sinks import merge_upsert


def stream_merge_to_table(
    events: DataFrame,
    target_path: str,
    checkpoint_dir: str,
    keys: list[str] = ("event_id",),
    available_now: bool = False,
):
    """Start a stream writing each micro-batch into a parquet table via
    key-merge. Returns the StreamingQuery (caller stops it).

    Within-batch duplicates are collapsed first (merge requires unique
    keys); across batches and across REPLAYS of the same batch, the
    merge's anti-join makes the write idempotent."""
    keys = list(keys)

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates(keys)
        merge_upsert(batch_df.sparkSession, target_path, batch, keys)

    writer = events.writeStream.foreachBatch(_upsert).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
