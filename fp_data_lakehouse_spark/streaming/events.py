"""Structured Streaming over the events stream.

The reference is batch-only (SURVEY.md §2.6: no streams), so this is
the extension surface: file-source readStream → watermarked windowed
aggregations → any sink. The aggregation bodies intentionally mirror
the batch twins in ``operators/eventops.py`` — same grouping keys, same
measures — so the streaming results converge to the batch answers once
all data is ingested (verified in tests/test_streaming.py via a memory
sink against ev01).

Scale/semantics notes:
- Watermark bounds state: with a 2-hour watermark and 1-hour windows
  the state store retains ~3 window generations per key group;
  late-beyond-watermark events are dropped (the documented policy).
- File source + checkpointLocation gives exactly-once to transactional
  sinks; the memory sink in tests is at-least-once and test-only.
- applyInPandasWithState is the escape hatch for custom state machines
  (the sessionization twin of ev02); the lag-based batch formulation
  covers the fixtures, so the stateful variant ships as the documented
  pattern in ``multimodal``/future rounds rather than a stub here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune

def _event_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files,
    normalized to a proper TimestampType column.

    The fixture's ``ts`` physical type has varied across driver
    generations (TIMESTAMP(NANOS) → long via nanosAsLong; timestamp[us]
    → TIMESTAMP_NTZ), and readStream needs the schema declared up
    front — so sniff the actual type from a batch read of the same
    directory (metadata-only, no scan) and dispatch exactly like
    ``sources.catalog.load_table`` does for batch."""
    tune(spark)
    ts_type = dict(spark.read.parquet(source_dir).dtypes).get("ts")
    if ts_type == "bigint":
        raw = spark.readStream.schema(_event_schema(T.LongType())).parquet(source_dir)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        raw = spark.readStream.schema(_event_schema(T.TimestampNTZType())).parquet(source_dir)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.readStream.schema(_event_schema(T.TimestampType())).parquet(source_dir)


def hourly_tumbling_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of ev01_hourly_tumbling_counts: 1-hour tumbling
    windows with a late-data watermark; emits the same schema."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("_s"),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_epoch"),
            "event_type",
            "n_events",
            (
                F.expr("(2 * _s * 100 + (n_events * 100)) div (2 * (n_events * 100))") / 100.0
            ).alias("avg_value"),
        )
    )


def sliding_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Sliding-window variant (1-hour windows every 15 minutes): each
    event contributes to 4 overlapping windows — the standard smoothed
    rate signal."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_epoch"),
            "event_type",
            "n_events",
        )
    )


def dedup_events_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once-per-key ingest: drop re-deliveries of the
    same event_id arriving within the watermark horizon — the streaming
    twin of the batch exact-dedup operators (dd01/dd02).

    ``dropDuplicatesWithinWatermark`` keys the state store on event_id
    and evicts entries once the watermark passes them, so state is
    bounded by the key arrival rate x watermark window, not by stream
    length — the property that makes at-least-once sources (Kafka
    replays, file redeliveries) safe to ingest forever."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def attribution_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window_sec: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks within the preceding ``window_sec`` — the streaming
    face of the batch range/as-of joins (ev05/ev08).

    Both sides carry watermarks and the join condition bounds
    click_ts ∈ [purchase_ts - window, purchase_ts], which is what lets
    Spark evict join state: a buffered click can be dropped once the
    purchase-side watermark passes its upper usefulness bound. Without
    the time bound the state store grows with the whole stream."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    # fullOuter emits click-side null-extensions whose purchase-side
    # user_id is null — coalesce to the click's own user there. The
    # inner/leftOuter select is unchanged (every emitted row carries
    # the purchase-side user_id), so st04/st11 plans are untouched.
    user = (
        F.coalesce("user_id", "c_user_id")
        if how in ("fullOuter", "full_outer", "outer", "full")
        else F.col("user_id")
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_sec} SECONDS")),
        how,
    ).select(
        "purchase_id",
        user.alias("user_id"),
        F.unix_timestamp("p_ts").alias("purchase_ep"),
        "click_id",
        F.unix_timestamp("c_ts").alias("click_ep"),
    )


def run_stream_to_memory(
    spark: SparkSession, source_dir: str, query_name: str, variant: str = "tumbling"
):
    """Test/demo driver: run a windowed aggregation over the file source
    into a memory sink (complete mode) and block until all available
    input is processed. Returns the StreamingQuery (caller stops it)."""
    events = read_events_stream(spark, source_dir)
    agg = (
        hourly_tumbling_counts_stream(events)
        if variant == "tumbling"
        else sliding_counts_stream(events)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    return q


def enriched_stream(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each streaming event decorated
    with its user's dimension attributes (segment, region) — the
    streaming face of the batch star join, and the remaining canonical
    Structured Streaming join shape next to stream-stream
    (attribution_stream).

    The static side needs NO watermark and holds NO join state: Spark
    re-plans the join per micro-batch, so the dimension is broadcast
    fresh each batch (picking up slowly-changing-dim updates between
    batches for free). Stateless inner/left joins are allowed on a
    static right side; output stays append-mode compatible."""
    dim = F.broadcast(user_dim)
    return events.join(dim, "user_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        "segment",
        "region",
    )
