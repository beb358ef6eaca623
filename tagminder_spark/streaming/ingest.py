"""Structured Streaming variants of the event/ingest path.

The reference is batch-only (SURVEY.md §2.11): its incrementality is
re-scan + filter. On Spark the same logical plans run as streams — the
tumbling-window rollup here shares its aggregation logic with the batch
query ``t_tumbling_window`` (tagminder_spark/queries/textops.py), which is
the point: one declarative plan, two execution modes.

Local testing drives a parquet directory through ``readStream`` with a
memory sink + ``processAllAvailable()`` (synchronous, deterministic).
At scale the source becomes Kafka/cloud-files and the sink a Delta table;
watermarks bound state so late data is handled without unbounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(path_dir: str) -> tuple[T.StructType, str]:
    """Stream-read schema for the events table plus the ts read mode.

    readStream needs an explicit schema, and the testdata generation has
    stored ``ts`` as TIMESTAMP(NANOS) (→ read as long, divide) or as a naive
    µs timestamp (→ read as NTZ, cast) in different rounds — mirror
    session.load_table's normalization so both stream and batch plans see
    session-zoned TIMESTAMP.
    """
    import pyarrow.parquet as pq

    import pyarrow as pa

    f = pq.read_schema(f"{path_dir}/events.parquet").field("ts")
    if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
        ts_field, mode = T.StructField("ts", T.LongType()), "nanos"
    elif pa.types.is_timestamp(f.type) and f.type.tz is None:
        ts_field, mode = T.StructField("ts", T.TimestampNTZType()), "ntz"
    else:
        ts_field, mode = T.StructField("ts", T.TimestampType()), "ltz"
    return (
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                ts_field,
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        ),
        mode,
    )


def _events_stream(spark: SparkSession, path_dir: str) -> DataFrame:
    schema, mode = _events_schema(path_dir)
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .load(path_dir)
    )
    if mode == "nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if mode == "ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_event_counts(
    spark: SparkSession, path_dir: str, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with a watermark bounding state retention."""
    ev = _events_stream(spark, path_dir)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_stream(
    spark: SparkSession, path_dir: str, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (the streaming twin of t_sessionize's
    lag+cumsum batch plan) via the native session_window operator."""
    ev = _events_stream(spark, path_dir)
    return (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_stream_to_memory(
    df: DataFrame, name: str, mode: str = "append"
) -> "DataFrame":
    """Drive a streaming frame to completion against a memory sink and
    return the materialized result (test/dev helper)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {name}")
