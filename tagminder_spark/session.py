"""SparkSession factory + testdata table catalog.

Config is chosen for deterministic, oracle-comparable output and for scale:
- UTC session timezone (parquet timestamps compare cleanly vs DuckDB).
- AQE on (runtime coalescing, skew-join splitting) — the local[N] plan and
  the 1000-executor plan share the same declarative source.
- shuffle.partitions sized from the env (SPARK_GRAFT_CPUS) instead of the
  200 default; on a real cluster this would be set per-job or left to AQE.
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app: str = "tagminder_spark", master: str | None = None) -> SparkSession:
    n = cpus()
    builder = (
        SparkSession.builder.appName(app)
        .master(master or f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet uses TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_TS_NANO_COLS: dict[str, list[str]] = {}


def _nano_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) (read by Spark as long)."""
    if path not in _TS_NANO_COLS:
        import pyarrow.parquet as pq

        import pyarrow as pa

        schema = pq.read_schema(path)
        _TS_NANO_COLS[path] = [
            f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _TS_NANO_COLS[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for c in _nano_ts_columns(path):
        # exact integer ns→µs division, matching DuckDB's µs truncation
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register each as a temp view."""
    out = {}
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
