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
        # Long sessions run hundreds of distinct whole-stage-codegen
        # classes; the JVM default 240m code cache evicts hot compiled
        # methods and later queries fall back to re-JIT/interpreter
        # (measured: the same query 2-4x slower late in a 23-query
        # bench than in a fresh session).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet uses TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Stop ChecksumFileSystem writing a .crc sidecar (a second file
    # creation) per part file on local writes: parquet carries its own
    # page/footer checksums, so the sidecars only duplicate that work,
    # and the maintenance gates are file-creation-bound (measured: the
    # 530-file compaction lifecycle ~25% faster). Only WRITE checksums
    # are disabled — swapping in RawLocalFileSystem wholesale was A/B'd
    # and slowed multi-scan read paths 10-25%. The flag lives on the
    # JVM-cached file:// FileSystem instance, which local-mode executors
    # share; on hdfs/s3a deployments checksums are server-side and this
    # is a no-op.
    try:
        spark._jvm.org.apache.hadoop.fs.FileSystem.getLocal(
            spark._jsc.hadoopConfiguration()
        ).setWriteChecksum(False)
    except Exception:
        pass  # non-local deployments / restricted JVMs: keep defaults
    return spark


def spread(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition sized to the session's core count — put
    this immediately BEFORE a per-row Python kernel (mapInPandas /
    mapInArrow synth+decode stages).

    Why (guide §4 / §2): the corpus tables are small single-row-group
    parquet files, so the scan is ONE split — and an opaque Python
    kernel chained on it runs every per-document decode serially in one
    task on one core (measured: mm_real_mp3_frames 12.1 s single-task
    vs ~1 s spread at 32 cores; the kernel cost is per-document CPU,
    not bytes). The repartition shuffles only the tiny id frame, and
    the partition count follows ``defaultParallelism`` (local[N] → N;
    on a cluster, total executor cores), not a constant — the same
    declarative source stays right at every core count the driver
    benches. Row-set semantics are unchanged (round-robin placement
    only; Spark's sort-before-repartition keeps placement deterministic
    under retries).
    """
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def fuse_pandas(*kernels):
    """Compose mapInPandas kernels (``Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame]``) into ONE kernel — put the composition in a
    single ``mapInPandas`` instead of chaining one per stage.

    Why (guide §4): each chained ``mapInPandas`` node is its own
    PythonRunner — per task it spawns another Python worker (a 3-stage
    chain at 32 tasks runs ~96 workers on 32 cores, measured ~50% CPU
    starvation each) and every intermediate row crosses
    Python→JVM→Python through Arrow.  For the codec gates the
    intermediate IS the heavy column (whole synthesized container
    bytes), so the chain ships the biggest bytes twice for nothing.
    Fused: one worker per task, zero intermediate crossings; batch
    boundaries between kernels follow the upstream batch instead of
    re-batching, which is semantics-neutral for the per-row kernels
    composed here."""

    def fused(batches):
        for k in kernels:
            batches = k(batches)
        return batches

    return fused


_TS_COLS: dict[tuple[str, float, int], tuple[list[str], list[str]]] = {}


def _ts_columns(path: str) -> tuple[list[str], list[str]]:
    """Classify parquet timestamp columns: (nanos_cols, naive_cols).

    - ``nanos_cols``: TIMESTAMP(NANOS) — Spark's reader rejects these unless
      the legacy ``nanosAsLong`` conf is set, so they are read as long and
      converted.
    - ``naive_cols``: µs/ms timestamps with no zone (isAdjustedToUTC=false) —
      Spark 4 infers TIMESTAMP_NTZ for these.  Downstream code (epoch casts,
      lag arithmetic) and the round-2 oracle hashes all assume session-zoned
      TIMESTAMP, so these get a cast after read.
    """
    # Cache keyed on (path, mtime, size): if testdata is regenerated in-place
    # during one process lifetime, the stale classification is not reused.
    st = os.stat(path)
    key = (path, st.st_mtime, st.st_size)
    if key not in _TS_COLS:
        import pyarrow.parquet as pq

        import pyarrow as pa

        schema = pq.read_schema(path)
        nanos, naive = [], []
        for f in schema:
            if not pa.types.is_timestamp(f.type):
                continue
            if f.type.unit == "ns":
                nanos.append(f.name)
            elif f.type.tz is None:
                naive.append(f.name)
        _TS_COLS[key] = (nanos, naive)
    return _TS_COLS[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table on ANY SparkSession — including one the engine
    did not build (the driver constructs its own session and calls
    ``queries()[name](spark, sf_dir)``).

    Timestamp columns are normalized to session-zoned TIMESTAMP regardless of
    how the testdata generation stored them (TIMESTAMP(NANOS) in earlier
    rounds, naive µs since): with the session zone pinned to UTC the wall
    values are unchanged, and every downstream plan and oracle sees one
    stable type across testdata generations.
    """
    path = f"{sf_dir}/{name}.parquet"
    nano_cols, naive_cols = _ts_columns(path)
    if nano_cols or naive_cols:
        # The nano div-1000 epoch math and the NTZ->LTZ cast are only
        # instant-preserving under a UTC session zone; sessions the engine
        # did not build may carry another zone, so pin it defensively.
        try:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
        except Exception:
            pass
    if nano_cols:
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        except Exception:
            df = spark.read.schema(_long_ns_schema(path)).parquet(path)
    else:
        df = spark.read.parquet(path)
    for c in nano_cols:
        # exact integer ns→µs division, matching DuckDB's µs truncation
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for c in naive_cols:
        # NTZ→LTZ: interpreted in the (UTC) session zone, so the instant and
        # its rendering are identical; only the type changes.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def _long_ns_schema(path: str):
    """Parquet schema with TIMESTAMP(NANOS) columns typed as LongType —
    the fallback read path when the legacy nanosAsLong conf is unavailable."""
    import pyarrow.parquet as pq

    import pyarrow as pa
    from pyspark.sql import types as T

    arrow_schema = pq.read_schema(path)
    fields = []
    for f in arrow_schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(T.StructField(f.name, T.LongType(), f.nullable))
        else:
            fields.append(
                T.StructField(
                    f.name, T._parse_datatype_string(_arrow_to_ddl(f.type)), f.nullable
                )
            )
    return T.StructType(fields)


def _arrow_to_ddl(t) -> str:
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date32(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_to_ddl(t.value_type)}>"
    raise ValueError(f"unmapped arrow type: {t}")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table and register each as a temp view."""
    out = {}
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
