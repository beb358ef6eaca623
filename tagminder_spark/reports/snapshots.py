"""Before/after quality snapshots (SURVEY §2.4 A10; _SNAP_* tables).

Reference: src/tagminder/core/tm_snapshots.py:157-218 computes per-column
coverage (non-blank counts) over alib plus album-level metrics as the
average over per-album ratios (a two-level aggregate), keyed by run_id;
:43-53 skips recompute when the changelog fingerprint (max timestamp +
row count) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tagminder_spark.functions.core import album_root, is_blank


def coverage_snapshot(
    alib: DataFrame,
    columns: list[str],
    run_id: str,
    phase: str = "before",
) -> DataFrame:
    """One snapshot row: total rows, per-column non-blank coverage, and
    the album-level metric (mean over per-album coverage ratios — the
    reference's nested aggregate, tm_snapshots.py:157-218)."""
    cols = [c for c in columns if c in alib.columns]
    covered = [(~is_blank(F.col(c))).cast("long") for c in cols]
    per_album = (
        alib.withColumn("__aroot", album_root(F.col("__dirpath")))
        .groupBy("__aroot")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(e).alias(f"cov_{c}")
                for c, e in zip(cols, covered)
            ],
        )
    )
    album_metrics = per_album.select(
        *[
            F.avg(F.col(f"cov_{c}") / F.col("n")).alias(f"album_ratio_{c}")
            for c in cols
        ]
    )
    global_metrics = alib.agg(
        F.count(F.lit(1)).alias("total_rows"),
        *[F.sum(e).alias(f"nonblank_{c}") for c, e in zip(cols, covered)],
    )
    return (
        global_metrics.crossJoin(album_metrics)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("phase", F.lit(phase))
    )


def changelog_fingerprint(changelog: DataFrame) -> tuple[str | None, int]:
    """(max timestamp, row count) — the recompute-skip key
    (tm_snapshots.py:43-53). Cheap: one aggregate over the append-only
    table (timestamp column is max/min-pushdown-friendly in parquet)."""
    row = changelog.agg(
        F.max("timestamp").alias("ts"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return (str(row["ts"]) if row["ts"] is not None else None, row["n"])
