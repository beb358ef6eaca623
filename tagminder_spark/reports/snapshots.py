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


def snapshot_if_changed(
    alib: DataFrame,
    changelog: DataFrame,
    columns: list[str],
    run_id: str,
    runs_dir: str,
    phase: str = "before",
) -> DataFrame | None:
    """Fingerprint-gated snapshot — the reference's recompute skip
    (tm_snapshots.py:43-53, scripts/snapshots/91-...py:735, 795-806).

    Reads the last recorded run's changelog fingerprint from ``runs_dir``
    (the ``_SNAP_runs`` analogue); if the current fingerprint matches,
    the expensive two-level coverage aggregation is SKIPPED and ``None``
    is returned. Otherwise the snapshot is computed and a run row
    (run_id, fingerprint) is appended. The gate itself costs one
    max/count aggregate over the append-only changelog — at 100 TB the
    parquet footer stats answer it without scanning data pages."""
    from pathlib import Path

    spark = alib.sparkSession
    fp_ts, fp_n = changelog_fingerprint(changelog)
    runs = Path(runs_dir)
    if runs.exists() and any(runs.glob("*.parquet")):
        last = (
            spark.read.parquet(runs_dir)
            .orderBy(F.col("recorded_at").desc())
            .select("changelog_max_timestamp", "changelog_row_count")
            .limit(1)
            .collect()
        )
        if last and (last[0][0], last[0][1]) == (fp_ts, fp_n):
            return None  # nothing changed since the last snapshot run
    snap = coverage_snapshot(alib, columns, run_id, phase)
    run_row = spark.createDataFrame(
        [(run_id, fp_ts, fp_n)],
        "run_id string, changelog_max_timestamp string, changelog_row_count bigint",
    ).withColumn("recorded_at", F.current_timestamp())
    run_row.write.mode("append").parquet(runs_dir)
    return snap


def snapshot_compare(
    before: DataFrame, after: DataFrame, columns: list[str]
) -> DataFrame:
    """Per-column coverage deltas between two run snapshots — the
    91-compare dashboard's data layer (scripts/snapshots/
    91-snapshot-library-health-after.py:820-1006: fetch BEFORE/AFTER
    rows per column, overlay, delta).

    Input: two single-row frames from ``coverage_snapshot``. Output:
    one row per column with track-level coverage ratio before/after/
    delta and the album-level metric before/after/delta. Long format is
    the join-friendly shape for the HTML layer and the driver oracle;
    the melt is a union of constant-width selects over one-row frames —
    no shuffle of consequence at any scale."""

    def melt(snap: DataFrame, suffix: str) -> DataFrame:
        # stack(): ONE reference to the snapshot frame — a union of
        # per-column selects would re-evaluate the underlying two-level
        # aggregation once per column (audited: 12 scans of the input
        # for a 3-column compare; stack makes it 4)
        args = ", ".join(
            f"'{c}', nonblank_{c} / total_rows, album_ratio_{c}"
            for c in columns
        )
        return snap.selectExpr(
            f"stack({len(columns)}, {args})"
            f" AS (column, track_{suffix}, album_{suffix})"
        )

    b = melt(before, "before")
    a = melt(after, "after")
    return b.join(a, "column").select(
        "column",
        "track_before",
        "track_after",
        (F.col("track_after") - F.col("track_before")).alias("track_delta"),
        "album_before",
        "album_after",
        (F.col("album_after") - F.col("album_before")).alias("album_delta"),
    )
