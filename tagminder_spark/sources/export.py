"""Export sink (SURVEY §2.1 S11/S12): write changed tags back to files.

Reference: scripts/ingest/tags2db.py:1570-1741 groups rows per directory
(`partition_by("__dirpath")`) and writes one file at a time per directory
— a deliberate safety choice (README.md:417). The Spark shape is the
same: select the export projection (S12's column allowlist +
only-ever-touched semi-join, 98-create-export-db.py:148-372), repartition
by directory so one task owns a directory, sort by `__path` for I/O
locality (tags2db.py:860), then `foreachPartition` the per-file writer.

The default writer is REAL: it rewrites each file's tag section
byte-level via ``audiotags.synth.retag_file`` (ID3v2 for MPEG/AIFF,
VORBIS_COMMENT for FLAC/Ogg, ilst for MP4, APEv2, ASF — pure Python, no
libraries), streaming the audio region so memory stays O(tag sections),
and atomically replaces the file.  A custom ``writer_fn`` can still be
injected (recorders in tests, other-format writers in production).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from tagminder_spark.functions.core import MV_DELIM


def export_projection(
    alib: DataFrame,
    keep_columns: list[str],
    changelog: DataFrame | None = None,
    changed_rows_only: bool = True,
) -> DataFrame:
    """S12 (98-create-export-db.py:148-372): system columns + the tag
    allowlist; optionally only rows that were ever touched (semi-join on
    the changelog's distinct paths, :306-322). `__sqlmodded > 0` rows are
    the 'needs export now' subset — that filter stays with the caller."""
    cols = [c for c in alib.columns if c.startswith("__")] + [
        c for c in keep_columns if c in alib.columns and not c.startswith("__")
    ]
    out = alib.select(*cols)
    if changed_rows_only and changelog is not None:
        touched = changelog.select(
            F.col("alib_path").alias("__path")
        ).dropDuplicates()
        out = out.join(touched, "__path", "left_semi")
    return out


def file_writer(rows: Iterator[Row]) -> None:
    """Real tag write-back: for each row, replace the tag section of the
    file at ``__path`` with the row's non-system columns and swap
    atomically — the crash-safe analogue of the reference's
    one-file-at-a-time directory walk (tags2db.py:1580-1592).

    Bounded memory: ``retag_file`` plans against a lazy head/tail view
    and STREAM-copies the audio region in blocks, so peak resident
    memory is O(tag sections) — a 2 GB concert FLAC is retagged without
    ever holding two copies (or even one copy) of it.  Empty/NULL cells
    mean "delete the tag" (they are simply omitted from the rewritten
    tag section)."""
    from tagminder_spark.sources.audiotags.synth import retag_file

    for row in rows:
        d = row.asDict()
        path = d["__path"]
        tags = {
            k: str(v)
            for k, v in d.items()
            if not k.startswith("__") and v is not None and str(v).strip()
        }
        if not retag_file(path, tags, MV_DELIM):
            raise NotImplementedError(
                f"unsupported container for in-place retag: {path}; "
                "inject writer_fn for this format"
            )


_default_writer = file_writer


def export_tags(
    df: DataFrame,
    writer_fn: Callable[[Iterator[Row]], None] | None = None,
    dir_parallelism: int | None = None,
) -> None:
    """S11: one task per directory group, files in `__path` order within
    the task, per-file writes performed by ``writer_fn`` (signature:
    iterator of Rows; multi-value cells still carry the ``\\\\``
    delimiter — the writer splits them to lists, empty ⇒ delete tag,
    tags2db.py:1580-1592)."""
    part_cols = [F.col("__dirpath")]
    shaped = df.repartition(
        *(part_cols if dir_parallelism is None else [dir_parallelism, *part_cols])
    ).sortWithinPartitions("__dirpath", "__path")
    shaped.foreachPartition(writer_fn or _default_writer)


def decode_mv_for_write(value: str | None) -> list[str] | None:
    """Writer-side cell decode: None/blank ⇒ delete tag (None), single
    value ⇒ [value], delimited ⇒ list (tags2db.py:1580-1592)."""
    if value is None or value.strip() == "":
        return None
    return [t for t in (s.strip() for s in value.split(MV_DELIM)) if t]


def reset_sqlmodded(alib: DataFrame) -> DataFrame:
    """Post-export loop closer (99-reset-sqlmodded.py:46-50): clear the
    'needs export' marker — ``__sqlmodded = NULL`` wherever it is set —
    so the next pipeline run starts from a clean dirty-flag state. Pure
    column rewrite; no changelog entries (the reference updates the flag
    outside the changelog protocol, ensure_changelog=False at :43)."""
    if "__sqlmodded" not in alib.columns:
        return alib
    return alib.withColumn("__sqlmodded", F.lit(None).cast("int"))
