"""Sources & sinks: file-catalog scanning with incremental modes, and
multimodal (image/audio/video) binary-column plumbing."""

from tagminder_spark.sources.catalog import (
    incremental_modified,
    incremental_new,
    prune_orphans,
    scan_files,
)

__all__ = [
    "incremental_modified",
    "incremental_new",
    "prune_orphans",
    "scan_files",
]
