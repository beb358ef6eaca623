"""TOML configuration contract (reference: tagminder.toml).

The reference drives its schema and per-step behavior from one TOML file:
canonical column order (`[columns].schema_columns`, tagminder.toml:86-260),
the retention allowlist (`[cleanup].keep_columns`, :262-389), the columns
step 17 dedupes (`[cleanup].dedupe_columns`), the multi-value delimiter
(`[strings].multivalue_delimiter`, :456-460), and the critical columns the
exception reports check (:503-568). This loader reproduces that contract
with the same shapes; loading is driver-side only (config is broadcast
implicitly through closures / map literals).

The validation rules mirror the reference's loader
(scripts/ingest/tags2db.py:158-203): `__path` must appear exactly once and
`__sqlmodded` must be present in schema_columns.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path

#: Two literal backslashes — the on-disk multi-value delimiter.
DEFAULT_DELIMITER = "\\\\"

#: Minimal default contract (subset of tagminder.toml's 170+ columns);
#: real deployments load the full file.
DEFAULT_SCHEMA_COLUMNS = [
    "__path", "__dirpath", "__md5sig", "__file_mod_datetime_raw",
    "__length_seconds", "__bitrate_num", "__bitspersample",
    "__frequency_num", "__channels", "__filetype", "__sqlmodded",
    "title", "subtitle", "artist", "albumartist", "composer", "arranger",
    "lyricist", "writer", "album", "year", "originalyear", "genre",
    "style", "label", "compilation", "discnumber", "track", "live",
    "releasetype", "track_uuid", "musicbrainz_artistid",
    "musicbrainz_albumartistid", "musicbrainz_workid", "work", "producer",
    "engineer", "mixer", "remixer", "involvedpeople", "subtitle",
    "album_dr", "review", "lyrics", "unsyncedlyrics", "explicit",
    "isgreatesthits", "issoundtrack", "rating",
]

DEFAULT_CRITICAL_COLUMNS = ["title", "artist", "album", "year"]
DEFAULT_DEDUPE_COLUMNS = ["artist", "composer", "genre", "style"]


@dataclass(frozen=True)
class EngineConfig:
    schema_columns: list[str] = field(default_factory=list)
    keep_columns: list[str] = field(default_factory=list)
    dedupe_columns: list[str] = field(default_factory=list)
    critical_columns: list[str] = field(default_factory=list)
    delimiter: str = DEFAULT_DELIMITER
    #: Gate for promoting first-seen overflow tags to real columns
    #: (the reference always ALTERs, tags2db.py:655-671; here it is
    #: opt-out because a column promotion rewrites downstream contracts).
    schema_evolution: bool = True
    #: Minimum files a new tag must appear in before promotion.
    evolution_min_files: int = 1

    @property
    def system_columns(self) -> list[str]:
        return [c for c in self.schema_columns if c.startswith("__")]

    @property
    def tag_columns(self) -> list[str]:
        return [c for c in self.schema_columns if not c.startswith("__")]


def _validate(cols: list[str]) -> list[str]:
    if cols.count("__path") != 1:
        raise ValueError("schema_columns must contain __path exactly once")
    if "__sqlmodded" not in cols:
        raise ValueError("schema_columns must contain __sqlmodded")
    seen: dict[str, None] = {}
    for c in cols:  # first-seen order, like ColumnOrderTracker
        seen.setdefault(c)
    return list(seen)


def default_config() -> EngineConfig:
    cols = _validate(list(DEFAULT_SCHEMA_COLUMNS))
    return EngineConfig(
        schema_columns=cols,
        keep_columns=[c for c in cols if not c.startswith("__")],
        dedupe_columns=list(DEFAULT_DEDUPE_COLUMNS),
        critical_columns=list(DEFAULT_CRITICAL_COLUMNS),
        delimiter=DEFAULT_DELIMITER,
    )


def load_config(path: str | Path) -> EngineConfig:
    """Load a tagminder.toml-shaped file; missing sections fall back to
    the defaults (the reference errors instead — we degrade so partial
    configs still run)."""
    raw = tomllib.loads(Path(path).read_text(encoding="utf-8"))
    columns = raw.get("columns", {})
    cleanup = raw.get("cleanup", {})
    strings = raw.get("strings", {})
    schema = _validate(
        list(columns.get("schema_columns", DEFAULT_SCHEMA_COLUMNS))
    )
    return EngineConfig(
        schema_columns=schema,
        keep_columns=list(
            cleanup.get(
                "keep_columns", [c for c in schema if not c.startswith("__")]
            )
        ),
        dedupe_columns=list(cleanup.get("dedupe_columns", DEFAULT_DEDUPE_COLUMNS)),
        critical_columns=list(
            raw.get("reports", {}).get("critical_columns", DEFAULT_CRITICAL_COLUMNS)
        ),
        delimiter=str(strings.get("multivalue_delimiter", DEFAULT_DELIMITER)),
        schema_evolution=bool(columns.get("schema_evolution", True)),
        evolution_min_files=int(columns.get("evolution_min_files", 1)),
    )


def evolve_alib_schema(alib, cfg: EngineConfig):
    """Config-gated schema evolution: discover overflow tag keys and
    promote them to real columns (sources.catalog.promote_extra_tags).
    Returns (frame, promoted_names); a no-op when the gate is off."""
    from tagminder_spark.sources.catalog import (  # noqa: PLC0415
        discover_new_tags,
        promote_extra_tags,
    )

    if not cfg.schema_evolution:
        return alib, []
    new_cols = [
        c
        for c in discover_new_tags(alib, cfg.evolution_min_files)
        if c not in cfg.schema_columns and not c.startswith("__")
    ]
    if not new_cols:
        return alib, []
    return promote_extra_tags(alib, new_cols), new_cols
