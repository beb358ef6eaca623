"""Script-catalog classification — the reference TUI runner's grouping,
filtering and status-labelling logic (src/tagminder/app/tm_tui.py:
1147-1213: _category_for_filename, _parse_step_number,
_format_script_label, _matches_filter), re-keyed to this engine's query
registry instead of script filenames.

The decision table is the reference's: MDM paths and 89-* scripts are
Master Data Management, library-health/insights are Library Health,
report-named units are Reporting, tags2db/98-*/99-* are Tag
Import/Export, everything else Data Quality.  The registry equivalents
of those filename cues are the gate-name prefixes.
"""

from __future__ import annotations

from dataclasses import dataclass

CATEGORY_MDM = "Master Data Management"
CATEGORY_HEALTH = "Library Health"
CATEGORY_REPORTING = "Reporting"
CATEGORY_IO = "Tag Import/Export"
CATEGORY_QUALITY = "Data Quality"


def category_for_query(name: str) -> str:
    """Category of a registered gate name, mirroring the reference's
    filename decision table (tm_tui.py:1147-1172)."""
    n = name.lower()
    # harvest / works / wikidata / validate gates ≙ scripts/mdm/ paths
    if n.startswith(("h_", "s14_", "s15_", "v89_")) or "mbid" in n:
        return CATEGORY_MDM
    if n.startswith(("r92_", "r91_")) or "insights" in n:
        return CATEGORY_HEALTH
    if n.startswith(("r9", "a9_")) or "report" in n:
        return CATEGORY_REPORTING
    if n.startswith(("s98_", "s13_", "s3_", "s78_")) or "export" in n:
        return CATEGORY_IO
    return CATEGORY_QUALITY


def parse_step_number(name: str) -> int | None:
    """Pipeline step number from a gate name (`pl_step07_vetted` → 7);
    the reference parses the same from `07-foo.py` filenames
    (tm_tui.py:1174-1183)."""
    if not name.startswith("pl_step"):
        return None
    digits = name[len("pl_step") :].split("_", 1)[0]
    return int(digits) if digits.isdigit() else None


@dataclass(frozen=True)
class RunStatus:
    """Last-run outcome shown in the catalog label."""

    rc: int
    ts: str


def format_label(name: str, status: RunStatus | None) -> str:
    """`[OK ts] name` / `[ERR rc ts] name` / bare name — the TUI's
    colored label minus the color (tm_tui.py:1185-1199)."""
    if status is None:
        return name
    prefix = (
        f"[OK {status.ts}]" if status.rc == 0 else f"[ERR {status.rc} {status.ts}]"
    )
    return f"{prefix} {name}"


def matches_filter(
    tokens: list[str], name: str, *extra_haystack: str | None
) -> bool:
    """All tokens must appear (case-insensitive) in the unit's combined
    name + description text (tm_tui.py:1201-1212)."""
    if not tokens:
        return True
    hay = " ".join([name, *[s for s in extra_haystack if s]]).lower()
    return all(t.lower() in hay for t in tokens)


def catalog(queries: dict[str, object]) -> list[tuple[str, str, int | None]]:
    """(category, name, step number) rows for every registered query,
    sorted by (category, step number nulls-last, name) — the grouping
    the TUI tree renders."""
    rows = [
        (category_for_query(n), n, parse_step_number(n)) for n in queries
    ]
    return sorted(rows, key=lambda r: (r[0], r[2] is None, r[2] or 0, r[1]))
