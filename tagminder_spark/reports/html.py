"""HTML dashboard sink (SURVEY §2.1 S18).

Reference: scripts/reports/92-report-library-health.py:573-660 renders
Plotly figures + tables into a cache dir from already-computed
aggregates. The Spark division of labor is identical and is the point:
ALL aggregation happens distributed; only the final small aggregate rows
are collected and rendered driver-side. Plotly isn't in this container,
so the renderer emits dependency-free static HTML tables — the data path
(aggregate → collect → render → file) is the real, tested part.
"""

from __future__ import annotations

import html
from pathlib import Path

from pyspark.sql import DataFrame

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
body {{ font-family: sans-serif; margin: 2rem; }}
table {{ border-collapse: collapse; margin-bottom: 2rem; }}
th, td {{ border: 1px solid #999; padding: 4px 10px; text-align: left; }}
th {{ background: #eee; }}
caption {{ font-weight: bold; padding: 6px; text-align: left; }}
</style></head><body><h1>{title}</h1>{sections}</body></html>
"""


def _table(caption: str, df: DataFrame, max_rows: int) -> str:
    rows = df.limit(max_rows).collect()
    head = "".join(f"<th>{html.escape(c)}</th>" for c in df.columns)
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{html.escape('' if v is None else str(v))}</td>" for v in row
        )
        + "</tr>"
        for row in rows
    )
    return (
        f"<table><caption>{html.escape(caption)}</caption>"
        f"<tr>{head}</tr>{body}</table>"
    )


def render_dashboard(
    sections: dict[str, DataFrame],
    out_path: str | Path,
    title: str = "library health",
    max_rows_per_section: int = 100,
) -> Path:
    """Collect each (small, already-aggregated) section DataFrame and
    write one static HTML page. Guard rail: this collects `max_rows` per
    section — feed it aggregates, never fact tables."""
    body = "".join(
        _table(name, df, max_rows_per_section) for name, df in sections.items()
    )
    out = Path(out_path)
    out.write_text(_PAGE.format(title=html.escape(title), sections=body))
    return out
