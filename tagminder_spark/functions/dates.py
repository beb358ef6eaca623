"""Date/year normalization expressions.

Reference parity:
- canonical shapes YYYY / YYYY-MM-DD from inputs like ``20010503``,
  ``2001/05/03``, ``2001.05.03``, ``2001-05``, bare ``2001``
  (scripts/pipeline/20-regularise-dates-years.py:95-221);
- epoch s/ms heuristic (scripts/reports/92-library-insights.py:826-835):
  values above 5e10 are milliseconds;
- decade = (year // 10) * 10 (92-library-insights.py:1685-1800).

All pure Column expressions (regexp_replace / when chains) so Catalyst can
codegen them and DuckDB oracles can replicate them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_date(c: Column | str) -> Column:
    """Canonicalize one date token to YYYY or YYYY-MM-DD (NULL if no match).

    Accepted shapes: YYYY, YYYYMMDD, YYYY-MM-DD, YYYY/MM/DD, YYYY.MM.DD,
    YYYY-MM (truncated to YYYY, matching the reference's conservative rule).
    """
    col = F.trim(F.col(c) if isinstance(c, str) else c)
    ymd_compact = F.regexp_replace(
        col, r"^([0-9]{4})([0-9]{2})([0-9]{2})$", r"$1-$2-$3"
    )
    ymd_sep = F.regexp_replace(
        ymd_compact, r"^([0-9]{4})[/.]([0-9]{2})[/.]([0-9]{2})$", r"$1-$2-$3"
    )
    return (
        F.when(col.rlike(r"^[0-9]{4}$"), col)
        .when(col.rlike(r"^[0-9]{4}-[0-9]{2}$"), F.substring(col, 1, 4))
        .when(
            ymd_sep.rlike(r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"), ymd_sep
        )
        .otherwise(F.lit(None).cast("string"))
    )


def normalize_year(c: Column | str) -> Column:
    """Extract the 4-digit year from any normalizable date token."""
    norm = normalize_date(c)
    return F.when(norm.isNotNull(), F.substring(norm, 1, 4)).otherwise(
        F.lit(None).cast("string")
    )


def epoch_to_ts(c: Column | str) -> Column:
    """Epoch text/number → timestamp with the s/ms heuristic (>5e10 ⇒ ms)."""
    col = (F.col(c) if isinstance(c, str) else c).cast("double")
    secs = F.when(col > F.lit(5e10), col / 1000.0).otherwise(col)
    return F.timestamp_seconds(secs)


def decade(year: Column | str) -> Column:
    y = (F.col(year) if isinstance(year, str) else year).cast("int")
    return (F.floor(y / 10) * 10).cast("int")
