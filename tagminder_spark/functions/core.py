"""Shared expression library — the reference's scalar-predicate surface.

Every helper returns a Column built from built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd); no Python UDFs in this module. These are
the §2.2/§2.8 primitives from SURVEY.md that every pipeline step and report
composes.

Reference parity (file:line into /root/reference):
- blank predicate: src/tagminder/core/tm_changelog.py:65-82 (NULL / '' /
  whitespace ⇒ blank; the literal string '""' also counts).
- md5 validity: src/tagminder/core/tm_polars.py:38-50 (null/empty/'0'/
  all-zero-after-hyphen-strip ⇒ invalid).
- truthy flags: scripts/reports/92-library-insights.py:126-136.
- multi-value codec: delimiter is two literal backslashes between values
  (scripts/ingest/tags2db.py:108-121, tagminder.toml:456-460); tokenize is
  split → strip → drop-empty → order-preserving dedup
  (src/tagminder/core/tm_polars.py:53-70). Spark's array_distinct keeps the
  first occurrence, matching Polars list.unique(maintain_order=True).
- album_root: disc subfolders (cd/disc + up-to-3 digits) roll up to the
  parent folder (src/tagminder/core/tm_album.py:30-47).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's multi-value delimiter: two literal backslash characters.
MV_DELIM = "\\\\"

#: Regex (Java + RE2 compatible) matching a trailing disc subfolder segment.
_DISC_SEGMENT_RE = r"/(?:[Cc][Dd]|[Dd][Ii][Ss][Cc])\s*0*[0-9]{1,3}$"

_TRUTHY_VALUES = ("1", "true", "yes", "y", "t", "on")


def is_blank(c: Column | str) -> Column:
    """NULL, empty, whitespace-only, or the literal two-char string ``""``."""
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col)
    return col.isNull() | (t == "") | (t == '""')


def blank_to_null(c: Column | str) -> Column:
    """Normalize blank-family values to NULL (the storage canonical form)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(is_blank(col), F.lit(None).cast("string")).otherwise(col)


def truthy(c: Column | str) -> Column:
    """Parse a text flag column to 0/1 (int); blank ⇒ 0."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.lower(F.trim(col)).isin(*_TRUTHY_VALUES), F.lit(1)
    ).otherwise(F.lit(0))


def md5_invalid(c: Column | str) -> Column:
    """True when an md5-signature cell is unusable: blank, '0', or all-zero
    once hyphens are stripped."""
    col = F.col(c) if isinstance(c, str) else c
    stripped = F.regexp_replace(F.trim(col), "-", "")
    return (
        is_blank(col)
        | (stripped == "0")
        | stripped.rlike("^0+$")
    )


def album_root(c: Column | str) -> Column:
    """Roll a directory path up past a trailing disc subfolder.

    ``/music/Artist/Album/CD1`` → ``/music/Artist/Album``;
    paths without a disc leaf are returned unchanged.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(col, _DISC_SEGMENT_RE, "")


def mv_tokens(c: Column | str, delim: str = MV_DELIM) -> Column:
    """Decode a multi-value cell to an array: split on the delimiter, trim
    each token, drop blanks, dedup preserving first-seen order."""
    col = F.col(c) if isinstance(c, str) else c
    # split() takes a regex: escape each backslash for the Java regex engine.
    pattern = delim.replace("\\", "\\\\")
    toks = F.split(col, pattern)
    toks = F.transform(toks, lambda x: F.trim(x))
    toks = F.filter(toks, lambda x: x != "")
    return F.array_distinct(toks)


def mv_join(arr: Column, delim: str = MV_DELIM) -> Column:
    """Encode an array back to the delimiter-joined storage form; empty
    arrays become NULL (blank⇒NULL canonicalization)."""
    joined = F.array_join(arr, delim)
    return F.when(F.size(arr) > 0, joined).otherwise(F.lit(None).cast("string"))
