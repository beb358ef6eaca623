"""Numbered pipeline steps (reference parity → SURVEY.md Appendix A).

Design: every step is a column-transform over the alib frame, built from
the shared expression library; none of them writes anything. ``run_step``
composes a step with the diff-audit operator to produce the
(updated_rows, changelog_rows) pair — the reference's §2.10 protocol —
so persistence (MERGE + changelog append) stays a single code path.

Steps implemented here and their reference sources (file:line into
/root/reference/scripts/pipeline/):
- 02 clean-text           02-clean-text-fields.py:66-106
- 04 writers→composer     04-merge-songwriter-fields-into-composer.py:31-89
- 05 infer composers      05-infer-composers-from-library.py:97-213
- 08 subtitles            08-normalize-subtitles.py:60-130
- 09 live markers         09-normalize-live-markers.py:41-135
- 12 compilations         12-detect-compilations.py:63-201
- 13 discnumber cleanup   13-cleanup-discnumber.py:77-183
- 16 track uuid           16-populate-track-uuid.py:38-85
- 17 dedupe tags          17-dedupe-columns.py:74-93
- 20 dates/years          20-normalize-dates-and-years.py:95-221
- 21 title case           21-normalise-titles.py:100-118

Scale: every step is either map-only (02/08/09/16/17/20/21 — zero
shuffle at any corpus size) or one windowed/grouped pass keyed by the
album directory or title (05/12/13).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from tagminder_spark.functions.core import (
    MV_DELIM,
    album_root,
    blank_to_null,
    is_blank,
    mv_join,
    mv_tokens,
)
from tagminder_spark.functions.dates import normalize_date
from tagminder_spark.functions.textcase import title_case_udf
from tagminder_spark.operators.diff_audit import diff_audit

#: Default column sets per step (subset of tagminder.toml's contract).
STEP_COLUMNS: dict[str, tuple[str, ...]] = {
    "02": ("title", "subtitle", "artist", "albumartist", "album", "composer"),
    "04": ("composer",),
    "05": ("composer",),
    "08": ("title", "subtitle"),
    "09": ("title", "subtitle", "album", "live"),
    "12": ("albumartist", "compilation"),
    "13": ("discnumber",),
    "16": ("track_uuid",),
    "17": ("artist", "composer", "genre", "style"),
    "20": ("year", "originalyear"),
    "21": ("title", "subtitle", "work", "movement", "grouping"),
}


def run_step(
    df: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    cols: list[str],
    script: str,
    key: str = "__path",
) -> tuple[DataFrame, DataFrame]:
    """Apply a step and route it through diff-audit (§2.10 protocol)."""
    return diff_audit(df, step(df), key, cols, script=script)


# ---------------------------------------------------------------------------
# 02: clean text fields (CRLF/LF strip, mojibake apostrophe, blank⇒NULL)
# ---------------------------------------------------------------------------

def _clean_text_expr(c: Column) -> Column:
    stripped = F.trim(F.regexp_replace(c, "\r?\n", ""))
    fixed = F.when(stripped.isin("â€™", "Ì"), F.lit("'")).otherwise(stripped)
    return blank_to_null(fixed)


def step02_clean_text(
    df: DataFrame, cols: tuple[str, ...] = STEP_COLUMNS["02"]
) -> DataFrame:
    """Pure-expression port of the reference's clean_text UDF — the when
    chain stays inside codegen instead of a per-row Python call."""
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(c, _clean_text_expr(F.col(c)))
    return out


# ---------------------------------------------------------------------------
# 04: merge composer/arranger/lyricist/writer → composer
# ---------------------------------------------------------------------------

def _caseless_ordered_dedup(arr: Column) -> Column:
    """First-seen-wins dedup, case-insensitive, order preserving — a pure
    fold: accumulator carries (seen_lower[], out[])."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("seen"),
        F.array().cast("array<string>").alias("out"),
    )
    step = lambda acc, x: F.when(  # noqa: E731
        F.array_contains(acc["seen"], F.lower(x)), acc
    ).otherwise(
        F.struct(
            F.array_append(acc["seen"], F.lower(x)).alias("seen"),
            F.array_append(acc["out"], x).alias("out"),
        )
    )
    return F.aggregate(arr, acc0, step, lambda acc: acc["out"])


def step04_merge_writers(df: DataFrame) -> DataFrame:
    """Ordered caseless merge of the four songwriter fields into composer;
    sources stay untouched (the reference only rewrites composer)."""
    merged = F.concat(
        *[
            mv_tokens(F.coalesce(F.col(c), F.lit("")))
            for c in ("composer", "arranger", "lyricist", "writer")
            if c in df.columns
        ]
    )
    return df.withColumn("composer", mv_join(_caseless_ordered_dedup(merged)))


# ---------------------------------------------------------------------------
# 05: infer composers from the library (majority vote)
# ---------------------------------------------------------------------------

def step05_infer_composers(df: DataFrame) -> DataFrame:
    """Fill blank composers by majority vote over (normalized title,
    single artist) pairs that have composers elsewhere in the library.

    Explode → count → window argmax (deterministic ties) → left join back
    to blank-composer single-artist rows. The reference's sort+first idiom
    (05:139-153) becomes an explicit ranked window.
    """
    norm_title = F.lower(F.trim(F.col("title")))
    toks = mv_tokens(F.col("artist"))
    exploded = (
        df.filter(~is_blank(F.col("composer")) & ~is_blank(F.col("title")))
        .select(
            norm_title.alias("norm_title"),
            F.explode(toks).alias("artist_tok"),
            F.col("composer"),
        )
    )
    votes = exploded.groupBy("norm_title", "artist_tok", "composer").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("norm_title", "artist_tok").orderBy(
        F.desc("n"), F.asc("composer")
    )
    majority = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "norm_title", "artist_tok", F.col("composer").alias("inferred_composer")
        )
    )
    single_artist = F.when(F.size(toks) == 1, F.element_at(toks, 1))
    target = df.withColumn("norm_title", norm_title).withColumn(
        "artist_tok", single_artist
    )
    return (
        target.join(majority, ["norm_title", "artist_tok"], "left")
        .withColumn(
            "composer",
            F.when(
                is_blank(F.col("composer")) & F.col("inferred_composer").isNotNull(),
                F.col("inferred_composer"),
            ).otherwise(F.col("composer")),
        )
        .drop("norm_title", "artist_tok", "inferred_composer")
    )


# ---------------------------------------------------------------------------
# 08: subtitles — move bracketed [..] title suffixes into subtitle
# ---------------------------------------------------------------------------

def step08_subtitles(df: DataFrame) -> DataFrame:
    """Move [bracketed] title suffixes into the subtitle cell with
    caseless first-seen dedup (08-normalize-subtitles.py:60-130)."""
    items = F.regexp_extract_all(F.col("title"), F.lit(r"\[([^\]]+)\]"), 1)
    clean_title = blank_to_null(
        F.trim(F.regexp_replace(F.col("title"), r"\s*\[[^\]]+\]", ""))
    )
    old_items = F.filter(
        F.transform(
            F.split(F.coalesce(F.col("subtitle"), F.lit("")), "; |" + MV_DELIM.replace("\\", "\\\\")),
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    all_items = _caseless_ordered_dedup(F.concat(old_items, items))
    new_subtitle = F.when(F.size(all_items) > 0, F.array_join(all_items, "; "))
    return df.withColumn(
        "subtitle",
        F.when(F.size(items) > 0, new_subtitle).otherwise(F.col("subtitle")),
    ).withColumn(
        "title", F.when(F.size(items) > 0, clean_title).otherwise(F.col("title"))
    )


# ---------------------------------------------------------------------------
# 09: live markers
# ---------------------------------------------------------------------------

_LIVE_SUFFIX = r"(?i)(?:[\(\[\{<]\s*live\s*[\)\]\}>]|- live)\s*$"
_LIVE_WORD = r"(?i)\blive\b"


def step09_live_markers(df: DataFrame) -> DataFrame:
    """Strip trailing live markers from title/album, normalize subtitle
    separators, append [Live] once, set the live flag — only for rows
    carrying a marker."""
    # Evaluate the marker on the ORIGINAL columns before any rewrite —
    # chained withColumns would otherwise see the already-stripped values.
    has_marker = F.col("__live_marker")
    strip = lambda c: blank_to_null(  # noqa: E731
        F.trim(F.regexp_replace(c, _LIVE_SUFFIX, ""))
    )
    sub_norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.col("subtitle"), MV_DELIM.replace("\\", "\\\\"), "; "
            ),
            r"\s*;\s*",
            "; ",
        )
    )
    sub_new = (
        F.when(F.col("subtitle").isNotNull() & sub_norm.rlike(_LIVE_WORD), sub_norm)
        .when(
            F.col("subtitle").isNotNull(),
            F.concat_ws("; ", sub_norm, F.lit("[Live]")),
        )
        .otherwise(F.lit("[Live]"))
    )
    return (
        df.withColumn(
            "__live_marker",
            F.col("title").rlike(_LIVE_SUFFIX) | F.col("album").rlike(_LIVE_SUFFIX),
        )
        .withColumn(
            "title", F.when(has_marker, strip(F.col("title"))).otherwise(F.col("title"))
        )
        .withColumn(
            "album", F.when(has_marker, strip(F.col("album"))).otherwise(F.col("album"))
        )
        .withColumn(
            "subtitle", F.when(has_marker, sub_new).otherwise(F.col("subtitle"))
        )
        .withColumn(
            "live", F.when(has_marker, F.lit("1")).otherwise(F.col("live"))
        )
        .drop("__live_marker")
    )


# ---------------------------------------------------------------------------
# 12: compilation detection
# ---------------------------------------------------------------------------

def step12_compilations(df: DataFrame) -> DataFrame:
    """Artist-cardinality rules first (per-directory window, no rejoin),
    path-pattern rules for untouched rows."""
    w = W.partitionBy("__dirpath")
    n_artists = F.size(F.collect_set("artist").over(w))
    first_artist = F.min("artist").over(w)
    aa_blank = is_blank(F.col("albumartist"))
    aa_various = F.lower(F.trim(F.col("albumartist"))).isin(
        "various artists", "various"
    )
    last_seg = F.element_at(F.split(F.col("__dirpath"), "/"), -1)
    path_comp = (
        last_seg.startswith("VA - ")
        | last_seg.startswith("Various Artists - ")
        | last_seg.startswith("OST - ")
    )
    rule1 = aa_blank & (n_artists > 1)
    rule2 = aa_blank & (n_artists == 1)
    rule3 = aa_various & (n_artists > 1)
    artist_rule = rule1 | rule2 | rule3
    compilation = (
        F.when(rule1 | rule3, F.lit("1"))
        .when(rule2, F.lit("0"))
        .when(path_comp, F.lit("1"))
        .otherwise(F.lit("0"))
    )
    albumartist = (
        F.when(rule1 | rule3, F.lit("Various Artists"))
        .when(rule2, first_artist)
        .otherwise(F.col("albumartist"))
    )
    _ = artist_rule  # rules 1-3 take priority; path rule fills the rest
    return df.withColumn("compilation", compilation).withColumn(
        "albumartist", albumartist
    )


# ---------------------------------------------------------------------------
# 13: discnumber cleanup
# ---------------------------------------------------------------------------

def step13_discnumber(df: DataFrame) -> DataFrame:
    """Clear discnumber where it is constant across a directory that is
    not a disc subfolder (the value carries no information)."""
    w = W.partitionBy("__dirpath")
    n_discs = F.size(F.collect_set("discnumber").over(w))
    in_disc_folder = album_root(F.col("__dirpath")) != F.col("__dirpath")
    clear = (n_discs == 1) & ~in_disc_folder & ~is_blank(F.col("discnumber"))
    return df.withColumn(
        "discnumber",
        F.when(clear, F.lit(None).cast("string")).otherwise(F.col("discnumber")),
    )


# ---------------------------------------------------------------------------
# 16: track uuid (UUIDv7 where missing / not v7)
# ---------------------------------------------------------------------------

def _uuid7() -> str:
    import os
    import time

    ts = time.time_ns() // 1_000_000
    b = bytearray(ts.to_bytes(6, "big") + os.urandom(10))
    b[6] = (b[6] & 0x0F) | 0x70
    b[8] = (b[8] & 0x3F) | 0x80
    h = bytes(b).hex()
    return f"{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def _uuid7_udf():
    def gen(s):
        return s.map(lambda _: _uuid7())

    return F.pandas_udf(gen, "string")


def step16_track_uuid(df: DataFrame) -> DataFrame:
    """UUIDv7 where track_uuid is blank or not version 7
    (16-populate-track-uuid.py:38-85)."""
    needs = is_blank(F.col("track_uuid")) | (
        F.substring(F.col("track_uuid"), 15, 1) != "7"
    )
    gen = _uuid7_udf()
    return df.withColumn(
        "track_uuid",
        F.when(needs, gen(F.col("track_uuid"))).otherwise(F.col("track_uuid")),
    )


# ---------------------------------------------------------------------------
# 17: dedupe multi-value columns
# ---------------------------------------------------------------------------

def step17_dedupe_tags(
    df: DataFrame, cols: tuple[str, ...] = STEP_COLUMNS["17"]
) -> DataFrame:
    """Per-cell multi-value token dedup on the configured columns
    (17-dedupe-columns.py:74-93)."""
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(c, mv_join(mv_tokens(F.col(c))))
    return out


# ---------------------------------------------------------------------------
# 20: dates and years
# ---------------------------------------------------------------------------

def step20_dates(
    df: DataFrame, cols: tuple[str, ...] = STEP_COLUMNS["20"]
) -> DataFrame:
    """Canonicalize every token of a multi-value date cell; unparseable
    tokens drop; dedup preserves first-seen order."""
    out = df
    for c in cols:
        if c in df.columns:
            toks = mv_tokens(F.col(c))
            normed = F.filter(
                F.transform(toks, lambda x: normalize_date(x)),
                lambda x: x.isNotNull(),
            )
            out = out.withColumn(c, mv_join(F.array_distinct(normed)))
    return out


# ---------------------------------------------------------------------------
# 21: conservative title case
# ---------------------------------------------------------------------------

def step21_titlecase(
    df: DataFrame, cols: tuple[str, ...] = STEP_COLUMNS["21"]
) -> DataFrame:
    """Conservative English title-case over the configured columns
    (21-normalise-titles.py:100-118 → tm_titlecase engine)."""
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(c, title_case_udf(F.col(c)))
    return out
