"""Contributor/genre dictionary steps (reference parity → SURVEY.md App. A).

- 06 normalize contributors  06-normalize-contributors.py:50-61, 438-585
- 10 genres/styles           10-normalize-genres-and-styles.py:62-93, 344-394
- 11 genre enrichment        11-enrich-genres-using-artist-genre-norms.py:236-313

Scale notes: step 06 is the one genuinely UDF-shaped operator — the
3-stage dictionary-guarded splitter's control flow (dict hit → no split;
all-&-parts-resolve → split) cannot be expressed with built-in functions
without materializing the dictionary per token. It runs as an
Arrow-batched pandas UDF with the contributor dictionary broadcast once
per executor (the reference holds the same dict in process memory). Steps
10/11 stay pure-expression: the genre vocabulary is config-scale (map
literal), the per-artist genre norms dimension joins via broadcast.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tagminder_spark.functions.core import MV_DELIM, blank_to_null, is_blank, mv_join, mv_tokens
from tagminder_spark.functions.textcase import contributor_case
from tagminder_spark.pipeline.steps_ext import _map_literal

# ---------------------------------------------------------------------------
# 06: normalize contributors (3-stage dictionary-guarded splitter)
# ---------------------------------------------------------------------------

#: Split stages (06-normalize-contributors.py:50-61): primary = explicit
#: multi-value delimiters (but not '/'); comma only when not a thousands
#: separator or a Jr/Sr/roman suffix; slash and '&' as guarded fallbacks.
_PRIMARY_SPLIT = re.compile(r"(?:\\\\|;)")
_COMMA_SPLIT = re.compile(
    r",(?!\d{3}(?:\D|$))(?!\s*(?:[Jj][Rr]|[Ss][Rr]|[Ii][Ii][Ii]|[Ii][Vv]|[Vv])\b)"
)
_SLASH_SPLIT = re.compile(r"/")
_AMP_SPLIT = re.compile(r"\s*&\s*")


def normalize_contributor_cell(part: str | None, refs: dict[str, str]) -> str | None:
    """The reference's per-cell normalization (06:438-527), verbatim
    semantics: dictionary lookup at every stage before splitting further;
    conservative '&' split only when every side resolves and the whole
    does not; hyphenated unresolved names preserved; smart-title fallback;
    order-preserving dedup."""
    if part is None or not part.strip():
        return None
    part = part.strip()
    hit = refs.get(part.lower())
    if hit is not None:
        return hit
    out: list[str] = []
    for primary in _PRIMARY_SPLIT.split(part):
        primary = primary.strip()
        if not primary:
            continue
        hit = refs.get(primary.lower())
        if hit is not None:
            out.append(hit)
            continue
        for comma in _COMMA_SPLIT.split(primary):
            comma = comma.strip()
            if not comma:
                continue
            hit = refs.get(comma.lower())
            if hit is not None:
                out.append(hit)
                continue
            for piece in _SLASH_SPLIT.split(comma):
                piece = piece.strip()
                if not piece:
                    continue
                if "&" in piece:
                    amp = [a.strip() for a in _AMP_SPLIT.split(piece)]
                    if (
                        len(amp) > 1
                        and piece.lower() not in refs
                        and all(a and a.lower() in refs for a in amp)
                    ):
                        out.extend(refs[a.lower()] for a in amp)
                        continue
                hit = refs.get(piece.lower())
                if hit is not None:
                    out.append(hit)
                elif "-" in piece:
                    out.append(piece)  # preserve hyphenated names (AC-DC)
                else:
                    cased = contributor_case(piece)
                    if cased:
                        out.append(cased)
    if not out:
        return None
    return MV_DELIM.join(dict.fromkeys(out))


def step06_contributors(
    df: DataFrame,
    contributors: dict[str, str],
    cols: tuple[str, ...] = ("artist", "albumartist", "composer"),
) -> DataFrame:
    """Apply the 3-stage splitter to each contributor column. The
    dictionary ships once per executor via the UDF closure (Arrow
    batches; no per-row Python call overhead beyond the batch loop)."""
    refs = {k.lower(): v for k, v in contributors.items()}

    @F.pandas_udf(T.StringType())
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda x: normalize_contributor_cell(x, refs), na_action=None)

    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(c, norm(F.col(c)))
    return out


# ---------------------------------------------------------------------------
# 10: normalize genres and styles
# ---------------------------------------------------------------------------

#: Verbatim rule table (10-normalize-genres-and-styles.py:62-93); values
#: may themselves be multi-value cells.
HARD_CODED_REPLACEMENTS: dict[str, str] = {
    "acoustic": "Singer/Songwriter",
    "acoustic pop": "Pop/Rock\\\\Singer/Songwriter",
    "alternative": "Adult Alternative Pop/Rock",
    "alternative & indie": "Alternative/Indie Rock",
    "alternative / indie rock / pop / rock": "Alternative/Indie Rock\\\\Pop/Rock",
    "alternative rock": "Alternative/Indie Rock",
    "blues/country/folk": "Blues\\\\Country\\\\Folk",
    "folk/americana": "Folk\\\\Americana",
    "indie": "Indie Rock",
    "jazz, blues": "Jazz Blues",
    "jazz, rock": "Jazz-Rock",
    "jazz vocal": "Vocal Jazz",
    "metal": "Heavy Metal",
    "pop-folk": "Pop/Rock\\\\Folk",
    "pop, rock": "Pop/Rock",
    "pop, singer & songwriter": "Pop/Rock\\\\Singer/Songwriter",
    "rock / blues": "Blues-Rock",
    "rock blues": "Blues-Rock",
    "rock": "Pop/Rock",
    "singer & songwriter": "Singer/Songwriter",
    "singer and songwriter": "Singer/Songwriter",
    "singer / songwriter": "Singer/Songwriter",
    "songwriter": "Singer/Songwriter",
    "songwriting": "Singer/Songwriter",
    "film soundtracks": "Soundtracks",
    "soundtrack": "Soundtracks",
    "south african": "South African Pop/Rock",
    "world": "International",
    "world music": "International",
}


def step10_genres(
    df: DataFrame,
    vetted: list[str],
    cols: tuple[str, ...] = ("genre", "style"),
) -> DataFrame:
    """Token-level genre normalization: hardcoded replacements (whose
    values may fan out to several tokens), then validation against the
    vetted vocabulary — unvetted tokens drop, vetted ones take canonical
    casing. The reference validates leftovers with TF-IDF fuzzy matching
    at 0.95 (10:344-394); that scale path lives in
    ``operators.similarity`` (LSH) and is deliberately not part of this
    deterministic step. Zero shuffle: both dictionaries are map literals.
    """
    hard = _map_literal(HARD_CODED_REPLACEMENTS)
    vet = _map_literal({g.lower(): g for g in vetted})
    out = df
    for c in cols:
        if c not in df.columns:
            continue
        toks = mv_tokens(F.col(c))
        replaced = F.flatten(
            F.transform(
                toks,
                lambda t: F.split(
                    F.coalesce(hard[F.lower(t)], t), MV_DELIM.replace("\\", "\\\\")
                ),
            )
        )
        kept = F.filter(
            F.transform(replaced, lambda t: vet[F.lower(F.trim(t))]),
            lambda t: t.isNotNull(),
        )
        out = out.withColumn(c, mv_join(F.array_distinct(kept)))
    return out


# ---------------------------------------------------------------------------
# 11: enrich genres from per-artist genre norms
# ---------------------------------------------------------------------------

def parse_genre_norms(ref: DataFrame) -> DataFrame:
    """JSON-array reference columns → multi-value strings; malformed or
    non-array payloads become empty (11:236-276)."""

    def arr_to_mv(c: str):
        arr = F.from_json(F.col(c), T.ArrayType(T.StringType()))
        toks = F.filter(
            F.transform(arr, lambda x: F.trim(x)),
            lambda x: x.isNotNull() & (x != ""),
        )
        return F.when(arr.isNotNull(), F.array_join(toks, MV_DELIM)).otherwise(
            F.lit("")
        )

    return ref.select(
        F.col("mbid"),
        arr_to_mv("allmusic_genres_json").alias("ref_genre"),
        arr_to_mv("allmusic_styles_json").alias("ref_style"),
    )


def step11_genre_enrich(df: DataFrame, norms: DataFrame) -> DataFrame:
    """Merge per-artist reference genres/styles into each track's cells:
    blank existing → reference; blank reference → existing; else
    existing ++ reference (the reference concatenates without dedup —
    step 17 dedupes later). Broadcast join on the artist MBID
    (11:281-313)."""
    dim = F.broadcast(norms)
    joined = df.join(
        dim, df["musicbrainz_artistid"] == dim["mbid"], "left"
    ).drop("mbid")

    def merge(existing: str, ref: str):
        e, r = F.col(existing), F.col(ref)
        return (
            F.when(is_blank(e), blank_to_null(r))
            .when(r.isNull() | (F.trim(r) == ""), e)
            .otherwise(F.concat(e, F.lit(MV_DELIM), r))
        )

    return (
        joined.withColumn("genre", merge("genre", "ref_genre"))
        .withColumn("style", merge("style", "ref_style"))
        .drop("ref_genre", "ref_style")
    )


# ---------------------------------------------------------------------------
# 89: validate vetted-contributor multi-values
# ---------------------------------------------------------------------------

def validate_vetted_multivalues(
    vetted: DataFrame, entities: DataFrame, entity_col: str = "lpreferred_name"
) -> DataFrame:
    """89-validate-vetted-contributor-multi-values.py:79-121 — rows of
    ``_REF_vetted_contributors`` with NULL status and a delimited
    ``replacement_val`` are accepted (status '1') when every distinct
    stripped token resolves in the disambiguated entity set (lowercase
    lookup), rejected ('empty segments') when any segment is blank, and
    left untouched when a token is simply unknown (a later harvest may
    learn it).

    The reference walks tokens IN ORDER and returns at the first
    offence, so an unknown token before a blank segment means
    "skipped", not "empty segments" — replicated here by comparing the
    position of the first blank segment with the position of the first
    unknown token.

    Spark shape: the blank-position probe is ``array_position`` over the
    raw split (map-side); the membership check posexplodes candidate
    rows and broadcast-anti-joins the entity dimension — the only
    shuffle is the per-row min-position regroup of that small candidate
    set.  Adds ``status_out`` and ``decision`` (accepted /
    empty_segments / skipped_missing / not_candidate).
    """
    delim_re = MV_DELIM.replace("\\", "\\\\")
    raw_segments = F.transform(
        F.split(F.col("replacement_val"), delim_re), lambda x: F.trim(x)
    )
    is_candidate = (
        F.col("status").isNull()
        & F.col("replacement_val").isNotNull()
        & F.col("replacement_val").contains(MV_DELIM)
    )
    # 1-based position of the first blank segment, 0 when none
    empty_pos = F.array_position(raw_segments, "")

    cand = vetted.filter(is_candidate)
    toks = cand.select(
        "rowid", F.posexplode(raw_segments).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    ent = F.broadcast(
        entities.select(F.lower(F.col(entity_col)).alias("__ent"))
        .filter(F.col("__ent").isNotNull())
        .distinct()
    )
    missing = (
        toks.join(ent, F.lower(F.col("tok")) == F.col("__ent"), "left_anti")
        .groupBy("rowid")
        .agg(F.min("pos").alias("__miss_pos"))  # 0-based first unknown
    )
    out = vetted.join(missing, "rowid", "left")
    first_empty_wins = (empty_pos > 0) & (
        F.col("__miss_pos").isNull() | (empty_pos - 1 < F.col("__miss_pos"))
    )
    decision = (
        F.when(~is_candidate, F.lit("not_candidate"))
        .when(first_empty_wins, F.lit("empty_segments"))
        .when(F.col("__miss_pos").isNotNull(), F.lit("skipped_missing"))
        .otherwise(F.lit("accepted"))
    )
    status_out = (
        F.when(decision == "accepted", F.lit("1"))
        .when(decision == "empty_segments", F.lit("empty segments"))
        .otherwise(F.col("status"))
    )
    return out.withColumn("decision", decision).withColumn(
        "status_out", status_out
    ).drop("__miss_pos")
