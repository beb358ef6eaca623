"""Library-insights report queries, third tranche (round 8) — the
residual 92-library-insights.py card variants VERDICT r7 #5 listed:
the release-year timeline, the ReplayGain extreme/dynamics rankings
(loudest, quietest, DR-meter most/least dynamic plus the PLR-proxy
charts for the missing-DR subset), the genre-scoped role spotlights
(classical/jazz album artists, classical conductors), and the
"most instances" most-performed-compositions card.

Pattern (as in reports_insights/reports_insights2): synthesize the
alib-shaped input deterministically from the star schema, mirrored
exactly in the oracle SQL, and return the aggregate the reference card
renders.  Every query is one or two hash aggregates plus a rank window
over an ALBUM-grain frame (hundreds of rows after the first aggregate
— the window input is tiny by construction, never the track grain), so
each plan survives a 100× scale-up unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

D = "\\\\"  # the reference's multi-value tag delimiter (two backslashes)


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def _split_toks(col):
    return F.filter(
        F.transform(F.split(col, r"\\\\"), lambda x: F.trim(x)),
        lambda x: x != "",
    )


def _ranked_topn(df: DataFrame, order_cols, n: int = 20) -> DataFrame:
    """Global top-N the scale-correct way: ``orderBy().limit(n)`` runs
    as a distributed TakeOrdered (map-side partial top-k per task, no
    single-partition shuffle of the full frame — what a global
    ``row_number`` window would do); the rank column is then attached
    by a window over the ALREADY-REDUCED n rows, which is bounded by
    construction."""
    top = df.orderBy(*order_cols).limit(n)
    w = Window.orderBy(*order_cols)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# --------------------------------------------------------------------------
# Albums by year / decade — the "time" card (92-library-insights.py:
# 1760-1833: Bar by decade + Scatter by year over df_album)
# --------------------------------------------------------------------------

_TIMELINE_SQL = r"""
WITH alib AS (
  SELECT DISTINCT
         'alb' || CAST(l_orderkey % 400 AS VARCHAR) AS album_root,
         CASE WHEN (l_orderkey % 400) % 21 = 0 THEN NULL
              ELSE 1950 + ((l_orderkey % 400) * 13) % 70 END AS album_year
  FROM lineitem
)
SELECT album_year,
       CAST((album_year // 10) * 10 AS BIGINT) AS decade,
       CAST(COUNT(*) AS BIGINT) AS albums
FROM alib WHERE album_year IS NOT NULL
GROUP BY album_year
"""


@q("r92_albums_timeline", _TIMELINE_SQL)
def r92_albums_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release timeline (92-library-insights.py:1760-1833): distinct
    albums counted per release year, decade attached — the year grain
    feeds the scatter, the decade rollup the bar subplot; one distinct
    + one aggregate, both on the album id."""
    li = load_table(spark, sf_dir, "lineitem")
    aid = F.col("l_orderkey") % 400
    alib = li.select(
        F.concat(F.lit("alb"), aid.cast("string")).alias("album_root"),
        F.when(aid % 21 == 0, F.lit(None).cast("long"))
        .otherwise(F.lit(1950) + (aid * 13) % 70)
        .alias("album_year"),
    ).distinct()
    return (
        alib.filter(F.col("album_year").isNotNull())
        .groupBy("album_year")
        .agg(F.count(F.lit(1)).alias("albums"))
        .select(
            "album_year",
            (F.floor(F.col("album_year") / 10) * 10).alias("decade"),
            "albums",
        )
    )


# --------------------------------------------------------------------------
# ReplayGain extremes — loudest / quietest albums by album gain
# (92-library-insights.py:1422-1490: sort rg_album_gain_db asc → loudest,
# desc → quietest, head(top))
# --------------------------------------------------------------------------

_RG_EXTREMES_SQL = r"""
WITH tracks AS (
  SELECT 'alb' || CAST(l_orderkey % 250 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 23 = 0 THEN NULL
              ELSE -12.0 + ((l_orderkey * 31 + l_partkey) % 1700) / 100.0
              END AS rg_track_gain
  FROM lineitem
), albums AS (
  SELECT album_root,
         CAST(ROUND(AVG(rg_track_gain), 2) AS DOUBLE) AS rg_album_gain_db
  FROM tracks WHERE rg_track_gain IS NOT NULL
  GROUP BY album_root
), ranked AS (
  SELECT album_root, rg_album_gain_db,
         ROW_NUMBER() OVER (ORDER BY rg_album_gain_db ASC, album_root ASC)
           AS rn_loud,
         ROW_NUMBER() OVER (ORDER BY rg_album_gain_db DESC, album_root ASC)
           AS rn_quiet
  FROM albums
)
SELECT 'loudest' AS side, CAST(rn_loud AS BIGINT) AS rank,
       album_root, rg_album_gain_db
FROM ranked WHERE rn_loud <= 20
UNION ALL
SELECT 'quietest' AS side, CAST(rn_quiet AS BIGINT) AS rank,
       album_root, rg_album_gain_db
FROM ranked WHERE rn_quiet <= 20
"""


@q("r92_rg_extremes", _RG_EXTREMES_SQL)
def r92_rg_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudest/quietest albums (92-library-insights.py:1422-1490): the
    most negative album gain means the loudest master (ReplayGain
    attenuates it hardest).  Track gains aggregate to album grain,
    then each side is a distributed TakeOrdered top-20
    (:func:`_ranked_topn`) — at library scale the album grain can be
    millions of rows, which a global rank window would funnel through
    ONE partition; orderBy+limit keeps the top-k map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    tracks = li.select(
        F.concat(F.lit("alb"), (ok % 250).cast("string")).alias("album_root"),
        F.when(ok % 23 == 0, F.lit(None).cast("double"))
        .otherwise(F.lit(-12.0) + ((ok * 31 + pk) % 1700) / 100.0)
        .alias("rg_track_gain"),
    )
    albums = (
        tracks.filter(F.col("rg_track_gain").isNotNull())
        .groupBy("album_root")
        .agg(F.round(F.avg("rg_track_gain"), 2).alias("rg_album_gain_db"))
    )
    loud = _ranked_topn(
        albums, [F.col("rg_album_gain_db").asc(), F.col("album_root").asc()]
    ).select(
        F.lit("loudest").alias("side"), "rank",
        "album_root", "rg_album_gain_db",
    )
    quiet = _ranked_topn(
        albums, [F.col("rg_album_gain_db").desc(), F.col("album_root").asc()]
    ).select(
        F.lit("quietest").alias("side"), "rank",
        "album_root", "rg_album_gain_db",
    )
    return loud.unionByName(quiet)


# --------------------------------------------------------------------------
# ReplayGain dynamics — most/least dynamic, DR meter vs PLR proxy
# (92-library-insights.py:1414-1700: albums WITH album_dr rank by the DR
# Meter score; the missing-DR subset gets separate PLR-proxy charts —
# peak dBFS minus integrated loudness)
# --------------------------------------------------------------------------

_RG_DYNAMICS_SQL = r"""
WITH tracks AS (
  SELECT 'alb' || CAST(l_orderkey % 250 AS VARCHAR) AS album_root,
         CASE WHEN (l_orderkey % 250) % 3 = 0
              THEN 5 + (l_orderkey % 250) % 12 END AS album_dr,
         -(((l_orderkey * 17 + l_partkey) % 900) / 100.0) AS peak_dbfs,
         -18.0 + ((l_orderkey * 11) % 1000) / 100.0 AS lufs
  FROM lineitem
), albums AS (
  SELECT album_root,
         MAX(album_dr) AS album_dr,
         CAST(ROUND(AVG(peak_dbfs) - AVG(lufs), 2) AS DOUBLE) AS plr
  FROM tracks GROUP BY album_root
), scored AS (
  SELECT album_root,
         CASE WHEN album_dr IS NOT NULL THEN 'dr' ELSE 'plr' END AS meter,
         CASE WHEN album_dr IS NOT NULL
              THEN CAST(album_dr AS DOUBLE) ELSE plr END AS dyn_value
  FROM albums
), ranked AS (
  SELECT meter, album_root, dyn_value,
         ROW_NUMBER() OVER (PARTITION BY meter
                            ORDER BY dyn_value DESC, album_root ASC)
           AS rn_most,
         ROW_NUMBER() OVER (PARTITION BY meter
                            ORDER BY dyn_value ASC, album_root ASC)
           AS rn_least
  FROM scored
)
SELECT meter, 'most_dynamic' AS side, CAST(rn_most AS BIGINT) AS rank,
       album_root, dyn_value
FROM ranked WHERE rn_most <= 20
UNION ALL
SELECT meter, 'least_dynamic' AS side, CAST(rn_least AS BIGINT) AS rank,
       album_root, dyn_value
FROM ranked WHERE rn_least <= 20
"""


@q("r92_rg_dynamics", _RG_DYNAMICS_SQL)
def r92_rg_dynamics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most/least dynamic albums (92-library-insights.py:1414-1700):
    albums carrying an ``album_dr`` tag rank by the DR Meter score;
    albums WITHOUT it rank by the PLR proxy (peak dBFS − integrated
    LUFS — more headroom above loudness = more dynamic), reproducing
    the reference's DR-only charts plus its separate missing-DR PLR
    charts.  Album grain first (~250 rows), then per-meter rank
    windows over the tiny aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    aid = ok % 250
    tracks = li.select(
        F.concat(F.lit("alb"), aid.cast("string")).alias("album_root"),
        F.when(aid % 3 == 0, F.lit(5) + aid % 12).alias("album_dr"),
        (-(((ok * 17 + pk) % 900) / 100.0)).alias("peak_dbfs"),
        (F.lit(-18.0) + ((ok * 11) % 1000) / 100.0).alias("lufs"),
    )
    albums = tracks.groupBy("album_root").agg(
        F.max("album_dr").alias("album_dr"),
        F.round(F.avg("peak_dbfs") - F.avg("lufs"), 2).alias("plr"),
    )
    scored = albums.select(
        "album_root",
        F.when(F.col("album_dr").isNotNull(), F.lit("dr"))
        .otherwise(F.lit("plr"))
        .alias("meter"),
        F.when(
            F.col("album_dr").isNotNull(), F.col("album_dr").cast("double")
        )
        .otherwise(F.col("plr"))
        .alias("dyn_value"),
    )
    # per-meter global top-20: four TakeOrdered branches instead of a
    # 2-partition rank window (which would hold half the album grain
    # per task at library scale)
    out = None
    for meter in ("dr", "plr"):
        sub = scored.filter(F.col("meter") == meter)
        for side, order in (
            ("most_dynamic",
             [F.col("dyn_value").desc(), F.col("album_root").asc()]),
            ("least_dynamic",
             [F.col("dyn_value").asc(), F.col("album_root").asc()]),
        ):
            piece = _ranked_topn(sub, order).select(
                "meter", F.lit(side).alias("side"), "rank",
                "album_root", "dyn_value",
            )
            out = piece if out is None else out.unionByName(piece)
    return out


# --------------------------------------------------------------------------
# Genre-scoped role spotlights — classical album artists, jazz artists,
# classical conductors (92-library-insights.py:3455-3505 + 3476-3489):
# distinct (album, token) pairs scoped by genre, album counts, top-20
# --------------------------------------------------------------------------

_SPOTLIGHT_ROLES_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 350 AS VARCHAR) AS album_root,
         ['Classical', 'Classical Crossover', 'Opera', 'Rock', 'Jazz',
          'Indian Classical', 'Symphony', 'Pop', NULL, 'Jazz Fusion']
           [l_partkey % 10 + 1] AS genre,
         CASE WHEN l_orderkey % 17 = 0 THEN NULL
              ELSE 'AA ' || CAST(l_orderkey % 60 AS VARCHAR)
                || CASE WHEN l_orderkey % 6 = 0
                        THEN chr(92) || chr(92) || 'AA '
                             || CAST(l_partkey % 60 AS VARCHAR)
                        ELSE '' END END AS albumartist,
         CASE WHEN l_partkey % 5 = 0
              THEN 'Cond ' || CAST(l_suppkey % 30 AS VARCHAR) END
           AS conductor
  FROM lineitem
), scopes AS (
  SELECT album_root,
         lower(genre) IN ('classical', 'classical crossover', 'opera',
                          'indian classical', 'symphony') AS is_classical,
         lower(genre) LIKE '%jazz%' AS is_jazz,
         albumartist, conductor
  FROM alib
), pairs AS (
  SELECT DISTINCT 'classical_aa' AS scope, album_root,
         trim(tok) AS tok
  FROM scopes, unnest(string_split(albumartist, chr(92) || chr(92)))
       AS t(tok)
  WHERE is_classical AND albumartist IS NOT NULL AND trim(tok) <> ''
  UNION ALL
  SELECT DISTINCT 'jazz_aa' AS scope, album_root, trim(tok) AS tok
  FROM scopes, unnest(string_split(albumartist, chr(92) || chr(92)))
       AS t(tok)
  WHERE is_jazz AND albumartist IS NOT NULL AND trim(tok) <> ''
  UNION ALL
  SELECT DISTINCT 'classical_conductor' AS scope, album_root,
         conductor AS tok
  FROM scopes WHERE is_classical AND conductor IS NOT NULL
), counts AS (
  SELECT scope, tok, COUNT(*) AS albums,
         ROW_NUMBER() OVER (PARTITION BY scope
                            ORDER BY COUNT(*) DESC, tok ASC) AS rn
  FROM pairs GROUP BY scope, tok
)
SELECT scope, CAST(rn AS BIGINT) AS rank, tok,
       CAST(albums AS BIGINT) AS albums
FROM counts WHERE rn <= 20
"""


@q("r92_spotlight_roles", _SPOTLIGHT_ROLES_SQL)
def r92_spotlight_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genre-scoped role spotlights (92-library-insights.py:3455-3505):
    top classical album artists (performers), top jazz artists, and
    top classical conductors — each the distinct (album, token) pair
    count within the genre scope, top-20 deterministic.  One long
    frame, three scopes; the rank window runs over per-scope token
    counts (small by construction)."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    gnames = [
        "Classical", "Classical Crossover", "Opera", "Rock", "Jazz",
        "Indian Classical", "Symphony", "Pop", None, "Jazz Fusion",
    ]
    gexpr = F.lit(None).cast("string")
    for i, g in enumerate(gnames):
        if g is not None:
            gexpr = F.when(pk % 10 == i, F.lit(g)).otherwise(gexpr)
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 350).cast("string")).alias("album_root"),
        gexpr.alias("genre"),
        F.when(ok % 17 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("AA "), (ok % 60).cast("string"),
                F.when(
                    ok % 6 == 0,
                    F.concat(F.lit(D + "AA "), (pk % 60).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("albumartist"),
        F.when(
            pk % 5 == 0,
            F.concat(F.lit("Cond "), (sk % 30).cast("string")),
        ).alias("conductor"),
    )
    low = F.lower(F.col("genre"))
    scopes = alib.select(
        "album_root",
        low.isin(
            "classical", "classical crossover", "opera",
            "indian classical", "symphony",
        ).alias("is_classical"),
        low.contains("jazz").alias("is_jazz"),
        "albumartist",
        "conductor",
    )

    def aa_pairs(scope: str, flag: str) -> DataFrame:
        return (
            scopes.filter(F.col(flag) & F.col("albumartist").isNotNull())
            .select(
                F.lit(scope).alias("scope"),
                "album_root",
                F.explode(_split_toks(F.col("albumartist"))).alias("tok"),
            )
            .distinct()
        )

    cond_pairs = (
        scopes.filter(F.col("is_classical") & F.col("conductor").isNotNull())
        .select(
            F.lit("classical_conductor").alias("scope"),
            "album_root",
            F.col("conductor").alias("tok"),
        )
        .distinct()
    )
    pairs = (
        aa_pairs("classical_aa", "is_classical")
        .unionByName(aa_pairs("jazz_aa", "is_jazz"))
        .unionByName(cond_pairs)
    )
    counts = pairs.groupBy("scope", "tok").agg(
        F.count(F.lit(1)).alias("albums")
    )
    # per-scope TakeOrdered top-20 (3 branches) — a scope-partitioned
    # rank window would hold a whole scope's token grain in one task
    out = None
    for scope in ("classical_aa", "jazz_aa", "classical_conductor"):
        piece = _ranked_topn(
            counts.filter(F.col("scope") == scope),
            [F.col("albums").desc(), F.col("tok").asc()],
        ).select(
            "scope", "rank", "tok",
            F.col("albums").cast("long").alias("albums"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


# --------------------------------------------------------------------------
# Most-performed compositions (92-library-insights.py:2874-2990 +
# 3390-3420): group by normalized (composer, title), rank by distinct
# performing artists, genre-scoped (classical / jazz / rock-pop)
# --------------------------------------------------------------------------

_MOST_INSTANCES_SQL = r"""
WITH alib AS (
  SELECT 'Title ' || CAST((l_orderkey * 3) % 120 AS VARCHAR) AS title,
         ['Classical', 'Opera', 'Rock', 'Jazz', 'Pop', 'Indie Folk',
          'Symphony', 'Metal', NULL, 'Jazz Fusion']
           [l_partkey % 10 + 1] AS genre,
         CASE WHEN l_orderkey % 13 = 0 THEN NULL
              ELSE 'Comp ' || CAST(l_partkey % 45 AS VARCHAR)
                || CASE WHEN l_orderkey % 4 = 0
                        THEN chr(92) || chr(92) || 'Comp '
                             || CAST(l_suppkey % 45 AS VARCHAR)
                        ELSE '' END END AS composer,
         'Artist ' || CAST(l_suppkey % 70 AS VARCHAR)
           || CASE WHEN l_orderkey % 5 = 0
                   THEN chr(92) || chr(92) || 'Artist '
                        || CAST(l_partkey % 70 AS VARCHAR)
                   ELSE '' END AS artist
  FROM lineitem
), scoped AS (
  SELECT CASE
           WHEN lower(genre) IN ('classical', 'opera', 'symphony')
             THEN 'classical'
           WHEN lower(genre) LIKE '%jazz%' THEN 'jazz'
           WHEN regexp_matches(lower(genre),
                '(rock|pop|metal|punk|indie|alternative|grunge|folk)')
             THEN 'rockpop'
         END AS scope,
         lower(trim(title)) AS title_key,
         array_to_string(list_sort(list_transform(
           list_filter(list_transform(
             string_split(composer, chr(92) || chr(92)),
             x -> trim(x)), x -> x <> ''),
           x -> lower(x))), ' / ') AS composer_key,
         artist
  FROM alib WHERE composer IS NOT NULL
), base AS (
  SELECT * FROM scoped
  WHERE scope IS NOT NULL AND composer_key <> ''
), tracks AS (
  SELECT scope, composer_key, title_key, COUNT(*) AS tracks
  FROM base GROUP BY 1, 2, 3
), artists AS (
  SELECT scope, composer_key, title_key,
         COUNT(DISTINCT trim(tok)) AS distinct_artists
  FROM base, unnest(string_split(artist, chr(92) || chr(92))) AS t(tok)
  WHERE trim(tok) <> ''
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT t.scope, t.composer_key, t.title_key, t.tracks,
         COALESCE(a.distinct_artists, 0) AS distinct_artists,
         ROW_NUMBER() OVER (
           PARTITION BY t.scope
           ORDER BY COALESCE(a.distinct_artists, 0) DESC, t.tracks DESC,
                    t.composer_key ASC, t.title_key ASC) AS rn
  FROM tracks t
  LEFT JOIN artists a
    ON t.scope = a.scope AND t.composer_key = a.composer_key
   AND t.title_key = a.title_key
)
SELECT scope, CAST(rn AS BIGINT) AS rank, composer_key, title_key,
       CAST(tracks AS BIGINT) AS tracks,
       CAST(distinct_artists AS BIGINT) AS distinct_artists
FROM ranked WHERE rn <= 20
"""


@q("r92_most_instances", _MOST_INSTANCES_SQL)
def r92_most_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-performed compositions (92-library-insights.py:2874-2990):
    normalize (composer, title) to a composition key — lowercased
    title, composer tokens lowercased/sorted/joined — then rank per
    genre scope by DISTINCT performing artists (tracks as tie-break):
    the "most covered" works.  Track grain collapses to composition
    grain in one aggregate; the explode for distinct artists happens
    before that same aggregate; the rank window sees only composition
    rows."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    gnames = [
        "Classical", "Opera", "Rock", "Jazz", "Pop", "Indie Folk",
        "Symphony", "Metal", None, "Jazz Fusion",
    ]
    gexpr = F.lit(None).cast("string")
    for i, g in enumerate(gnames):
        if g is not None:
            gexpr = F.when(pk % 10 == i, F.lit(g)).otherwise(gexpr)
    alib = li.select(
        F.concat(F.lit("Title "), ((ok * 3) % 120).cast("string")).alias(
            "title"
        ),
        gexpr.alias("genre"),
        F.when(ok % 13 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("Comp "), (pk % 45).cast("string"),
                F.when(
                    ok % 4 == 0,
                    F.concat(F.lit(D + "Comp "), (sk % 45).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("composer"),
        F.concat(
            F.lit("Artist "), (sk % 70).cast("string"),
            F.when(
                ok % 5 == 0,
                F.concat(F.lit(D + "Artist "), (pk % 70).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("artist"),
    )
    low = F.lower(F.col("genre"))
    scope = (
        F.when(low.isin("classical", "opera", "symphony"), F.lit("classical"))
        .when(low.contains("jazz"), F.lit("jazz"))
        .when(
            low.rlike("(rock|pop|metal|punk|indie|alternative|grunge|folk)"),
            F.lit("rockpop"),
        )
    )
    # two-phase select: the HOF lambdas must not see their own aliases
    # (Spark 4 select-alias shadowing)
    staged = alib.filter(F.col("composer").isNotNull()).select(
        scope.alias("scope"),
        F.lower(F.trim(F.col("title"))).alias("title_key"),
        F.array_join(
            F.array_sort(
                F.transform(_split_toks(F.col("composer")), F.lower)
            ),
            " / ",
        ).alias("composer_key"),
        _split_toks(F.col("artist")).alias("artist_toks"),
    )
    base = staged.filter(
        F.col("scope").isNotNull() & (F.col("composer_key") != "")
    )
    tracks = base.groupBy("scope", "composer_key", "title_key").agg(
        F.count(F.lit(1)).alias("tracks")
    )
    artists = (
        base.select(
            "scope", "composer_key", "title_key",
            F.explode("artist_toks").alias("tok"),
        )
        .groupBy("scope", "composer_key", "title_key")
        .agg(F.count_distinct("tok").alias("distinct_artists"))
    )
    joined = (
        tracks.join(artists, ["scope", "composer_key", "title_key"], "left")
        .select(
            "scope", "composer_key", "title_key", "tracks",
            F.coalesce(F.col("distinct_artists"), F.lit(0)).alias(
                "distinct_artists"
            ),
        )
    )
    order = [
        F.col("distinct_artists").desc(),
        F.col("tracks").desc(),
        F.col("composer_key").asc(),
        F.col("title_key").asc(),
    ]
    # per-scope TakeOrdered top-20 — same rationale as the role
    # spotlights: composition grain per scope is unbounded at library
    # scale, a scope-partitioned window is not
    out = None
    for scope in ("classical", "jazz", "rockpop"):
        piece = _ranked_topn(
            joined.filter(F.col("scope") == scope), order
        ).select(
            "scope", "rank", "composer_key", "title_key",
            F.col("tracks").cast("long").alias("tracks"),
            F.col("distinct_artists").cast("long").alias("distinct_artists"),
        )
        out = piece if out is None else out.unionByName(piece)
    return out


# --------------------------------------------------------------------------
# KPI header tiles (92-library-insights.py:906-919): the six summary
# numbers the page leads with — tracks, album roots, distinct album
# artists, listening hours, storage GB, format count
# --------------------------------------------------------------------------

_KPI_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 350 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 17 = 0 THEN NULL
              ELSE 'AA ' || CAST(l_orderkey % 60 AS VARCHAR)
                || CASE WHEN l_orderkey % 6 = 0
                        THEN chr(92) || chr(92) || 'AA '
                             || CAST(l_partkey % 60 AS VARCHAR)
                        ELSE '' END END AS albumartist,
         60 + l_orderkey % 300 AS length_s,
         (1000 + l_partkey % 5000) * 1024 AS size_bytes,
         ['flac', 'mp3', 'm4a', 'ogg', 'wv', 'ape']
           [l_suppkey % 6 + 1] AS filetype
  FROM lineitem
), aa AS (
  SELECT DISTINCT trim(tok) AS tok
  FROM alib, unnest(string_split(albumartist, chr(92) || chr(92))) AS t(tok)
  WHERE albumartist IS NOT NULL AND trim(tok) <> ''
)
SELECT tile, CAST(value AS DOUBLE) AS value FROM (
  SELECT 'tracks' AS tile, CAST(COUNT(*) AS DOUBLE) AS value FROM alib
  UNION ALL
  SELECT 'albums', CAST(COUNT(DISTINCT album_root) AS DOUBLE) FROM alib
  UNION ALL
  SELECT 'album_artists', CAST(COUNT(*) AS DOUBLE) FROM aa
  UNION ALL
  SELECT 'listening_hours', ROUND(SUM(length_s) / 3600.0, 2) FROM alib
  UNION ALL
  SELECT 'storage_gb', ROUND(SUM(size_bytes) / 1073741824.0, 3) FROM alib
  UNION ALL
  SELECT 'formats', CAST(COUNT(DISTINCT filetype) AS DOUBLE) FROM alib
)
"""


@q("r92_kpi_tiles", _KPI_SQL)
def r92_kpi_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dashboard's KPI header tiles (92-library-insights.py:
    906-919): Tracks / Albums (folder roots) / Album Artists /
    Listening Time (hours) / Storage (GB) / Formats — six numbers from
    two hash aggregates (one over the track grain, one over the
    exploded-distinct albumartist tokens), unioned long.  No window, no
    sort bigger than six rows."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    ftypes = ["flac", "mp3", "m4a", "ogg", "wv", "ape"]
    fexpr = F.lit(None).cast("string")
    for i, t in enumerate(ftypes):
        fexpr = F.when(sk % 6 == i, F.lit(t)).otherwise(fexpr)
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 350).cast("string")).alias("album_root"),
        F.when(ok % 17 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("AA "), (ok % 60).cast("string"),
                F.when(
                    ok % 6 == 0,
                    F.concat(F.lit(D + "AA "), (pk % 60).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("albumartist"),
        (F.lit(60) + ok % 300).alias("length_s"),
        ((F.lit(1000) + pk % 5000) * 1024).alias("size_bytes"),
        fexpr.alias("filetype"),
    )
    base = alib.agg(
        F.count(F.lit(1)).cast("double").alias("tracks"),
        F.countDistinct("album_root").cast("double").alias("albums"),
        F.round(F.sum("length_s") / 3600.0, 2).alias("listening_hours"),
        F.round(F.sum("size_bytes") / 1073741824.0, 3).alias("storage_gb"),
        F.countDistinct("filetype").cast("double").alias("formats"),
    )
    n_aa = (
        alib.filter(F.col("albumartist").isNotNull())
        .select(F.explode(_split_toks(F.col("albumartist"))).alias("tok"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("album_artists"))
    )
    pieces = [
        base.select(F.lit(t).alias("tile"), F.col(t).alias("value"))
        for t in ("tracks", "albums", "listening_hours", "storage_gb",
                  "formats")
    ]
    pieces.append(
        n_aa.select(
            F.lit("album_artists").alias("tile"),
            F.col("album_artists").alias("value"),
        )
    )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Album count by albumartist (92-library-insights.py:1936-1964): the
# top-30 horizontal bar distinct from artist-depth (which adds year
# spread) — distinct (album, token) pairs, counts, deterministic rank
# --------------------------------------------------------------------------

_ALBUMS_PER_ARTIST_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 350 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 17 = 0 THEN NULL
              ELSE 'AA ' || CAST(l_orderkey % 60 AS VARCHAR)
                || CASE WHEN l_orderkey % 6 = 0
                        THEN chr(92) || chr(92) || 'AA '
                             || CAST(l_partkey % 60 AS VARCHAR)
                        ELSE '' END END AS albumartist
  FROM lineitem
), pairs AS (
  SELECT DISTINCT album_root, trim(tok) AS albumartist_tok
  FROM alib, unnest(string_split(albumartist, chr(92) || chr(92))) AS t(tok)
  WHERE albumartist IS NOT NULL AND trim(tok) <> ''
), counts AS (
  SELECT albumartist_tok, COUNT(*) AS albums FROM pairs GROUP BY 1
), ranked AS (
  SELECT albumartist_tok, albums,
         ROW_NUMBER() OVER (ORDER BY albums DESC, albumartist_tok ASC)
           AS rn
  FROM counts
)
SELECT CAST(rn AS BIGINT) AS rank, albumartist_tok,
       CAST(albums AS BIGINT) AS albums
FROM ranked WHERE rn <= 30
"""


@q("r92_albums_per_artist", _ALBUMS_PER_ARTIST_SQL)
def r92_albums_per_artist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Album count by albumartist (92-library-insights.py:1936-1964,
    the ``tm-insights-albums-per-artist`` bar): distinct (album root,
    albumartist token) pairs → album counts → top-30 with deterministic
    tie-break.  Runs as TakeOrdered over the already-aggregated token
    counts (the rank window sees only the reduced 30 rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk = F.col("l_orderkey"), F.col("l_partkey")
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 350).cast("string")).alias("album_root"),
        F.when(ok % 17 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("AA "), (ok % 60).cast("string"),
                F.when(
                    ok % 6 == 0,
                    F.concat(F.lit(D + "AA "), (pk % 60).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("albumartist"),
    )
    pairs = (
        alib.filter(F.col("albumartist").isNotNull())
        .select(
            "album_root",
            F.explode(_split_toks(F.col("albumartist"))).alias(
                "albumartist_tok"
            ),
        )
        .distinct()
    )
    counts = pairs.groupBy("albumartist_tok").agg(
        F.count(F.lit(1)).alias("albums")
    )
    return _ranked_topn(
        counts, [F.desc("albums"), F.asc("albumartist_tok")], 30
    ).select(
        "rank", "albumartist_tok", F.col("albums").cast("long").alias("albums")
    )


# --------------------------------------------------------------------------
# Jazz / Rock-Pop composer spotlights (92-library-insights.py:3424-3450):
# the two top-composer cards beside the classical one
# (r92_genre_spotlight) — track-level genre-token scoping, distinct
# (album, composer-token) pairs, top-25 per scope
# --------------------------------------------------------------------------

_GENRE_COMPOSERS_SQL = r"""
WITH alib AS (
  SELECT 'alb' || CAST(l_orderkey % 350 AS VARCHAR) AS album_root,
         CASE l_partkey % 10
           WHEN 0 THEN 'Classical'
           WHEN 1 THEN 'Jazz'
           WHEN 2 THEN 'Jazz Fusion' || chr(92) || chr(92) || 'Funk'
           WHEN 3 THEN 'Rock'
           WHEN 4 THEN 'Pop' || chr(92) || chr(92) || 'Indie'
           WHEN 5 THEN 'Acid Jazz'
           WHEN 6 THEN 'Metal'
           WHEN 7 THEN 'Folk' || chr(92) || chr(92) || 'Alternative'
           WHEN 8 THEN NULL
           ELSE 'Electronic' END AS genre,
         CASE WHEN l_orderkey % 13 = 0 THEN NULL
              ELSE 'Comp ' || CAST(l_partkey % 45 AS VARCHAR)
                || CASE WHEN l_orderkey % 4 = 0
                        THEN chr(92) || chr(92) || 'Comp '
                             || CAST(l_suppkey % 45 AS VARCHAR)
                        ELSE '' END END AS composer
  FROM lineitem
), toks AS (
  SELECT album_root, composer,
         list_transform(string_split(genre, chr(92) || chr(92)),
                        x -> lower(trim(x))) AS gtoks
  FROM alib WHERE genre IS NOT NULL AND composer IS NOT NULL
), scoped AS (
  SELECT 'jazz' AS scope, album_root, composer FROM toks
  WHERE len(list_filter(gtoks, x -> regexp_matches(x, '\bjazz\b'))) > 0
  UNION ALL
  SELECT 'rockpop', album_root, composer FROM toks
  WHERE len(list_filter(gtoks, x -> regexp_matches(x,
        '(rock|pop|metal|punk|indie|alternative|grunge|folk)'))) > 0
), pairs AS (
  SELECT DISTINCT scope, album_root, trim(tok) AS composer_tok
  FROM scoped, unnest(string_split(composer, chr(92) || chr(92))) AS t(tok)
  WHERE trim(tok) <> ''
), counts AS (
  SELECT scope, composer_tok, COUNT(*) AS albums,
         ROW_NUMBER() OVER (PARTITION BY scope
                            ORDER BY COUNT(*) DESC, composer_tok ASC) AS rn
  FROM pairs GROUP BY scope, composer_tok
)
SELECT scope, CAST(rn AS BIGINT) AS rank, composer_tok,
       CAST(albums AS BIGINT) AS albums
FROM counts WHERE rn <= 25
"""


@q("r92_genre_composers", _GENRE_COMPOSERS_SQL)
def r92_genre_composers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jazz and Rock/Pop top-composer spotlights
    (92-library-insights.py:3424-3450; the classical card is
    ``r92_genre_spotlight``): track-level genre-token scoping (word
    match ``\\bjazz\\b``; the rock/pop family regex), distinct
    (album, composer token) pairs per scope, album counts, top-25
    deterministic.  Two scopes in one long frame; the rank window runs
    over per-scope token counts — tiny after the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    gnames = [
        "Classical", "Jazz", "Jazz Fusion" + D + "Funk", "Rock",
        "Pop" + D + "Indie", "Acid Jazz", "Metal",
        "Folk" + D + "Alternative", None, "Electronic",
    ]
    gexpr = F.lit(None).cast("string")
    for i, g in enumerate(gnames):
        if g is not None:
            gexpr = F.when(pk % 10 == i, F.lit(g)).otherwise(gexpr)
    alib = li.select(
        F.concat(F.lit("alb"), (ok % 350).cast("string")).alias("album_root"),
        gexpr.alias("genre"),
        F.when(ok % 13 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("Comp "), (pk % 45).cast("string"),
                F.when(
                    ok % 4 == 0,
                    F.concat(F.lit(D + "Comp "), (sk % 45).cast("string")),
                ).otherwise(F.lit("")),
            )
        )
        .alias("composer"),
    )
    toks = alib.filter(
        F.col("genre").isNotNull() & F.col("composer").isNotNull()
    ).withColumn(
        "gtoks", F.transform(_split_toks(F.col("genre")), lambda x: F.lower(x))
    )

    def scoped(scope: str, pattern: str) -> DataFrame:
        return toks.filter(
            F.exists("gtoks", lambda x: x.rlike(pattern))
        ).select(
            F.lit(scope).alias("scope"), "album_root", "composer"
        )

    both = scoped("jazz", r"\bjazz\b").unionByName(
        scoped("rockpop", r"(rock|pop|metal|punk|indie|alternative|grunge|folk)")
    )
    pairs = (
        both.select(
            "scope", "album_root",
            F.explode(_split_toks(F.col("composer"))).alias("composer_tok"),
        )
        .distinct()
    )
    counts = pairs.groupBy("scope", "composer_tok").agg(
        F.count(F.lit(1)).alias("albums")
    )
    w = Window.partitionBy("scope").orderBy(
        F.desc("albums"), F.asc("composer_tok")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
        .select(
            "scope", F.col("rank").cast("long").alias("rank"),
            "composer_tok", F.col("albums").cast("long").alias("albums"),
        )
    )
