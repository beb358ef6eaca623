"""Correctness-gate queries for the dictionary/ER pipeline steps
(01 merges+retention, 06 contributors, 10 genres, 11 enrichment,
18 MBIDs, 23 synthetic retirement).

Same contract as ``pipelinesteps``: deterministic alib synthesis mirrored
in the oracle SQL; variants chosen so each oracle states the expected
output per variant directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.pipeline import (
    parse_genre_norms,
    step01_merge_and_retain,
    step06_contributors,
    step10_genres,
    step11_genre_enrich,
    step18_mbids,
    step23_retire_synthetic,
    synthetic_mbid,
)
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

D = "\\\\"


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# step 01: merges + fan-out + moves + retention
# --------------------------------------------------------------------------
# k = o_orderkey. involvedpeople k%4: 0 'Alice, MainArtist',
# 1 'Bob, ComposerLyricist, Mixer', 2 two entries (Alice mainartist,
# Cara 'Composer Lyricist'), 3 NULL. albumartist k%3: 'alice'/'Zed'/NULL.
# composer k%2: 'Bob'/NULL. author k%5==0 → 'Auth <k>'. unsyncedlyrics
# k%2==0 → 'Words w<k>'. itunesadvisory k%3: '1'/'2'/NULL; explicit
# k%5==0 → 'E'. badcol not in keep → NULL.

_S01_SQL = r"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CAST(o_orderkey % 4 AS INT) AS iv,
         CAST(o_orderkey % 3 AS INT) AS av,
         CAST(o_orderkey % 2 AS INT) AS cv,
         CAST(o_orderkey % 5 AS INT) AS sv,
         o_orderkey AS k
  FROM orders
), pieces AS (
  SELECT __path, iv, av, cv, sv, k,
         CASE av WHEN 0 THEN 'alice' WHEN 1 THEN 'Zed' ELSE NULL END AS aa0,
         CASE WHEN cv = 0 THEN 'Bob' ELSE NULL END AS c0,
         CASE WHEN sv = 0 THEN 'Auth ' || k ELSE NULL END AS auth,
         CASE WHEN iv IN (0, 2) THEN 'Alice' ELSE NULL END AS p_aa,
         CASE iv WHEN 1 THEN 'Bob' WHEN 2 THEN 'Cara' ELSE NULL END AS p_cl
  FROM alib
)
SELECT __path,
       NULLIF(array_to_string(list_filter([
         aa0,
         CASE WHEN p_aa IS NOT NULL
                AND (aa0 IS NULL OR lower(aa0) <> lower(p_aa))
              THEN p_aa END
       ], x -> x IS NOT NULL), '\\'), '') AS albumartist,
       NULLIF(array_to_string(list_filter([
         c0,
         auth,
         CASE WHEN p_cl IS NOT NULL
                AND (c0 IS NULL OR lower(c0) <> lower(p_cl))
              THEN p_cl END
       ], x -> x IS NOT NULL), '\\'), '') AS composer,
       p_cl AS lyricist,
       CASE WHEN k % 2 = 0 THEN 'Words w' || k ELSE NULL END AS lyrics,
       CAST(NULL AS VARCHAR) AS unsyncedlyrics,
       CASE CAST(k % 3 AS INT)
         WHEN 0 THEN '1' WHEN 1 THEN NULL
         ELSE CASE WHEN sv = 0 THEN 'E' ELSE NULL END END AS explicit,
       CAST(NULL AS VARCHAR) AS badcol,
       CAST(NULL AS VARCHAR) AS author
FROM pieces
"""

_S01_KEEP = (
    "albumartist",
    "composer",
    "lyricist",
    "lyrics",
    "explicit",
    "involvedpeople",
    "itunesadvisory",
    "unsyncedlyrics",
)


@q("pl_step01_merges", _S01_SQL)
def pl_step01_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 01 (01-null-unauthorised-tags.py:414-558): caseless-dedup tag
    merges, involvedpeople role fan-out, unsyncedlyrics move,
    itunesadvisory→explicit, retention-gate NULLing — all in one
    map-only select."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    iv, av, cv, sv = (
        (k % 4).cast("int"),
        (k % 3).cast("int"),
        (k % 2).cast("int"),
        (k % 5).cast("int"),
    )
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(iv == 0, F.lit("Alice, MainArtist"))
        .when(iv == 1, F.lit("Bob, ComposerLyricist, Mixer"))
        .when(iv == 2, F.lit(f"Alice, MainArtist{D}Cara, Composer Lyricist"))
        .otherwise(F.lit(None).cast("string"))
        .alias("involvedpeople"),
        F.when(av == 0, F.lit("alice"))
        .when(av == 1, F.lit("Zed"))
        .otherwise(F.lit(None).cast("string"))
        .alias("albumartist"),
        F.when(cv == 0, F.lit("Bob")).otherwise(F.lit(None).cast("string")).alias(
            "composer"
        ),
        F.when(sv == 0, F.concat(F.lit("Auth "), k))
        .otherwise(F.lit(None).cast("string"))
        .alias("author"),
        F.lit(None).cast("string").alias("lyrics"),
        F.when(cv == 0, F.concat(F.lit("Words w"), k))
        .otherwise(F.lit(None).cast("string"))
        .alias("unsyncedlyrics"),
        F.when((k % 3).cast("int") == 0, F.lit("1"))
        .when((k % 3).cast("int") == 1, F.lit("2"))
        .otherwise(F.lit(None).cast("string"))
        .alias("itunesadvisory"),
        F.when(sv == 0, F.lit("E")).otherwise(F.lit(None).cast("string")).alias(
            "explicit"
        ),
        F.lit("junk").alias("badcol"),
    )
    out = step01_merge_and_retain(alib, keep=_S01_KEEP)
    return out.select(
        "__path",
        "albumartist",
        "composer",
        "lyricist",
        "lyrics",
        "unsyncedlyrics",
        "explicit",
        "badcol",
        "author",
    )


# --------------------------------------------------------------------------
# step 06: contributor normalization (3-stage splitter)
# --------------------------------------------------------------------------

_S06_DICT = {
    "john smith": "John Smith",
    "jane doe": "Jane Doe",
    "20/20": "20/20",
    "simon": "Simon",
    "garfunkel": "Garfunkel",
    "fathers & sons": "Fathers & Sons",
}

_S06_SQL = r"""
WITH alib AS (
  SELECT 'p' || c_custkey AS __path, CAST(c_custkey % 10 AS INT) AS v
  FROM customer
)
SELECT __path,
       CASE v WHEN 0 THEN 'John Smith'
              WHEN 1 THEN 'John Smith' || '\\' || 'Jane Doe'
              WHEN 2 THEN 'Smith, Jr.'
              WHEN 3 THEN 'Alice' || '\\' || 'Bob'
              WHEN 4 THEN '20/20'
              WHEN 5 THEN 'Simon' || '\\' || 'Garfunkel'
              WHEN 6 THEN 'Fathers & Sons'
              WHEN 7 THEN 'ac-dc'
              WHEN 8 THEN 'X' || '\\' || 'Y'
              ELSE 'John Smith' END AS artist
FROM alib
"""


@q("pl_step06_contributors", _S06_SQL)
def pl_step06_contributors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 06 (06-normalize-contributors.py:438-527): the dictionary-
    guarded 3-stage splitter as an Arrow-batched pandas UDF (dictionary
    broadcast in the closure). Variants cover: dict hit, primary ';'
    split, Jr-comma guard, comma split, slash-preserving dict hit
    ('20/20'), guarded '&' split, whole-entity '&' preservation,
    hyphen preservation, slash fallback, caseless dedup."""
    c = load_table(spark, sf_dir, "customer")
    v = (F.col("c_custkey") % 10).cast("int")
    alib = c.select(
        F.concat(F.lit("p"), "c_custkey").alias("__path"),
        F.when(v == 0, F.lit("john smith"))
        .when(v == 1, F.lit("John Smith; jane doe"))
        .when(v == 2, F.lit("smith, jr."))
        .when(v == 3, F.lit("alice, bob"))
        .when(v == 4, F.lit("20/20"))
        .when(v == 5, F.lit("simon & garfunkel"))
        .when(v == 6, F.lit("fathers & sons"))
        .when(v == 7, F.lit("ac-dc"))
        .when(v == 8, F.lit("x/y"))
        .otherwise(F.lit(f"John Smith{D}john smith"))
        .alias("artist"),
    )
    out = step06_contributors(alib, _S06_DICT, cols=("artist",))
    return out.select("__path", "artist")


# --------------------------------------------------------------------------
# step 10: genre normalization
# --------------------------------------------------------------------------

_S10_VETTED = ["Pop/Rock", "Singer/Songwriter", "Heavy Metal", "Jazz"]

_S10_SQL = r"""
WITH alib AS (
  SELECT 'g' || p_partkey AS __path, CAST(p_partkey % 6 AS INT) AS v
  FROM part
)
SELECT __path,
       CASE v WHEN 0 THEN 'Pop/Rock'
              WHEN 1 THEN 'Pop/Rock' || '\\' || 'Singer/Songwriter'
              WHEN 2 THEN 'Pop/Rock' || '\\' || 'Heavy Metal'
              WHEN 3 THEN NULL
              WHEN 4 THEN 'Jazz'
              ELSE 'Pop/Rock' END AS genre
FROM alib
"""


@q("pl_step10_genres", _S10_SQL)
def pl_step10_genres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 10 (10-normalize-genres-and-styles.py:62-93): hardcoded
    replacement fan-out + vetted-vocabulary validation with canonical
    casing; unvetted tokens drop. Zero shuffle (two map literals)."""
    p = load_table(spark, sf_dir, "part")
    v = (F.col("p_partkey") % 6).cast("int")
    alib = p.select(
        F.concat(F.lit("g"), "p_partkey").alias("__path"),
        F.when(v == 0, F.lit("rock"))
        .when(v == 1, F.lit("acoustic pop"))
        .when(v == 2, F.lit(f"Rock{D}metal"))
        .when(v == 3, F.lit("Unknown Genre"))
        .when(v == 4, F.lit("JAZZ"))
        .otherwise(F.lit(f"pop/rock{D}rock"))
        .alias("genre"),
    )
    out = step10_genres(alib, _S10_VETTED, cols=("genre",))
    return out.select("__path", "genre")


# --------------------------------------------------------------------------
# step 11: genre enrichment from artist genre norms
# --------------------------------------------------------------------------

_S11_SQL = r"""
WITH dim AS (
  SELECT 'amb-' || n_nationkey AS mbid,
         CASE WHEN n_nationkey % 3 = 0 THEN 'Rock' || '\\' || 'Pop'
              ELSE '' END AS ref_genre,
         CASE WHEN n_nationkey % 2 = 0 THEN 'St1' ELSE '' END AS ref_style
  FROM nation
), alib AS (
  SELECT 'p' || o_orderkey AS __path,
         'amb-' || CAST(o_orderkey % 30 AS VARCHAR) AS mbid,
         CASE WHEN o_orderkey % 2 = 0 THEN 'Existing' ELSE NULL END AS genre,
         'S0' AS style
  FROM orders
)
SELECT a.__path,
       CASE WHEN a.genre IS NULL THEN NULLIF(COALESCE(d.ref_genre, ''), '')
            WHEN d.ref_genre IS NULL OR d.ref_genre = '' THEN a.genre
            ELSE a.genre || '\\' || d.ref_genre END AS genre,
       CASE WHEN d.ref_style IS NULL OR d.ref_style = '' THEN a.style
            ELSE a.style || '\\' || d.ref_style END AS style
FROM alib a LEFT JOIN dim d USING (mbid)
"""


@q("pl_step11_enrich", _S11_SQL)
def pl_step11_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 11 (11-enrich-genres-using-artist-genre-norms.py:236-313):
    JSON-array reference parse + broadcast join on artist MBID + ordered
    concat merge (no dedup — step 17 owns that)."""
    n = load_table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ref = n.select(
        F.concat(F.lit("amb-"), nk).alias("mbid"),
        F.when(nk % 3 == 0, F.lit('["Rock","Pop"]'))
        .when(nk % 3 == 1, F.lit("notjson"))
        .otherwise(F.lit(None).cast("string"))
        .alias("allmusic_genres_json"),
        F.when(nk % 2 == 0, F.lit('["St1"]'))
        .otherwise(F.lit(None).cast("string"))
        .alias("allmusic_styles_json"),
    )
    norms = parse_genre_norms(ref)
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.concat(F.lit("amb-"), (k % 30).cast("string")).alias(
            "musicbrainz_artistid"
        ),
        F.when(k % 2 == 0, F.lit("Existing"))
        .otherwise(F.lit(None).cast("string"))
        .alias("genre"),
        F.lit("S0").alias("style"),
    )
    out = step11_genre_enrich(alib, norms)
    return out.select("__path", "genre", "style")


# --------------------------------------------------------------------------
# step 18: MBID population
# --------------------------------------------------------------------------
# Synthetic-ID SQL macro shared by the 18/23 oracles.
def _syn(col: str = "h") -> str:
    return (
        f"substr({col},1,8) || '-' || substr({col},9,4) || '-3' || "
        f"substr({col},14,3) || '-8' || substr({col},18,3) || '-' || "
        f"substr({col},21,12)"
    )


_SYN = _syn()

_S18_SQL = rf"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CAST(o_orderkey % 4 AS INT) AS v,
         CAST(o_orderkey % 50 AS INT) AS r,
         CAST(o_orderkey % 10 AS INT) AS ns,
         CAST(o_orderkey % 2 AS INT) AS cx,
         o_orderkey AS k
  FROM orders
), syn AS (
  SELECT *,
         md5('tagminder.synthetic.mbid.v1:' || 'unknown k' || k) AS h
  FROM alib
)
SELECT __path,
       CASE v
         WHEN 0 THEN 'mb-' || r
         WHEN 1 THEN {_SYN}
         WHEN 2 THEN CASE WHEN ns < 5 AND cx = 0 THEN 'dec-' || ns ELSE NULL END
         ELSE 'mb-' || r || '\\' || {_SYN} END AS musicbrainz_artistid
FROM syn
"""


@q("pl_step18_mbids", _S18_SQL)
def pl_step18_mbids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 18 (18-populate-musicbrainz-ids.py:142-1000) in batch mode:
    unique names resolve via the broadcast dimension, namesakes only via
    the user-decisions table (keyed by albumartist context), unknown
    names get deterministic synthetic IDs; token order preserved by
    position through posexplode + ordered re-collect (one shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = (k % 4).cast("int")
    r = (k % 50).cast("int")
    ns = (k % 10).cast("int")
    cx = (k % 2).cast("int")
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        F.when(v == 0, F.concat(F.lit("Resolved "), r))
        .when(v == 1, F.concat(F.lit("Unknown K"), k))
        .when(v == 2, F.concat(F.lit("Namesake "), ns))
        .otherwise(
            F.concat(F.lit("Resolved "), r, F.lit(D), F.lit("Unknown K"), k)
        )
        .alias("artist"),
        F.when(cx == 0, F.lit("Ctx A")).otherwise(F.lit("Ctx B")).alias(
            "albumartist"
        ),
        F.lit(None).cast("string").alias("musicbrainz_artistid"),
    )
    spark_range = spark.range(50)
    dis = spark_range.select(
        F.concat(F.lit("Resolved "), F.col("id")).alias("norm_name"),
        F.concat(F.lit("mb-"), F.col("id")).alias("mbid"),
    )
    namesakes = spark.range(10).select(
        F.concat(F.lit("Namesake "), F.col("id")).alias("norm_name")
    )
    decisions = spark.range(5).select(
        F.concat(F.lit("Namesake "), F.col("id")).alias("norm_name"),
        F.lit("Ctx A").alias("context"),
        F.concat(F.lit("dec-"), F.col("id")).alias("mbid"),
    )
    out = step18_mbids(alib, dis, namesakes, decisions)
    return out.select("__path", "musicbrainz_artistid")


# --------------------------------------------------------------------------
# step 23: retire synthetic MBIDs
# --------------------------------------------------------------------------
# v=k%3: 0 name now learned, synthetic id → real; 1 real id → untouched;
# 2 unknown name, synthetic id → stays synthetic.

_S23_SQL = rf"""
WITH alib AS (
  SELECT 'p' || o_orderkey AS __path,
         CAST(o_orderkey % 3 AS INT) AS v,
         CAST(o_orderkey % 30 AS INT) AS r,
         o_orderkey AS k
  FROM orders
), syn AS (
  SELECT *,
         md5('tagminder.synthetic.mbid.v1:' || 'gone ' || k) AS hg
  FROM alib
)
SELECT __path,
       CASE v
         WHEN 0 THEN 'real-' || r
         WHEN 1 THEN 'keep-v4-' || k
         ELSE {_syn("hg")} END AS musicbrainz_artistid
FROM syn
"""


@q("pl_step23_retire", _S23_SQL)
def pl_step23_retire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step 23 (23-retire-synthetic-mbids.py:117-470): a slot is
    synthetic iff it equals the deterministic synthetic ID of its
    positionally-aligned name token; synthetic slots whose name the
    dimension has since learned swap to the real MBID, everything else
    passes through."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v = (k % 3).cast("int")
    r = (k % 30).cast("int")
    name = (
        F.when(v == 0, F.concat(F.lit("Learned "), r))
        .when(v == 1, F.concat(F.lit("Learned "), r))
        .otherwise(F.concat(F.lit("Gone "), k))
    )
    alib = o.select(
        F.concat(F.lit("p"), k).alias("__path"),
        name.alias("artist"),
        F.when(v == 1, F.concat(F.lit("keep-v4-"), k))
        .otherwise(synthetic_mbid(name))
        .alias("musicbrainz_artistid"),
    )
    dis = spark.range(30).select(
        F.concat(F.lit("Learned "), F.col("id")).alias("norm_name"),
        F.concat(F.lit("real-"), F.col("id")).alias("mbid"),
    )
    out = step23_retire_synthetic(alib, dis)
    return out.select("__path", "musicbrainz_artistid")
