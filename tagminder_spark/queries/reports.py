"""Report/exception-table queries (SURVEY.md §2.4 A5-A18, §2.9 feature
edges, §2.3 J15 staged entity-resolution merge).

These mirror the reference's _INF_* report generators: read-only
aggregation passes emitting exception rows (the write side is a plain
overwrite sink, §1.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tagminder_spark.cache import scoped_persist
from tagminder_spark.functions.core import is_blank
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# 94: missing critical tags per album (A5)
# --------------------------------------------------------------------------

_R94_SQL = """
WITH alib AS (
  SELECT 'd' || CAST(l_orderkey % 100 AS VARCHAR) AS album_root,
         CASE WHEN l_orderkey % 5 = 0 THEN NULL
              ELSE 'T' || l_orderkey END AS title,
         CASE WHEN l_partkey % 7 = 0 THEN '   '
              ELSE 'A' || l_partkey END AS artist,
         CASE WHEN l_suppkey % 3 = 0 THEN ''
              ELSE 'Y' || l_suppkey END AS year
  FROM lineitem
)
SELECT album_root,
       COUNT(*) AS n_tracks,
       CAST(SUM(CASE WHEN title IS NULL OR trim(title) = '' OR trim(title) = '""'
                THEN 1 ELSE 0 END) AS BIGINT) AS missing_title,
       CAST(SUM(CASE WHEN artist IS NULL OR trim(artist) = '' OR trim(artist) = '""'
                THEN 1 ELSE 0 END) AS BIGINT) AS missing_artist,
       CAST(SUM(CASE WHEN year IS NULL OR trim(year) = '' OR trim(year) = '""'
                THEN 1 ELSE 0 END) AS BIGINT) AS missing_year
FROM alib GROUP BY album_root
HAVING missing_title > 0 OR missing_artist > 0 OR missing_year > 0
"""


@q("r94_missing_critical", _R94_SQL)
def r94_missing_critical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report 94 (scripts/reports/94-...py:170-200): per-album counts of
    rows missing each critical tag, exception-only wide rows — a single
    groupBy with one conditional sum per critical column."""
    li = load_table(spark, sf_dir, "lineitem")
    alib = li.select(
        F.concat(F.lit("d"), (F.col("l_orderkey") % 100).cast("string")).alias(
            "album_root"
        ),
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("T"), "l_orderkey"))
        .alias("title"),
        F.when(F.col("l_partkey") % 7 == 0, F.lit("   "))
        .otherwise(F.concat(F.lit("A"), "l_partkey"))
        .alias("artist"),
        F.when(F.col("l_suppkey") % 3 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("Y"), "l_suppkey"))
        .alias("year"),
    )
    out = alib.groupBy("album_root").agg(
        F.count(F.lit(1)).alias("n_tracks"),
        *[
            F.sum(is_blank(F.col(c)).cast("int")).alias(f"missing_{c}")
            for c in ("title", "artist", "year")
        ],
    )
    return out.filter(
        (F.col("missing_title") > 0)
        | (F.col("missing_artist") > 0)
        | (F.col("missing_year") > 0)
    )


# --------------------------------------------------------------------------
# 92: library-health card — keep-columns coverage + radar metric vector
# --------------------------------------------------------------------------

#: (column, missing-pattern key) — the alib fixture below injects a
#: distinct deterministic blank/NULL pattern per critical column
_HEALTH_CRITICAL = ("title", "artist", "albumartist", "year", "genre")
#: keep-columns list includes one column absent from alib ("rating") to
#: pin the reference's missing-column-is-0% rule
_HEALTH_KEEP = ("title", "artist", "albumartist", "year", "genre", "rating")

_HEALTH_ALIB_SQL = """
  SELECT 'd' || CAST(l_orderkey % 120 AS VARCHAR) AS root,
         CASE WHEN l_orderkey % 5 = 0 THEN NULL
              WHEN l_orderkey % 11 = 0 THEN '  '
              ELSE 'T' || CAST(l_orderkey AS VARCHAR) END AS title,
         CASE WHEN l_partkey % 7 = 0 THEN ''
              ELSE 'A' || CAST(l_partkey AS VARCHAR) END AS artist,
         CASE WHEN l_suppkey % 13 = 0 THEN NULL
              ELSE 'AA' || CAST(l_orderkey % 40 AS VARCHAR) END AS albumartist,
         CASE WHEN l_linenumber % 3 = 0 THEN ' '
              ELSE '19' || CAST(l_suppkey % 90 AS VARCHAR) END AS year,
         CASE WHEN l_orderkey % 17 = 0 THEN NULL
              ELSE 'G' || CAST(l_partkey % 25 AS VARCHAR) END AS genre,
         CASE WHEN l_orderkey % 9 = 0 THEN '1' ELSE '0' END AS compilation
  FROM lineitem
"""


def _h_missing(c: str) -> str:
    return f"({c} IS NULL OR trim(CAST({c} AS VARCHAR)) = '')"


def _health_sql() -> str:
    crit = _HEALTH_CRITICAL
    m_aggs = ",\n         ".join(
        f"SUM(CASE WHEN {_h_missing(c)} THEN 1 ELSE 0 END) AS m_{c}" for c in crit
    )
    p_aggs = ",\n         ".join(
        f"SUM(CASE WHEN {_h_missing(c)} THEN 0 ELSE 1 END) AS p_{c}" for c in crit
    )
    any_missing = " OR ".join(f"m2_{c} > 0" for c in crit)
    zeroed = ",\n         ".join(
        (
            f"CASE WHEN is_comp = 1 THEN 0 ELSE m_{c} END AS m2_{c}"
            if c == "albumartist"
            else f"m_{c} AS m2_{c}"
        )
        for c in crit
    )
    rad_aggs = ",\n        ".join(
        f"SUM(COALESCE(NULLIF(m2_{c}, 0), 0)) AS s_{c},"
        f" COUNT(NULLIF(m2_{c}, 0)) AS a_{c}"
        for c in crit
    )
    keep_t = ",\n        ".join(
        f"SUM(CASE WHEN {_h_missing(c)} THEN 0 ELSE 1 END) AS kt_{c}" for c in crit
    )
    keep_a = ",\n        ".join(
        f"AVG(p_{c} * 1.0 / NULLIF(n_tracks, 0)) AS ka_{c}" for c in crit
    )
    keep_rows = "\nUNION ALL\n".join(
        (
            f"SELECT 'keep_coverage' AS section, '{c}' AS col_name,\n"
            f"       CAST(ROUND(kt_{c} * 100.0 / track_count, 6) AS DOUBLE) AS track_pct,\n"
            f"       CAST(ROUND(ka_{c} * 100.0, 6) AS DOUBLE) AS album_pct\n"
            f"FROM keep_t, keep_a, tot"
        )
        if c in _HEALTH_CRITICAL
        else (
            f"SELECT 'keep_coverage', '{c}', CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)"
        )
        for c in _HEALTH_KEEP
    )
    radar_rows = "\nUNION ALL\n".join(
        f"SELECT 'radar_missing', '{c}',\n"
        f"       CAST(ROUND(s_{c} * 100.0 / "
        + ("aa_tracks" if c == "albumartist" else "track_count")
        + f", 6) AS DOUBLE),\n"
        f"       CAST(ROUND(a_{c} * 100.0 / "
        + (
            "(album_count - comp_albums)"
            if c == "albumartist"
            else "album_count"
        )
        + ", 6) AS DOUBLE)\n"
        "FROM rad, tot, ac"
        for c in crit
    )
    return f"""
WITH alib AS ({_HEALTH_ALIB_SQL}),
tot AS (SELECT COUNT(*) AS track_count,
               SUM(CASE WHEN COALESCE(CAST(compilation AS INTEGER), 0) != 1
                        THEN 1 ELSE 0 END) AS aa_tracks
        FROM alib),
roots AS (SELECT root, COUNT(*) AS n_tracks,
         MAX(COALESCE(CAST(compilation AS INTEGER), 0)) AS is_comp,
         {m_aggs},
         {p_aggs}
   FROM alib GROUP BY root),
ac AS (SELECT COUNT(*) AS album_count,
              SUM(CASE WHEN is_comp = 1 THEN 1 ELSE 0 END) AS comp_albums
       FROM roots),
rep AS (SELECT root, is_comp,
         {zeroed}
   FROM roots),
rep2 AS (SELECT * FROM rep WHERE {any_missing}),
rad AS (SELECT {rad_aggs} FROM rep2),
keep_t AS (SELECT {keep_t} FROM alib),
keep_a AS (SELECT {keep_a} FROM roots)
{keep_rows}
UNION ALL
{radar_rows}
"""


@q("r92_health_radar", _health_sql())
def r92_health_radar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library-health card metric assembly
    (92-report-library-health.py:123-188 keep-columns coverage,
    :410-455 radar metric vector, :364-407 denominators):

    - ``keep_coverage`` rows: per keep-column, % of tracks with a
      present (non-NULL, non-blank after trim) value, and the
      equal-weight-per-album average of per-album-root presence ratios;
      a keep-column absent from alib reports 0/0 (the reference's
      missing-column rule).
    - ``radar_missing`` rows: per critical column, the step-94 report's
      missing rates — track numerator SUM(COALESCE(col, 0)) and album
      numerator COUNT(col IS NOT NULL) over the exception-only report
      (0→NULL readability conversion included, hence NULLIF), with
      albumartist zeroed on compilation albums and its denominators
      restricted to non-compilation tracks/albums.

    Scale shape: one scan → one groupBy(album_root) plus one global
    aggregate; everything downstream operates on the per-album frame or
    single-row aggregates that cross-join via broadcast."""
    crit = list(_HEALTH_CRITICAL)
    li = load_table(spark, sf_dir, "lineitem")
    alib = li.select(
        F.concat(F.lit("d"), (F.col("l_orderkey") % 120).cast("string")).alias("root"),
        F.when(F.col("l_orderkey") % 5 == 0, F.lit(None).cast("string"))
        .when(F.col("l_orderkey") % 11 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("T"), F.col("l_orderkey").cast("string")))
        .alias("title"),
        F.when(F.col("l_partkey") % 7 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("A"), F.col("l_partkey").cast("string")))
        .alias("artist"),
        F.when(F.col("l_suppkey") % 13 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(F.lit("AA"), (F.col("l_orderkey") % 40).cast("string"))
        )
        .alias("albumartist"),
        F.when(F.col("l_linenumber") % 3 == 0, F.lit(" "))
        .otherwise(F.concat(F.lit("19"), (F.col("l_suppkey") % 90).cast("string")))
        .alias("year"),
        F.when(F.col("l_orderkey") % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("G"), (F.col("l_partkey") % 25).cast("string")))
        .alias("genre"),
        F.when(F.col("l_orderkey") % 9 == 0, F.lit("1"))
        .otherwise(F.lit("0"))
        .alias("compilation"),
    )

    def missing(c: str):
        return F.col(c).isNull() | (F.trim(F.col(c).cast("string")) == "")

    comp_i = F.coalesce(F.col("compilation").cast("int"), F.lit(0))
    tot = alib.agg(
        F.count(F.lit(1)).alias("track_count"),
        F.sum(F.when(comp_i != 1, 1).otherwise(0)).alias("aa_tracks"),
        *[
            F.sum(F.when(missing(c), 0).otherwise(1)).alias(f"kt_{c}")
            for c in crit
        ],
    )
    roots = alib.groupBy("root").agg(
        F.count(F.lit(1)).alias("n_tracks"),
        F.max(comp_i).alias("is_comp"),
        *[
            F.sum(F.when(missing(c), 1).otherwise(0)).alias(f"m_{c}")
            for c in crit
        ],
        *[
            F.sum(F.when(missing(c), 0).otherwise(1)).alias(f"p_{c}")
            for c in crit
        ],
    )
    ac = roots.agg(
        F.count(F.lit(1)).alias("album_count"),
        F.sum(F.when(F.col("is_comp") == 1, 1).otherwise(0)).alias("comp_albums"),
        *[
            F.avg(F.col(f"p_{c}") / F.nullif(F.col("n_tracks"), F.lit(0))).alias(
                f"ka_{c}"
            )
            for c in crit
        ],
    )
    zeroed = roots.select(
        "root",
        *[
            (
                F.when(F.col("is_comp") == 1, F.lit(0))
                .otherwise(F.col(f"m_{c}"))
                if c == "albumartist"
                else F.col(f"m_{c}")
            ).alias(f"m2_{c}")
            for c in crit
        ],
    )
    any_missing = None
    for c in crit:
        cond = F.col(f"m2_{c}") > 0
        any_missing = cond if any_missing is None else (any_missing | cond)
    rad = zeroed.filter(any_missing).agg(
        *[
            F.sum(F.coalesce(F.nullif(F.col(f"m2_{c}"), F.lit(0)), F.lit(0))).alias(
                f"s_{c}"
            )
            for c in crit
        ],
        *[
            F.count(F.nullif(F.col(f"m2_{c}"), F.lit(0))).alias(f"a_{c}")
            for c in crit
        ],
    )
    wide = tot.crossJoin(F.broadcast(ac)).crossJoin(F.broadcast(rad))
    rows = []
    for c in _HEALTH_KEEP:
        if c in _HEALTH_CRITICAL:
            rows.append(
                F.struct(
                    F.lit("keep_coverage").alias("section"),
                    F.lit(c).alias("col_name"),
                    F.round(F.col(f"kt_{c}") * 100.0 / F.col("track_count"), 6)
                    .cast("double")
                    .alias("track_pct"),
                    F.round(F.col(f"ka_{c}") * 100.0, 6)
                    .cast("double")
                    .alias("album_pct"),
                )
            )
        else:
            rows.append(
                F.struct(
                    F.lit("keep_coverage").alias("section"),
                    F.lit(c).alias("col_name"),
                    F.lit(0.0).alias("track_pct"),
                    F.lit(0.0).alias("album_pct"),
                )
            )
    for c in crit:
        t_den = F.col("aa_tracks") if c == "albumartist" else F.col("track_count")
        a_den = (
            F.col("album_count") - F.col("comp_albums")
            if c == "albumartist"
            else F.col("album_count")
        )
        rows.append(
            F.struct(
                F.lit("radar_missing").alias("section"),
                F.lit(c).alias("col_name"),
                F.round(F.col(f"s_{c}") * 100.0 / t_den, 6)
                .cast("double")
                .alias("track_pct"),
                F.round(F.col(f"a_{c}") * 100.0 / a_den, 6)
                .cast("double")
                .alias("album_pct"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.section", "r.col_name", "r.track_pct", "r.album_pct"
    )


# --------------------------------------------------------------------------
# 95: album-inconsistent tag values (A6)
# --------------------------------------------------------------------------

_R95_SQL = """
WITH alib AS (
  SELECT o_custkey AS album_key, o_orderpriority AS label FROM orders
), sigs AS (
  SELECT album_key, COUNT(DISTINCT label) AS n_variants,
         STRING_AGG(DISTINCT label, ' | ' ORDER BY label) AS variants
  FROM alib GROUP BY album_key
)
SELECT album_key, n_variants, variants FROM sigs WHERE n_variants > 1
"""


@q("r95_inconsistent_tags", _R95_SQL)
def r95_inconsistent_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report 95 (scripts/reports/95-...py:209-236): albums whose rows
    disagree on an album-level tag; the normalized variant list is the
    reviewable exception payload."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_custkey").alias("album_key"), F.col("o_orderpriority").alias("label"))
        .groupBy("album_key")
        .agg(
            F.countDistinct("label").alias("n_variants"),
            F.array_join(F.sort_array(F.collect_set("label")), " | ").alias(
                "variants"
            ),
        )
        .filter(F.col("n_variants") > 1)
    )


# --------------------------------------------------------------------------
# 96: duplicate tracks, global and intra-folder (A7)
# --------------------------------------------------------------------------

_R96_SQL = """
WITH alib AS (
  SELECT source AS folder, md5(text) AS sig, doc_id FROM documents
)
SELECT 'global' AS scope, sig, CAST(NULL AS VARCHAR) AS folder,
       COUNT(*) AS n, MIN(doc_id) AS keeper
FROM alib GROUP BY sig HAVING COUNT(*) > 1
UNION ALL
SELECT 'folder', sig, folder, COUNT(*), MIN(doc_id)
FROM alib GROUP BY folder, sig HAVING COUNT(*) > 1
"""


@q("r96_duplicate_tracks", _R96_SQL)
def r96_duplicate_tracks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Report 96 (scripts/reports/96-...py:182-205): md5-signature groups
    with >1 member, both globally and within a folder."""
    d = load_table(spark, sf_dir, "documents")
    alib = d.select(
        F.col("source").alias("folder"), F.md5("text").alias("sig"), "doc_id"
    )
    g = (
        alib.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n") > 1)
        .select(
            F.lit("global").alias("scope"),
            "sig",
            F.lit(None).cast("string").alias("folder"),
            "n",
            "keeper",
        )
    )
    f = (
        alib.groupBy("folder", "sig")
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n") > 1)
        .select(F.lit("folder").alias("scope"), "sig", "folder", "n", "keeper")
    )
    return g.unionByName(f)


# --------------------------------------------------------------------------
# A9: changelog summary
# --------------------------------------------------------------------------

_A9_SQL = """
WITH old AS (
  SELECT o_orderkey, o_orderpriority AS priority, o_orderstatus AS status FROM orders
), new AS (
  SELECT o_orderkey,
         regexp_replace(priority, '^[0-9]+-', '') AS priority,
         CASE WHEN status = 'P' THEN 'PENDING' ELSE status END AS status
  FROM old
), changelog AS (
  SELECT CAST(o.o_orderkey AS VARCHAR) AS alib_path, 'priority' AS alib_column,
         o.priority AS old_value, n.priority AS new_value
  FROM old o JOIN new n USING (o_orderkey)
  WHERE o.priority IS DISTINCT FROM n.priority
  UNION ALL
  SELECT CAST(o.o_orderkey AS VARCHAR), 'status', o.status, n.status
  FROM old o JOIN new n USING (o_orderkey)
  WHERE o.status IS DISTINCT FROM n.status
)
SELECT alib_column,
       COUNT(*) AS n_changes,
       COUNT(DISTINCT alib_path) AS n_paths,
       CAST(SUM(CASE WHEN old_value IS NULL AND new_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_adds,
       CAST(SUM(CASE WHEN old_value IS NOT NULL AND new_value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
       CAST(SUM(CASE WHEN old_value IS NOT NULL AND new_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_modifies
FROM changelog GROUP BY alib_column
"""


@q("a9_changelog_summary", _A9_SQL)
def a9_changelog_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog summary (A9, src/tagminder/core/tm_changelog.py:101-258):
    adds/deletes/modifies split per column over a real diff-audit pass —
    one aggregation over the changelog the c_diff_changelog query emits."""
    from tagminder_spark.queries.audit import c_diff_changelog

    ch = c_diff_changelog(spark, sf_dir)
    return ch.groupBy("alib_column").agg(
        F.count(F.lit(1)).alias("n_changes"),
        F.countDistinct("alib_path").alias("n_paths"),
        F.sum(
            (F.col("old_value").isNull() & F.col("new_value").isNotNull()).cast("int")
        ).alias("n_adds"),
        F.sum(
            (F.col("old_value").isNotNull() & F.col("new_value").isNull()).cast("int")
        ).alias("n_deletes"),
        F.sum(
            (F.col("old_value").isNotNull() & F.col("new_value").isNotNull()).cast(
                "int"
            )
        ).alias("n_modifies"),
    )


# --------------------------------------------------------------------------
# A18: covers detection (same work, many artists)
# --------------------------------------------------------------------------

_A18_SQL = """
WITH perf AS (
  SELECT DISTINCT 'W' || l_partkey AS work_key, 'A' || l_suppkey AS artist
  FROM lineitem
), grouped AS (
  SELECT work_key, COUNT(*) AS n_artists FROM perf GROUP BY work_key
), display AS (
  SELECT l.work_key, l.artist, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY l.work_key ORDER BY COUNT(*) DESC, l.artist) AS rn
  FROM (SELECT 'W' || l_partkey AS work_key, 'A' || l_suppkey AS artist FROM lineitem) l
  GROUP BY l.work_key, l.artist
)
SELECT g.work_key, g.n_artists, d.artist AS top_artist
FROM grouped g JOIN display d ON d.work_key = g.work_key AND d.rn = 1
WHERE g.n_artists >= 3
"""


@q("a18_covers_detection", _A18_SQL)
def a18_covers_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covers detection (A18, 92-library-insights.py:2928-2975): works
    performed by ≥N distinct artists, with the mode performer as the
    display representative (distinct-count + mode-window in one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    perf = li.select(
        F.concat(F.lit("W"), "l_partkey").alias("work_key"),
        F.concat(F.lit("A"), "l_suppkey").alias("artist"),
    )
    counts = perf.groupBy("work_key", "artist").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("work_key").orderBy(F.desc("n"), F.asc("artist"))
    top = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("work_key", F.col("artist").alias("top_artist"))
    )
    n_artists = (
        perf.distinct()
        .groupBy("work_key")
        .agg(F.count(F.lit(1)).alias("n_artists"))
        .filter(F.col("n_artists") >= 3)
    )
    return n_artists.join(top, "work_key").select(
        "work_key", "n_artists", "top_artist"
    )


# --------------------------------------------------------------------------
# §2.9: feature-based proximity edges with document-frequency bounds
# --------------------------------------------------------------------------

_GFEAT_SQL = """
WITH feats AS (
  SELECT DISTINCT p_partkey AS node, 'type:' || p_type AS feat FROM part
  UNION
  SELECT DISTINCT p_partkey, 'brand:' || p_brand FROM part
  UNION
  SELECT DISTINCT p_partkey, 'size:' || CAST(p_size AS VARCHAR) FROM part
), corpus AS (
  SELECT GREATEST(50, CAST(CEIL(0.05 * COUNT(*)) AS BIGINT)) AS max_df FROM part
), bounded AS (
  SELECT feat FROM feats, corpus GROUP BY feat, corpus.max_df
  HAVING COUNT(*) >= 2 AND COUNT(*) <= corpus.max_df
), edges AS (
  SELECT a.node AS src, b.node AS dst, COUNT(*) AS weight
  FROM feats a
  JOIN bounded bd ON bd.feat = a.feat
  JOIN feats b ON a.feat = b.feat AND a.node < b.node
  GROUP BY a.node, b.node
)
SELECT src, dst, weight FROM edges WHERE weight >= 2
"""


@q("g_feature_edges", _GFEAT_SQL)
def g_feature_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-proximity edges (tm_graph.py:319-430): explode features,
    enforce document-frequency bounds, self-join per feature, +1 weight
    per shared feature. The reference's Python pair loops become one
    equi-join.

    The upper DF bound is corpus-scaled — ``max(50, ceil(0.05 * n))`` —
    the reference's fixed 2..50 window only makes sense at its library
    sizes; a fixed cap excludes every feature at small SF (a vacuous
    gate) and admits stop-features at 100 TB. The bound is computed as a
    1-row aggregate broadcast into the DF filter, not a driver collect."""
    p = load_table(spark, sf_dir, "part")
    type_feats = p.select(
        F.col("p_partkey").alias("node"),
        F.concat(F.lit("type:"), F.col("p_type")).alias("feat"),
    )
    brand_feats = p.select(
        F.col("p_partkey").alias("node"),
        F.concat(F.lit("brand:"), F.col("p_brand")).alias("feat"),
    )
    size_feats = p.select(
        F.col("p_partkey").alias("node"),
        F.concat(F.lit("size:"), F.col("p_size").cast("string")).alias("feat"),
    )
    feats = type_feats.unionByName(brand_feats).unionByName(size_feats).distinct()
    corpus = p.agg(
        F.greatest(
            F.lit(50), F.ceil(F.count(F.lit(1)) * F.lit(0.05)).cast("long")
        ).alias("max_df")
    )
    bounded = (
        feats.groupBy("feat")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(corpus))
        .filter((F.col("df") >= 2) & (F.col("df") <= F.col("max_df")))
        .select("feat")
    )
    # both self-join sides would re-run the feature explode otherwise
    fb = scoped_persist(feats.join(F.broadcast(bounded), "feat"))
    a = fb.alias("a")
    b = fb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.feat") == F.col("b.feat")) & (F.col("a.node") < F.col("b.node")),
        )
        .groupBy(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= 2)
    )


# --------------------------------------------------------------------------
# J15: staged multi-source entity-resolution merge
# --------------------------------------------------------------------------

_J15_SQL = """
WITH suppliers AS (
  SELECT s_suppkey, s_name,
         s_nationkey + CASE WHEN s_suppkey % 4 = 0 THEN 100 ELSE 0 END AS nk
  FROM supplier
), phase1 AS (
  SELECT s.s_suppkey, s.s_name, s.nk, n.n_name AS exact_name
  FROM suppliers s LEFT JOIN nation n ON n.n_nationkey = s.nk
), phase2 AS (
  SELECT p.*, r.r_name AS region_name
  FROM phase1 p LEFT JOIN region r
    ON p.exact_name IS NULL AND r.r_regionkey = CAST(p.nk % 5 AS INT)
)
SELECT s_suppkey, s_name,
       COALESCE(exact_name, region_name, 'UNRESOLVED') AS resolved_name,
       CASE WHEN exact_name IS NOT NULL THEN 'exact'
            WHEN region_name IS NOT NULL THEN 'region-fallback'
            ELSE 'terminal' END AS resolve_phase
FROM phase2
"""


@q("j15_staged_merge", _J15_SQL)
def j15_staged_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged ER merge (J15, scripts/mdm/harvest/emit_contributors.py:
    1043-3014): exact-key bridge → coarser fallback join for the
    unresolved remainder → terminal default, with the resolution phase
    recorded per row (the reference's source-prefixed provenance)."""
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        (
            F.col("s_nationkey")
            + F.when(F.col("s_suppkey") % 4 == 0, F.lit(100)).otherwise(F.lit(0))
        ).alias("nk"),
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p1 = s.join(
        F.broadcast(n), s.nk == n.n_nationkey, "left"
    ).select("s_suppkey", "s_name", "nk", F.col("n_name").alias("exact_name"))
    p2 = p1.join(
        F.broadcast(r),
        p1.exact_name.isNull() & (r.r_regionkey == (p1.nk % 5).cast("int")),
        "left",
    ).select(
        "s_suppkey",
        "s_name",
        "exact_name",
        F.col("r_name").alias("region_name"),
    )
    return p2.select(
        "s_suppkey",
        "s_name",
        F.coalesce("exact_name", "region_name", F.lit("UNRESOLVED")).alias(
            "resolved_name"
        ),
        F.when(F.col("exact_name").isNotNull(), F.lit("exact"))
        .when(F.col("region_name").isNotNull(), F.lit("region-fallback"))
        .otherwise(F.lit("terminal"))
        .alias("resolve_phase"),
    )


# --------------------------------------------------------------------------
# 91-compare: per-column coverage deltas between two snapshot runs
# --------------------------------------------------------------------------

_R91_COLS = ("title", "artist", "year")

_R91_SQL = r"""
WITH alib_before AS (
  SELECT DISTINCT
         'p' || l_orderkey || '-' || l_linenumber AS __path,
         '/m/a' || CAST(l_orderkey % 200 AS VARCHAR) AS __dirpath,
         CASE WHEN l_orderkey % 4 = 0 THEN '' ELSE 'T' || l_orderkey END AS title,
         CASE WHEN l_orderkey % 3 = 0 THEN NULL
              ELSE 'A' || CAST(l_orderkey % 70 AS VARCHAR) END AS artist,
         CASE WHEN l_orderkey % 5 = 0 THEN '  '
              ELSE CAST(1960 + l_orderkey % 60 AS VARCHAR) END AS year
  FROM lineitem
), alib_after AS (
  SELECT __path, __dirpath,
         CASE WHEN title = '' AND CAST(substr(__path, 2, strpos(__path, '-') - 2) AS BIGINT) % 8 = 0
              THEN 'Fixed' ELSE title END AS title,
         COALESCE(artist, 'Inferred') AS artist,
         year
  FROM alib_before
), snap AS (
  SELECT phase, col,
         CAST(SUM(nonblank) AS DOUBLE) / COUNT(*) AS track_ratio,
         0 AS _pad
  FROM (
    SELECT phase, col,
           CASE WHEN v IS NULL OR trim(v) = '' OR trim(v) = '""' THEN 0 ELSE 1 END AS nonblank
    FROM (
      SELECT 'before' AS phase, __path, 'title' AS col, title AS v FROM alib_before
      UNION ALL SELECT 'before', __path, 'artist', artist FROM alib_before
      UNION ALL SELECT 'before', __path, 'year', year FROM alib_before
      UNION ALL SELECT 'after', __path, 'title', title FROM alib_after
      UNION ALL SELECT 'after', __path, 'artist', artist FROM alib_after
      UNION ALL SELECT 'after', __path, 'year', year FROM alib_after
    )
  ) GROUP BY phase, col
), albsnap AS (
  SELECT phase, col, AVG(ratio) AS album_ratio
  FROM (
    SELECT phase, col, __aroot,
           CAST(SUM(nonblank) AS DOUBLE) / COUNT(*) AS ratio
    FROM (
      SELECT phase, col, __dirpath AS __aroot,
             CASE WHEN v IS NULL OR trim(v) = '' OR trim(v) = '""' THEN 0 ELSE 1 END AS nonblank
      FROM (
        SELECT 'before' AS phase, __dirpath, 'title' AS col, title AS v FROM alib_before
        UNION ALL SELECT 'before', __dirpath, 'artist', artist FROM alib_before
        UNION ALL SELECT 'before', __dirpath, 'year', year FROM alib_before
        UNION ALL SELECT 'after', __dirpath, 'title', title FROM alib_after
        UNION ALL SELECT 'after', __dirpath, 'artist', artist FROM alib_after
        UNION ALL SELECT 'after', __dirpath, 'year', year FROM alib_after
      )
    ) GROUP BY phase, col, __aroot
  ) GROUP BY phase, col
), merged AS (
  SELECT s.col AS "column", s.phase, s.track_ratio, a.album_ratio
  FROM snap s JOIN albsnap a ON a.phase = s.phase AND a.col = s.col
)
SELECT b."column",
       b.track_ratio AS track_before, f.track_ratio AS track_after,
       f.track_ratio - b.track_ratio AS track_delta,
       b.album_ratio AS album_before, f.album_ratio AS album_after,
       f.album_ratio - b.album_ratio AS album_delta
FROM merged b JOIN merged f
  ON b."column" = f."column" AND b.phase = 'before' AND f.phase = 'after'
"""


@q("r91_snapshot_compare", _R91_SQL)
def r91_snapshot_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """91-compare data layer (scripts/snapshots/91-snapshot-library-
    health-after.py:820-1006): coverage_snapshot runs for a BEFORE and
    an AFTER library state, then per-column track/album coverage deltas.
    The AFTER state fills a deterministic subset of blanks (title for
    k%8 rows, every missing artist) so each delta is non-trivial."""
    from tagminder_spark.reports.snapshots import (  # noqa: PLC0415
        coverage_snapshot,
        snapshot_compare,
    )

    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    before = li.select(
        F.concat(F.lit("p"), k, F.lit("-"), F.col("l_linenumber")).alias("__path"),
        F.concat(F.lit("/m/a"), (k % 200).cast("string")).alias("__dirpath"),
        F.when(k % 4 == 0, F.lit("")).otherwise(F.concat(F.lit("T"), k)).alias("title"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("A"), (k % 70).cast("string")))
        .alias("artist"),
        F.when(k % 5 == 0, F.lit("  "))
        .otherwise((1960 + k % 60).cast("string"))
        .alias("year"),
    ).distinct()
    key_num = F.substring(F.col("__path"), 2, 100)
    key_num = F.split(key_num, "-").getItem(0).cast("bigint")
    after = before.select(
        "__path",
        "__dirpath",
        F.when((F.col("title") == "") & (key_num % 8 == 0), F.lit("Fixed"))
        .otherwise(F.col("title"))
        .alias("title"),
        F.coalesce(F.col("artist"), F.lit("Inferred")).alias("artist"),
        "year",
    )
    cols = list(_R91_COLS)
    snap_b = coverage_snapshot(before, cols, "run-b", "before")
    snap_a = coverage_snapshot(after, cols, "run-a", "after")
    return snapshot_compare(snap_b, snap_a, cols)
