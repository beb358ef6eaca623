"""Master-data harvest/validation gates (SURVEY §2.1 S14 family):

- ``h_works_role_pairs`` — the per-work ``role:name`` multi-value
  emission (harvest_mb_works.py:526-600 aggregation loop,
  ``_mv_role_pairs`` :201-214, ``_mv_sorted_list`` :82-89).
- ``h_amg_todo`` — the AllMusic-MNID backlog export
  (amg_todo_list.py:134-193; output contract
  scripts/mdm/harvest/README.md:110-126).
- ``h_readiness`` — the master-data readiness report
  (check_master_data_readiness.py:106-165): requirement × presence
  left-probe emitting OK/MISSING with the owning script.

The reference builds these with driver-side dict loops over mbdump rows;
the Spark shape is one groupBy per emission (collect_set → sort →
join-with-delimiter) and plain anti-joins — all equi-keyed, no skew
risk (a work has bounded contributors)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
# per-work role:name emission
# --------------------------------------------------------------------------

_ROLES = ("composer", "lyricist", "arranger", "orchestrator", "translator", "")

_WRP_SQL = r"""
WITH refs AS (
  SELECT l_orderkey % 800 AS work_id,
         CASE CAST(l_partkey % 6 AS INT)
           WHEN 0 THEN 'composer' WHEN 1 THEN 'lyricist'
           WHEN 2 THEN 'arranger' WHEN 3 THEN 'orchestrator'
           WHEN 4 THEN 'translator' ELSE '' END AS role,
         CASE WHEN l_suppkey % 13 = 0 THEN '  '
              ELSE ' Artist ' || CAST(l_suppkey % 90 AS VARCHAR) || ' ' END
           AS artist_name,
         CASE WHEN l_suppkey % 17 = 0 THEN NULL
              ELSE 'mbid-' || CAST(l_suppkey % 90 AS VARCHAR) END
           AS artist_mbid
  FROM lineitem
), toks AS (
  SELECT work_id,
         trim(role) || ':' || trim(artist_name) AS tok
  FROM refs
  WHERE trim(role) <> '' AND trim(artist_name) <> ''
), mbids AS (
  SELECT work_id, trim(artist_mbid) AS mb
  FROM refs
  WHERE trim(role) <> '' AND artist_mbid IS NOT NULL
        AND trim(artist_mbid) <> ''
), pairs AS (
  SELECT work_id,
         STRING_AGG(DISTINCT tok, '\\' ORDER BY tok) AS role_pairs,
         CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_pairs
  FROM toks GROUP BY work_id
), mb_agg AS (
  SELECT work_id,
         STRING_AGG(DISTINCT mb, '\\' ORDER BY mb) AS role_mbids,
         CAST(COUNT(DISTINCT mb) AS BIGINT) AS n_mbids
  FROM mbids GROUP BY work_id
)
SELECT p.work_id, p.role_pairs, p.n_pairs,
       m.role_mbids, COALESCE(m.n_mbids, 0) AS n_mbids
FROM pairs p LEFT JOIN mb_agg m USING (work_id)
"""


@q("h_works_role_pairs", _WRP_SQL)
def h_works_role_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-work ``role:name`` emission (harvest_mb_works.py:526-551 →
    ``_mv_role_pairs`` :201-214): blank roles/names dropped, both sides
    trimmed, tokens deduplicated and sorted, joined with the MV
    delimiter; the parallel mbid set via ``_mv_sorted_list`` :82-89.
    The reference's nested defaultdict loops become one collect_set
    aggregate per emission."""
    li = load_table(spark, sf_dir, "lineitem")
    ok, pk, sk = F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey")
    refs = li.select(
        (ok % 800).alias("work_id"),
        F.element_at(
            F.array(*[F.lit(r) for r in _ROLES]), (pk % 6).cast("int") + 1
        ).alias("role"),
        F.when(sk % 13 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit(" Artist "), (sk % 90).cast("string"), F.lit(" ")))
        .alias("artist_name"),
        F.when(sk % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("mbid-"), (sk % 90).cast("string")))
        .alias("artist_mbid"),
    )
    toks = refs.filter(
        (F.trim("role") != "") & (F.trim("artist_name") != "")
    ).select(
        "work_id",
        F.concat(F.trim("role"), F.lit(":"), F.trim("artist_name")).alias("tok"),
    )
    mbids = refs.filter(
        (F.trim("role") != "")
        & F.col("artist_mbid").isNotNull()
        & (F.trim("artist_mbid") != "")
    ).select("work_id", F.trim("artist_mbid").alias("mb"))
    pairs = toks.groupBy("work_id").agg(
        F.array_join(F.sort_array(F.collect_set("tok")), D).alias("role_pairs"),
        F.count_distinct("tok").alias("n_pairs"),
    )
    mb_agg = mbids.groupBy("work_id").agg(
        F.array_join(F.sort_array(F.collect_set("mb")), D).alias("role_mbids"),
        F.count_distinct("mb").alias("n_mbids"),
    )
    return (
        pairs.join(mb_agg, "work_id", "left")
        .withColumn("n_mbids", F.coalesce(F.col("n_mbids"), F.lit(0)))
    )


# --------------------------------------------------------------------------
# amg_todo_list backlog export
# --------------------------------------------------------------------------

_TODO_SQL = r"""
WITH disambiguated AS (
  SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL
              ELSE ' MN' || CAST(c_custkey % 250 AS VARCHAR) || ' ' END
           AS allmusic_mnid,
         CASE WHEN c_custkey % 7 = 0
              THEN 'mn' || CAST((c_custkey + 3) % 250 AS VARCHAR) END
           AS musicbrainz_allmusic_mnid,
         CASE WHEN c_custkey % 11 = 0
              THEN 'MN' || CAST((c_custkey + 7) % 250 AS VARCHAR) END
           AS wikimedia_allmusic_mnid,
         'Artist ' || CAST(c_custkey % 300 AS VARCHAR) AS allmusic_artist,
         'https://allmusic.example/' || CAST(c_custkey % 300 AS VARCHAR)
           AS allmusic_url,
         '["g' || CAST(c_custkey % 9 AS VARCHAR) || '"]'
           AS allmusic_genres_json,
         '["s' || CAST(c_custkey % 9 AS VARCHAR) || '"]'
           AS allmusic_styles_json
  FROM customer
), namesakes AS (
  SELECT CASE WHEN s_suppkey % 4 = 0 THEN ''
              ELSE 'mn' || CAST(s_suppkey % 250 AS VARCHAR) END
           AS allmusic_mnid,
         CAST(NULL AS VARCHAR) AS musicbrainz_allmusic_mnid,
         'MN' || CAST((s_suppkey + 5) % 250 AS VARCHAR)
           AS wikimedia_allmusic_mnid,
         'NS Artist ' || CAST(s_suppkey % 120 AS VARCHAR) AS allmusic_artist,
         'https://allmusic.example/ns/' || CAST(s_suppkey % 120 AS VARCHAR)
           AS allmusic_url,
         CAST(NULL AS VARCHAR) AS allmusic_genres_json,
         CAST(NULL AS VARCHAR) AS allmusic_styles_json
  FROM supplier
), amg AS (
  SELECT 'mn' || CAST(n_nationkey * 7 AS VARCHAR) AS mnid FROM nation
), source_rows AS (
  SELECT 'allmusic_mnid' AS mnid_source, 'contributors_unified_disambiguated'
           AS source_table, lower(trim(allmusic_mnid)) AS allmusic_mnid,
         allmusic_artist, allmusic_url, allmusic_genres_json,
         allmusic_styles_json
  FROM disambiguated
  WHERE allmusic_mnid IS NOT NULL AND trim(allmusic_mnid) <> ''
  UNION ALL
  SELECT 'musicbrainz_allmusic_mnid', 'contributors_unified_disambiguated',
         lower(trim(musicbrainz_allmusic_mnid)), allmusic_artist,
         allmusic_url, allmusic_genres_json, allmusic_styles_json
  FROM disambiguated
  WHERE musicbrainz_allmusic_mnid IS NOT NULL
        AND trim(musicbrainz_allmusic_mnid) <> ''
  UNION ALL
  SELECT 'wikimedia_allmusic_mnid', 'contributors_unified_disambiguated',
         lower(trim(wikimedia_allmusic_mnid)), allmusic_artist,
         allmusic_url, allmusic_genres_json, allmusic_styles_json
  FROM disambiguated
  WHERE wikimedia_allmusic_mnid IS NOT NULL
        AND trim(wikimedia_allmusic_mnid) <> ''
  UNION ALL
  SELECT 'allmusic_mnid', 'contributors_unified_namesakes',
         lower(trim(allmusic_mnid)), allmusic_artist, allmusic_url,
         allmusic_genres_json, allmusic_styles_json
  FROM namesakes
  WHERE allmusic_mnid IS NOT NULL AND trim(allmusic_mnid) <> ''
  UNION ALL
  SELECT 'wikimedia_allmusic_mnid', 'contributors_unified_namesakes',
         lower(trim(wikimedia_allmusic_mnid)), allmusic_artist,
         allmusic_url, allmusic_genres_json, allmusic_styles_json
  FROM namesakes
  WHERE wikimedia_allmusic_mnid IS NOT NULL
        AND trim(wikimedia_allmusic_mnid) <> ''
), missing_rows AS (
  SELECT s.* FROM source_rows s
  WHERE NOT EXISTS (
    SELECT 1 FROM amg WHERE lower(trim(amg.mnid)) = s.allmusic_mnid
  )
)
SELECT mnid_source, source_table, allmusic_mnid,
       MAX(allmusic_artist) AS allmusic_artist,
       MAX(allmusic_url) AS allmusic_url,
       MAX(allmusic_genres_json) AS allmusic_genres_json,
       MAX(allmusic_styles_json) AS allmusic_styles_json
FROM missing_rows
GROUP BY mnid_source, source_table, allmusic_mnid
"""


@q("h_amg_todo", _TODO_SQL)
def h_amg_todo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllMusic-MNID backlog (amg_todo_list.py:134-193): union the three
    MNID columns across both contributor tables (lower/trim
    normalization, blank filter), anti-join the known ``amg_artists``
    MNIDs, and collapse to one row per (source, table, mnid) with MAX
    payloads — the exact TSV contract of README.md:110-126. The known
    set is a broadcast anti-join; the unions stay map-side."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    ck, sk = F.col("c_custkey"), F.col("s_suppkey")
    disamb = cust.select(
        F.when(ck % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit(" MN"), (ck % 250).cast("string"), F.lit(" ")))
        .alias("allmusic_mnid"),
        F.when(ck % 7 == 0, F.concat(F.lit("mn"), ((ck + 3) % 250).cast("string")))
        .alias("musicbrainz_allmusic_mnid"),
        F.when(ck % 11 == 0, F.concat(F.lit("MN"), ((ck + 7) % 250).cast("string")))
        .alias("wikimedia_allmusic_mnid"),
        F.concat(F.lit("Artist "), (ck % 300).cast("string")).alias(
            "allmusic_artist"
        ),
        F.concat(
            F.lit("https://allmusic.example/"), (ck % 300).cast("string")
        ).alias("allmusic_url"),
        F.concat(F.lit('["g'), (ck % 9).cast("string"), F.lit('"]')).alias(
            "allmusic_genres_json"
        ),
        F.concat(F.lit('["s'), (ck % 9).cast("string"), F.lit('"]')).alias(
            "allmusic_styles_json"
        ),
    )
    names = supp.select(
        F.when(sk % 4 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("mn"), (sk % 250).cast("string")))
        .alias("allmusic_mnid"),
        F.lit(None).cast("string").alias("musicbrainz_allmusic_mnid"),
        F.concat(F.lit("MN"), ((sk + 5) % 250).cast("string")).alias(
            "wikimedia_allmusic_mnid"
        ),
        F.concat(F.lit("NS Artist "), (sk % 120).cast("string")).alias(
            "allmusic_artist"
        ),
        F.concat(
            F.lit("https://allmusic.example/ns/"), (sk % 120).cast("string")
        ).alias("allmusic_url"),
        F.lit(None).cast("string").alias("allmusic_genres_json"),
        F.lit(None).cast("string").alias("allmusic_styles_json"),
    )
    amg = nat.select(
        F.lower(
            F.trim(F.concat(F.lit("mn"), (F.col("n_nationkey") * 7).cast("string")))
        ).alias("known_mnid")
    )

    payload = (
        "allmusic_artist", "allmusic_url", "allmusic_genres_json",
        "allmusic_styles_json",
    )

    def _src(df: DataFrame, table: str, col: str) -> DataFrame:
        return df.filter(
            F.col(col).isNotNull() & (F.trim(F.col(col)) != "")
        ).select(
            F.lit(col).alias("mnid_source"),
            F.lit(table).alias("source_table"),
            F.lower(F.trim(F.col(col))).alias("allmusic_mnid"),
            *payload,
        )

    srcs = [
        _src(disamb, "contributors_unified_disambiguated", c)
        for c in (
            "allmusic_mnid", "musicbrainz_allmusic_mnid",
            "wikimedia_allmusic_mnid",
        )
    ] + [
        _src(names, "contributors_unified_namesakes", c)
        for c in ("allmusic_mnid", "wikimedia_allmusic_mnid")
    ]
    rows = srcs[0]
    for s in srcs[1:]:
        rows = rows.unionByName(s)
    missing = rows.join(
        F.broadcast(amg),
        rows["allmusic_mnid"] == amg["known_mnid"],
        "left_anti",
    )
    return missing.groupBy("mnid_source", "source_table", "allmusic_mnid").agg(
        *[F.max(c).alias(c) for c in payload]
    )


# --------------------------------------------------------------------------
# master-data readiness report
# --------------------------------------------------------------------------

#: (req_id, table, owner) — check_master_data_readiness.py:32-104.
_REQUIREMENTS = (
    (1, "musicbrainz_artists", "harvest_mb_artists.py"),
    (2, "musicbrainz_artist_relationships", "harvest_mb_artists.py"),
    (3, "musicbrainz_artist_relationship_attributes", "harvest_mb_artists.py"),
    (4, "musicbrainz_work_artist_relationships", "harvest_mb_works.py"),
    (5, "musicbrainz_work_work_relationships", "harvest_mb_works.py"),
    (6, "musicbrainz_work_url_relationships", "harvest_mb_works.py"),
    (7, "musicbrainz_work_relationship_attributes", "harvest_mb_works.py"),
    (8, "contributors_unified_disambiguated", "emit_contributors.py"),
    (9, "contributors_unified_namesakes", "emit_contributors.py"),
)

_READY_SQL = (
    "WITH reqs(req_id, tbl, owner) AS (VALUES "
    + ", ".join(f"({i}, '{t}', '{o}')" for i, t, o in _REQUIREMENTS)
    + r"""
), present AS (
  SELECT DISTINCT c_custkey % 13 AS req_id FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_custkey % 3 = 0
)
SELECT r.tbl AS table_name, r.owner,
       CASE WHEN p.req_id IS NOT NULL THEN 'OK' ELSE 'MISSING' END AS status,
       CAST(COUNT(CASE WHEN p.req_id IS NULL THEN 1 END)
            OVER () AS BIGINT) AS n_missing,
       CAST(CASE WHEN COUNT(CASE WHEN p.req_id IS NULL THEN 1 END) OVER ()
                 > 0 THEN 1 ELSE 0 END AS INT) AS strict_exit
FROM reqs r LEFT JOIN present p USING (req_id)
"""
)


@q("h_readiness", _READY_SQL)
def h_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readiness report (check_master_data_readiness.py:106-165): each
    requirement probed for presence, OK/MISSING rows with the owning
    harvest script, the summary missing-count, and the ``--strict`` exit
    signal (1 iff anything is missing). Presence is a stand-in probe
    over the customer table (the container has no master-data SQLite);
    the requirement list is the reference's, broadcast to the probe."""
    cust = load_table(spark, sf_dir, "customer")
    reqs = cust.sparkSession.createDataFrame(
        list(_REQUIREMENTS), "req_id int, table_name string, owner string"
    )
    present = (
        cust.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & (F.col("c_custkey") % 3 == 0)
        )
        .select((F.col("c_custkey") % 13).cast("int").alias("req_id"))
        .distinct()
    )
    joined = reqs.join(present.withColumnRenamed("req_id", "p_id"),
                       reqs["req_id"] == F.col("p_id"), "left")
    from pyspark.sql import Window as W  # noqa: PLC0415

    n_missing = F.sum(
        F.when(F.col("p_id").isNull(), 1).otherwise(0)
    ).over(W.partitionBy())
    return joined.select(
        "table_name",
        "owner",
        F.when(F.col("p_id").isNotNull(), F.lit("OK"))
        .otherwise(F.lit("MISSING"))
        .alias("status"),
        n_missing.cast("long").alias("n_missing"),
        (n_missing > 0).cast("int").alias("strict_exit"),
    )


# --------------------------------------------------------------------------
# 89-validate-vetted multi-value validation
# --------------------------------------------------------------------------

_V89_SQL = r"""
WITH vetted AS (
  SELECT s_suppkey AS rowid,
         CASE CAST(s_suppkey % 5 AS INT)
           WHEN 0 THEN 'Solo ' || CAST(s_suppkey % 60 AS VARCHAR)
           WHEN 1 THEN 'Name ' || CAST(s_suppkey % 50 AS VARCHAR) || '\\'
                    || 'Name ' || CAST((s_suppkey + 1) % 50 AS VARCHAR)
           WHEN 2 THEN CASE WHEN s_suppkey % 2 = 0
                  THEN 'ZZ ' || CAST(s_suppkey AS VARCHAR) || '\\' || ' '
                  ELSE 'Name ' || CAST(s_suppkey % 50 AS VARCHAR)
                       || '\\' || '  ' || '\\'
                       || 'Name ' || CAST((s_suppkey + 1) % 50 AS VARCHAR) END
           WHEN 3 THEN 'Name ' || CAST(s_suppkey % 50 AS VARCHAR) || '\\'
                    || 'ZZ ' || CAST(s_suppkey % 90 AS VARCHAR)
           ELSE 'Name ' || CAST(s_suppkey % 50 AS VARCHAR) || '\\'
                    || 'Name ' || CAST((s_suppkey + 2) % 50 AS VARCHAR) END
           AS replacement_val,
         CASE WHEN s_suppkey % 5 = 4 THEN '1' END AS status
  FROM supplier
), entities AS (
  SELECT DISTINCT lower('Name ' || CAST(c_custkey % 50 AS VARCHAR)) AS ent
  FROM customer WHERE c_custkey % 50 < 45
), segs AS (
  SELECT rowid, trim(seg) AS seg, ord
  FROM vetted, LATERAL (
    SELECT unnest(string_split(replacement_val, '\\')) AS seg,
           generate_subscripts(string_split(replacement_val, '\\'), 1) AS ord
  )
  WHERE status IS NULL AND strpos(replacement_val, '\\') > 0
), empty_first AS (
  SELECT rowid, MIN(ord) AS e_ord FROM segs WHERE seg = '' GROUP BY rowid
), miss_first AS (
  SELECT rowid, MIN(ord) AS m_ord FROM segs
  WHERE seg <> '' AND lower(seg) NOT IN (SELECT ent FROM entities)
  GROUP BY rowid
), decided AS (
  SELECT v.rowid, v.replacement_val, v.status,
    CASE
      WHEN v.status IS NOT NULL OR v.replacement_val IS NULL
           OR strpos(v.replacement_val, '\\') = 0 THEN 'not_candidate'
      WHEN e.e_ord IS NOT NULL AND (m.m_ord IS NULL OR e.e_ord < m.m_ord)
           THEN 'empty_segments'
      WHEN m.m_ord IS NOT NULL THEN 'skipped_missing'
      ELSE 'accepted' END AS decision
  FROM vetted v
  LEFT JOIN empty_first e USING (rowid)
  LEFT JOIN miss_first m USING (rowid)
)
SELECT rowid, replacement_val,
       CASE decision WHEN 'accepted' THEN '1'
            WHEN 'empty_segments' THEN 'empty segments'
            ELSE status END AS status_out,
       decision
FROM decided
"""


@q("v89_validate_vetted", _V89_SQL)
def v89_validate_vetted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """89-validate-vetted-contributor-multi-values.py:79-121: delimited
    NULL-status vetted rows are accepted when every token resolves in
    the disambiguated entity set, rejected ('empty segments') on a blank
    segment, left pending on an unknown token — first offence in token
    order wins, exactly as the reference's per-token walk. The fixture
    carries all five outcomes, including an unknown-before-blank row
    that distinguishes ordered from unordered checking."""
    from tagminder_spark.pipeline.steps_contrib import (  # noqa: PLC0415
        validate_vetted_multivalues,
    )

    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    sk = F.col("s_suppkey")
    m5 = (sk % 5).cast("int")
    rv = (
        F.when(m5 == 0, F.concat(F.lit("Solo "), (sk % 60).cast("string")))
        .when(
            m5 == 1,
            F.concat(
                F.lit("Name "), (sk % 50).cast("string"), F.lit(D),
                F.lit("Name "), ((sk + 1) % 50).cast("string"),
            ),
        )
        .when(
            m5 == 2,
            F.when(
                sk % 2 == 0,
                F.concat(F.lit("ZZ "), sk.cast("string"), F.lit(D), F.lit(" ")),
            ).otherwise(
                F.concat(
                    F.lit("Name "), (sk % 50).cast("string"), F.lit(D),
                    F.lit("  "), F.lit(D),
                    F.lit("Name "), ((sk + 1) % 50).cast("string"),
                )
            ),
        )
        .when(
            m5 == 3,
            F.concat(
                F.lit("Name "), (sk % 50).cast("string"), F.lit(D),
                F.lit("ZZ "), (sk % 90).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("Name "), (sk % 50).cast("string"), F.lit(D),
                F.lit("Name "), ((sk + 2) % 50).cast("string"),
            )
        )
    )
    vetted = supp.select(
        sk.alias("rowid"),
        rv.alias("replacement_val"),
        F.when(sk % 5 == 4, F.lit("1")).alias("status"),
    )
    entities = cust.filter(F.col("c_custkey") % 50 < 45).select(
        F.concat(F.lit("Name "), (F.col("c_custkey") % 50).cast("string")).alias(
            "lpreferred_name"
        )
    )
    return validate_vetted_multivalues(vetted, entities).select(
        "rowid", "replacement_val", "status_out", "decision"
    )
