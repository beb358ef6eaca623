"""Gate for the 5-phase entity-resolution merge (operators/er_merge.py;
reference scripts/mdm/harvest/emit_contributors.py:1043-3014).

The fixture synthesizes the three contributor sources from ``orders``
(modular key windows so matches are partial and every phase fires); the
oracle replays the identical staged SQL — positional ROW_NUMBER matching,
residual removal, uniqueness + consistency guards, coalesce enrichment,
residual allocation — so the merge is value-exact checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# Shared fixture (Spark selectExpr and DuckDB SQL are textual twins).
_MB_EXPRS = [
    "o_orderkey AS mb_id",
    # the 'Only' family is keyless (below) and absent from WD: reachable
    # exclusively through the terminal lower-name phase (4)
    "CASE WHEN (o_orderkey div 3) % 17 = 0"
    " THEN concat('Only ', CAST((o_orderkey div 3) % 120 AS STRING))"
    " WHEN (o_orderkey div 3) % 13 = 0 THEN NULL"
    " ELSE concat('Name ', CAST((o_orderkey div 3) % 600 AS STRING)) END AS name",
    "CASE WHEN (o_orderkey div 3) % 17 = 0 OR (o_orderkey div 3) % 5 = 0 THEN NULL"
    " ELSE concat('B', CAST((o_orderkey div 3) % 400 AS STRING)) END AS mbid",
    "CASE WHEN (o_orderkey div 3) % 17 = 0 OR (o_orderkey div 3) % 7 = 0 THEN NULL"
    " ELSE concat('Q', CAST((o_orderkey div 3) % 300 AS STRING)) END AS qid",
    "CASE WHEN (o_orderkey div 3) % 17 = 0 OR (o_orderkey div 3) % 11 = 0 THEN NULL"
    " ELSE concat('M', CAST((o_orderkey div 3) % 200 AS STRING)) END AS mnid",
]
_WD_EXPRS = [
    "o_orderkey AS wd_id",
    # names >= 500 are WD-blind: MB rows there can only reach AMG via the
    # terminal lower-name phase (4) once staged/keyed matching misses
    "CASE WHEN ((o_orderkey - 1) div 3) % 600 >= 500"
    " THEN concat('wdonly ', CAST((o_orderkey - 1) div 3 AS STRING))"
    " WHEN ((o_orderkey - 1) div 3) % 2 = 0"
    " THEN concat('Name ', CAST(((o_orderkey - 1) div 3) % 600 AS STRING))"
    " ELSE concat(' name  ', CAST(((o_orderkey - 1) div 3) % 600 AS STRING)) END AS name",
    "CASE WHEN ((o_orderkey - 1) div 3) % 4 = 0 THEN NULL"
    " ELSE concat('B', CAST(((o_orderkey - 1) div 3) % 400 AS STRING)) END AS mbid",
    "CASE WHEN ((o_orderkey - 1) div 3) % 6 = 0 THEN NULL"
    " ELSE concat('Q', CAST(((o_orderkey - 1) div 3) % 300 AS STRING)) END AS qid",
    "CASE WHEN ((o_orderkey - 1) div 3) % 9 = 0 THEN NULL"
    " ELSE concat('M', CAST(((o_orderkey - 1) div 3) % 200 AS STRING)) END AS mnid",
]
_AMG_EXPRS = [
    "m AS amg_id",
    "CASE WHEN m % 8 = 5 THEN concat('Only ', CAST((m * 7) % 120 AS STRING))"
    " WHEN m % 2 = 0 THEN concat('Name ', CAST((m * 3) % 600 AS STRING))"
    " ELSE concat('Zed ', CAST(m AS STRING)) END AS name",
    # MNID-less AMG rows are reachable only through the name phases (3/4);
    # 'Zed' names never match → residual allocation rows
    "CASE WHEN m % 4 = 0 OR m % 8 = 5 THEN NULL"
    " ELSE concat('M', CAST(m AS STRING)) END AS mnid",
]

_NORM = (
    "CASE WHEN {x} IS NULL OR trim(CAST({x} AS VARCHAR)) = '' THEN NULL"
    " ELSE lower(trim(regexp_replace(CAST({x} AS VARCHAR), '\\s+', ' ', 'g'))) END"
)


def _duck(e: str) -> str:
    """Translate the shared fixture exprs to DuckDB dialect."""
    return (
        e.replace(" div 3", " // 3")
        .replace("AS STRING", "AS VARCHAR")
        .replace("concat(", "CONCAT(")
    )


def _er_sql() -> str:
    n = _NORM
    mb_cols = ",\n         ".join(_duck(e) for e in _MB_EXPRS)
    wd_cols = ",\n         ".join(_duck(e) for e in _WD_EXPRS)
    amg_cols = ",\n         ".join(_duck(e) for e in _AMG_EXPRS)
    return f"""
WITH mb AS MATERIALIZED (
  SELECT {mb_cols}
  FROM orders WHERE o_orderkey % 3 = 0
), wd AS MATERIALIZED (
  SELECT {wd_cols}
  FROM orders WHERE o_orderkey % 3 = 1
), amg AS MATERIALIZED (
  SELECT {amg_cols}
  FROM (SELECT DISTINCT ((o_orderkey - 2) // 3) % 200 AS m
        FROM orders WHERE o_orderkey % 3 = 2)
), mbn AS MATERIALIZED (
  SELECT mb.*, {n.format(x='name')} AS name_n, {n.format(x='mbid')} AS mbid_n,
         {n.format(x='qid')} AS qid_n, {n.format(x='mnid')} AS mnid_n
  FROM mb
), wdn AS MATERIALIZED (
  SELECT wd.*, {n.format(x='name')} AS name_n, {n.format(x='mbid')} AS mbid_n,
         {n.format(x='qid')} AS qid_n, {n.format(x='mnid')} AS mnid_n
  FROM wd
), amgn AS MATERIALIZED (
  SELECT amg.*, {n.format(x='name')} AS name_n, {n.format(x='mnid')} AS mnid_n
  FROM amg
),
-- stage A: positional MB<->WD match, mbid -> qid -> mnid(null-mbid)
la1 AS MATERIALIZED (SELECT mb_id, mbid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY mbid_n ORDER BY mb_id) AS rn
        FROM mbn WHERE mbid_n IS NOT NULL),
ra1 AS MATERIALIZED (SELECT wd_id, mbid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY mbid_n ORDER BY wd_id) AS rn
        FROM wdn WHERE mbid_n IS NOT NULL),
sm1 AS MATERIALIZED (SELECT la1.mb_id, ra1.wd_id, 'mbid' AS match_stage
        FROM la1 JOIN ra1 USING (k, rn)),
-- quarantine 1 (emit_contributors.py:1138-1173): residual WD rows with a
-- duplicated QID leave the pool for good before the qid stage
wdp2 AS MATERIALIZED (SELECT * FROM wdn
        WHERE wd_id NOT IN (SELECT wd_id FROM sm1)),
dupq AS MATERIALIZED (SELECT qid_n FROM wdp2 WHERE qid_n IS NOT NULL
        GROUP BY qid_n HAVING COUNT(*) > 1),
wdp2q AS MATERIALIZED (SELECT * FROM wdp2
        WHERE qid_n IS NULL OR qid_n NOT IN (SELECT qid_n FROM dupq)),
la2 AS MATERIALIZED (SELECT mb_id, qid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY qid_n ORDER BY mb_id) AS rn
        FROM mbn WHERE qid_n IS NOT NULL
          AND mb_id NOT IN (SELECT mb_id FROM sm1)),
ra2 AS MATERIALIZED (SELECT wd_id, qid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY qid_n ORDER BY wd_id) AS rn
        FROM wdp2q WHERE qid_n IS NOT NULL),
sm2 AS MATERIALIZED (SELECT la2.mb_id, ra2.wd_id, 'qid' AS match_stage
        FROM la2 JOIN ra2 USING (k, rn)),
-- quarantine 2 (:1175-1210): duplicated MNIDs leave before the mnid stage
wdp3 AS MATERIALIZED (SELECT * FROM wdp2q
        WHERE wd_id NOT IN (SELECT wd_id FROM sm2)),
dupm AS MATERIALIZED (SELECT mnid_n FROM wdp3 WHERE mnid_n IS NOT NULL
        GROUP BY mnid_n HAVING COUNT(*) > 1),
wdp3q AS MATERIALIZED (SELECT * FROM wdp3
        WHERE mnid_n IS NULL OR mnid_n NOT IN (SELECT mnid_n FROM dupm)),
la3 AS MATERIALIZED (SELECT mb_id, mnid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY mnid_n ORDER BY mb_id) AS rn
        FROM mbn WHERE mnid_n IS NOT NULL
          AND mb_id NOT IN (SELECT mb_id FROM sm1 UNION ALL SELECT mb_id FROM sm2)),
ra3 AS MATERIALIZED (SELECT wd_id, mnid_n AS k,
               ROW_NUMBER() OVER (PARTITION BY mnid_n ORDER BY wd_id) AS rn
        FROM wdp3q WHERE mnid_n IS NOT NULL AND mbid_n IS NULL),
sm3 AS MATERIALIZED (SELECT la3.mb_id, ra3.wd_id, 'mnid' AS match_stage
        FROM la3 JOIN ra3 USING (k, rn)),
smatch AS MATERIALIZED (SELECT * FROM sm1 UNION ALL SELECT * FROM sm2 UNION ALL SELECT * FROM sm3),
-- the WD residual visible to phase 2 excludes quarantined rows
wdres AS MATERIALIZED (SELECT * FROM wdp3q
        WHERE wd_id NOT IN (SELECT wd_id FROM sm3)),
-- phase 1: MNID bridge over staged-WD rows
pm1 AS MATERIALIZED (
  SELECT s.mb_id, a.amg_id
  FROM smatch s JOIN wdn w ON w.wd_id = s.wd_id
  JOIN amgn a ON a.mnid_n = w.mnid_n
  WHERE w.mnid_n IS NOT NULL
),
-- phase 2: WD exact-name fallback (unique both sides + id consistency)
t2 AS MATERIALIZED (SELECT mb_id, name_n AS k, mbid_n, qid_n, mnid_n FROM mbn
       WHERE mb_id NOT IN (SELECT mb_id FROM smatch) AND name_n IS NOT NULL),
t2u AS MATERIALIZED (SELECT k FROM t2 GROUP BY k HAVING COUNT(*) = 1),
s2 AS MATERIALIZED (SELECT wd_id, name_n AS k, mbid_n, qid_n, mnid_n FROM wdres
       WHERE name_n IS NOT NULL),
s2u AS MATERIALIZED (SELECT k FROM s2 GROUP BY k HAVING COUNT(*) = 1),
pm2 AS MATERIALIZED (
  SELECT t2.mb_id, s2.wd_id
  FROM t2 JOIN t2u USING (k) JOIN s2 USING (k) JOIN s2u ON s2u.k = s2.k
  WHERE (CASE WHEN t2.mbid_n IS NOT NULL AND s2.mbid_n IS NOT NULL
              THEN t2.mbid_n = s2.mbid_n ELSE TRUE END)
    AND (CASE WHEN t2.qid_n IS NOT NULL AND s2.qid_n IS NOT NULL
              THEN t2.qid_n = s2.qid_n ELSE TRUE END)
    AND (CASE WHEN t2.mnid_n IS NOT NULL AND s2.mnid_n IS NOT NULL
              THEN t2.mnid_n = s2.mnid_n ELSE TRUE END)
),
wdmap AS MATERIALIZED (
  SELECT mb_id, wd_id, match_stage, 'staged' AS wd_phase FROM smatch
  UNION ALL
  SELECT mb_id, wd_id, NULL, 'wd_name' FROM pm2
),
-- phase 3: AMG exact-name via the WD label, rows not bridged
t3 AS MATERIALIZED (SELECT w.mb_id, wn.name_n AS k, m.mnid_n
       FROM wdmap w JOIN wdn wn ON wn.wd_id = w.wd_id
       JOIN mbn m ON m.mb_id = w.mb_id
       WHERE w.mb_id NOT IN (SELECT mb_id FROM pm1) AND wn.name_n IS NOT NULL),
t3u AS MATERIALIZED (SELECT k FROM t3 GROUP BY k HAVING COUNT(*) = 1),
s3 AS MATERIALIZED (SELECT amg_id, name_n AS k, mnid_n FROM amgn
       WHERE amg_id NOT IN (SELECT amg_id FROM pm1) AND name_n IS NOT NULL),
s3u AS MATERIALIZED (SELECT k FROM s3 GROUP BY k HAVING COUNT(*) = 1),
pm3 AS MATERIALIZED (
  SELECT t3.mb_id, s3.amg_id
  FROM t3 JOIN t3u USING (k) JOIN s3 USING (k) JOIN s3u ON s3u.k = s3.k
  WHERE (CASE WHEN t3.mnid_n IS NOT NULL AND s3.mnid_n IS NOT NULL
              THEN t3.mnid_n = s3.mnid_n ELSE TRUE END)
),
-- phase 4: terminal lower-name for MB-only rows
t4 AS MATERIALIZED (SELECT mb_id, name_n AS k, mnid_n FROM mbn
       WHERE mb_id NOT IN (SELECT mb_id FROM wdmap)
         AND mb_id NOT IN (SELECT mb_id FROM pm1 UNION ALL SELECT mb_id FROM pm3)
         AND name_n IS NOT NULL),
t4u AS MATERIALIZED (SELECT k FROM t4 GROUP BY k HAVING COUNT(*) = 1),
s4 AS MATERIALIZED (SELECT amg_id, name_n AS k, mnid_n FROM amgn
       WHERE amg_id NOT IN (SELECT amg_id FROM pm1 UNION ALL SELECT amg_id FROM pm3)
         AND name_n IS NOT NULL),
s4u AS MATERIALIZED (SELECT k FROM s4 GROUP BY k HAVING COUNT(*) = 1),
pm4 AS MATERIALIZED (
  SELECT t4.mb_id, s4.amg_id
  FROM t4 JOIN t4u USING (k) JOIN s4 USING (k) JOIN s4u ON s4u.k = s4.k
  WHERE (CASE WHEN t4.mnid_n IS NOT NULL AND s4.mnid_n IS NOT NULL
              THEN t4.mnid_n = s4.mnid_n ELSE TRUE END)
),
-- phase 5: allocation through the MB-side MNID
t5 AS MATERIALIZED (SELECT mb_id, mnid_n AS k FROM mbn
       WHERE mb_id NOT IN (SELECT mb_id FROM pm1 UNION ALL SELECT mb_id FROM pm3
                           UNION ALL SELECT mb_id FROM pm4)
         AND mnid_n IS NOT NULL),
pm5 AS MATERIALIZED (
  SELECT t5.mb_id, a.amg_id
  FROM t5 JOIN amgn a ON a.mnid_n = t5.k
  WHERE a.amg_id NOT IN (SELECT amg_id FROM pm1 UNION ALL SELECT amg_id FROM pm3
                         UNION ALL SELECT amg_id FROM pm4)
),
amgmap AS MATERIALIZED (
  SELECT mb_id, amg_id, 'bridge' AS amg_phase FROM pm1
  UNION ALL SELECT mb_id, amg_id, 'amg_name' FROM pm3
  UNION ALL SELECT mb_id, amg_id, 'amg_lower' FROM pm4
  UNION ALL SELECT mb_id, amg_id, 'allocation' FROM pm5
),
merged AS MATERIALIZED (
  SELECT 'mb:' || CAST(m.mb_id AS VARCHAR) AS contributor_row_id,
         1 AS has_musicbrainz_row,
         CASE WHEN w.wd_id IS NOT NULL THEN 1 ELSE 0 END AS has_wikimedia_row,
         CASE WHEN am.amg_id IS NOT NULL THEN 1 ELSE 0 END AS has_allmusic_row,
         w.match_stage, w.wd_phase, am.amg_phase,
         m.name AS musicbrainz_name, m.mbid AS musicbrainz_mbid,
         m.qid AS musicbrainz_qid, m.mnid AS musicbrainz_mnid,
         wn.name AS wikimedia_name, wn.mbid AS wikimedia_mbid,
         wn.qid AS wikimedia_qid, wn.mnid AS wikimedia_mnid,
         an.name AS allmusic_name, an.mnid AS allmusic_mnid
  FROM mbn m
  LEFT JOIN wdmap w ON w.mb_id = m.mb_id
  LEFT JOIN wdn wn ON wn.wd_id = w.wd_id
  LEFT JOIN amgmap am ON am.mb_id = m.mb_id
  LEFT JOIN amgn an ON an.amg_id = am.amg_id
),
residual AS MATERIALIZED (
  SELECT 'amg:' || CAST(a.amg_id AS VARCHAR) AS contributor_row_id,
         0, 0, 1, NULL, NULL, 'residual',
         NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
         a.name, a.mnid
  FROM amgn a
  WHERE a.amg_id NOT IN (SELECT amg_id FROM amgmap)
)
SELECT * FROM merged UNION ALL SELECT * FROM residual
"""


def _fixture(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F  # noqa: PLC0415

    o = load_table(spark, sf_dir, "orders")
    mb = o.where("o_orderkey % 3 = 0").selectExpr(*_MB_EXPRS)
    wd = o.where("o_orderkey % 3 = 1").selectExpr(*_WD_EXPRS)
    amg = (
        o.where("o_orderkey % 3 = 2")
        .selectExpr("((o_orderkey - 2) div 3) % 200 AS m")
        .distinct()
        .selectExpr(*_AMG_EXPRS)
    )
    return mb, wd, amg


@q("er_five_phase", _er_sql())
def er_five_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 5-phase contributor ER merge at fidelity (J15 deep form;
    emit_contributors.py:1669,1853,2164,2440,2615): staged positional
    mbid→qid→mnid matching with residual removal, MNID bridge, guarded
    exact-name fallbacks, terminal lower-name, allocation + residual
    append — all with source-prefixed columns and phase provenance."""
    from tagminder_spark.operators.er_merge import contributors_merge

    mb, wd, amg = _fixture(spark, sf_dir)
    return contributors_merge(mb, wd, amg)
