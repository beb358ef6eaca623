"""Source-format parity queries (SURVEY §2.1 S14/S15): the MusicBrainz
TSV dump reader (tab-separated, ``\\N`` nulls) and the Wikidata JSON-lines
reader (line-mode JSON + identity filter), each exercised on synthesized
raw lines so the *parsing semantics* — not the I/O — are what the oracle
pins. In production these are plain ``spark.read.option("sep","\\t").csv``
/ ``spark.read.json`` jobs; the driver testdata has no raw dump files, so
the queries parse constructed line columns with the same rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# S14: MB dump TSV member parse (tab sep, \N nulls)
# --------------------------------------------------------------------------

_S14_SQL = r"""
WITH raw AS (
  SELECT CAST(n_nationkey AS VARCHAR) || chr(9) || n_name || chr(9)
         || CASE WHEN n_nationkey % 3 = 0 THEN '\N' ELSE 'c' || n_regionkey END
           AS line
  FROM nation
), split_ AS (
  SELECT string_split(line, chr(9)) AS f FROM raw
)
SELECT CAST(f[1] AS BIGINT) AS entity_id,
       f[2] AS name,
       CASE WHEN f[3] = '\N' THEN NULL ELSE f[3] END AS comment
FROM split_
"""


@q("s14_tsv_parse", _S14_SQL)
def s14_tsv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14 (scripts/mdm/harvest/harvest_mb_works.py:257-475): MB dump
    member tables are tab-separated with literal ``\\N`` for NULL. The
    single-pass tar scan becomes a plain distributed text parse; this
    query pins the field-split + null-token semantics."""
    n = load_table(spark, sf_dir, "nation")
    raw = n.select(
        F.concat_ws(
            "\t",
            F.col("n_nationkey").cast("string"),
            F.col("n_name"),
            F.when(F.col("n_nationkey") % 3 == 0, F.lit(r"\N")).otherwise(
                F.concat(F.lit("c"), F.col("n_regionkey"))
            ),
        ).alias("line")
    )
    f = F.split(F.col("line"), "\t")
    return raw.select(
        F.element_at(f, 1).cast("bigint").alias("entity_id"),
        F.element_at(f, 2).alias("name"),
        F.nullif(F.element_at(f, 3), F.lit(r"\N")).alias("comment"),
    )


# --------------------------------------------------------------------------
# S15: Wikidata JSON-lines identity filter
# --------------------------------------------------------------------------

_S15_SQL = r"""
WITH raw AS (
  SELECT '{"id": "Q' || o_orderkey || '", "occupation": "'
         || CASE CAST(o_orderkey % 4 AS INT)
              WHEN 0 THEN 'musician' WHEN 1 THEN 'composer'
              WHEN 2 THEN 'painter' ELSE 'singer' END
         || '", "mbid": ' ||
         CASE WHEN o_orderkey % 5 = 0
              THEN '"mb-' || o_orderkey || '"' ELSE 'null' END || '}'
           AS line
  FROM orders
), parsed AS (
  SELECT json_extract_string(line, '$.id') AS qid,
         json_extract_string(line, '$.occupation') AS occupation,
         json_extract_string(line, '$.mbid') AS mbid
  FROM raw
)
SELECT qid, occupation, mbid
FROM parsed
WHERE occupation IN ('musician', 'composer', 'singer')
"""


@q("s15_jsonl_identity", _S15_SQL)
def s15_jsonl_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15 (scripts/mdm/harvest/harvest_wikimedia.py:1-30, 115-131):
    stream JSON lines, keep music-identity entities (occupation filter),
    project the identifiers. get_json_object keeps the parse JVM-side;
    the filter pushes below the projection."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    line = F.concat(
        F.lit('{"id": "Q'),
        k,
        F.lit('", "occupation": "'),
        F.when(k % 4 == 0, F.lit("musician"))
        .when(k % 4 == 1, F.lit("composer"))
        .when(k % 4 == 2, F.lit("painter"))
        .otherwise(F.lit("singer")),
        F.lit('", "mbid": '),
        F.when(k % 5 == 0, F.concat(F.lit('"mb-'), k, F.lit('"'))).otherwise(
            F.lit("null")
        ),
        F.lit("}"),
    )
    raw = o.select(line.alias("line"))
    parsed = raw.select(
        F.get_json_object("line", "$.id").alias("qid"),
        F.get_json_object("line", "$.occupation").alias("occupation"),
        F.get_json_object("line", "$.mbid").alias("mbid"),
    )
    return parsed.filter(
        F.col("occupation").isin("musician", "composer", "singer")
    )


_S3_SQL = """
SELECT '/lib/doc' || CAST(doc_id AS VARCHAR) || '.mp3' AS __path,
       'mp3' AS __filetype,
       CAST(octet_length(encode(text)) % 600 AS VARCHAR) AS __length_seconds,
       'doc' || CAST(doc_id AS VARCHAR) || '.mp3' AS title,
       CAST(octet_length(encode(text)) AS VARCHAR) AS extra_size
FROM documents
"""


@q("s3_tag_parse", _S3_SQL)
def s3_tag_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag-parse plumbing (S3, tags2db.py:478-512) value-checked end to
    end: a (path, content) catalog frame flows through the mapInPandas
    parser and the tags→columns pivot with the MapType overflow. The
    deterministic fallback parser (ext, size-derived length, basename
    title, __size overflow tag) is replayed exactly by the oracle, so
    the Arrow batching, tag-map shape, and column fan-out carry real
    data — only the mutagen kernel swaps in on a real library."""
    from tagminder_spark.sources.catalog import parse_tags, tags_to_columns

    d = load_table(spark, sf_dir, "documents")
    files = d.select(
        F.concat(F.lit("/lib/doc"), F.col("doc_id").cast("string"), F.lit(".mp3")).alias(
            "path"
        ),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )
    cols = tags_to_columns(parse_tags(files), ["title"])
    return cols.select(
        "__path",
        "__filetype",
        "__length_seconds",
        "title",
        F.element_at(F.col("__extra_tags"), "__size").alias("extra_size"),
    )


_S78_SQL = """
WITH scanned AS (
  SELECT '/lib/f' || CAST(doc_id AS VARCHAR) AS path,
         1700000000 + doc_id % 1000 AS mtime_epoch
  FROM documents WHERE doc_id % 5 <> 0
), existing AS (
  SELECT '/lib/f' || CAST(doc_id AS VARCHAR) AS __path,
         CAST(1700000000 + CASE WHEN doc_id % 3 = 0 THEN doc_id % 1000 - 7
                                ELSE doc_id % 1000 END AS VARCHAR)
           AS __file_mod_datetime_raw
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT 'modified' AS bucket, s.path
FROM scanned s JOIN existing e ON e.__path = s.path
WHERE CAST(s.mtime_epoch AS DOUBLE) > CAST(e.__file_mod_datetime_raw AS DOUBLE)
UNION ALL
SELECT 'orphan', e.__path
FROM existing e LEFT JOIN scanned s ON s.path = e.__path
WHERE s.path IS NULL
UNION ALL
SELECT 'new', s.path
FROM scanned s LEFT JOIN existing e ON e.__path = s.path
WHERE e.__path IS NULL
"""


@q("s78_incremental_sync", _S78_SQL)
def s78_incremental_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental catalog sync (S6/S7/S8, tags2db.py:955-1079): one gate
    covering new-files anti-join, modified-mtime inner join, and orphan
    prune over a synthesized scanned-vs-catalog pair (stale mtimes for
    doc_id%3 rows, scan misses %5, catalog misses %7)."""
    from tagminder_spark.sources.catalog import (
        incremental_modified,
        incremental_new,
        prune_orphans,
    )

    d = load_table(spark, sf_dir, "documents")
    scanned = d.filter(F.col("doc_id") % 5 != 0).select(
        F.concat(F.lit("/lib/f"), F.col("doc_id").cast("string")).alias("path"),
        (F.lit(1700000000) + F.col("doc_id") % 1000).alias("mtime_epoch"),
    )
    existing = d.filter(F.col("doc_id") % 7 != 0).select(
        F.concat(F.lit("/lib/f"), F.col("doc_id").cast("string")).alias("__path"),
        (
            F.lit(1700000000)
            + F.when(
                F.col("doc_id") % 3 == 0, F.col("doc_id") % 1000 - 7
            ).otherwise(F.col("doc_id") % 1000)
        )
        .cast("string")
        .alias("__file_mod_datetime_raw"),
    )
    modified = incremental_modified(scanned, existing).select(
        F.lit("modified").alias("bucket"), "path"
    )
    orphans = prune_orphans(existing, scanned).select(
        F.lit("orphan").alias("bucket"), F.col("__path").alias("path")
    )
    new = incremental_new(scanned, existing).select(
        F.lit("new").alias("bucket"), "path"
    )
    return modified.unionByName(orphans).unionByName(new)
