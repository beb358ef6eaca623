"""Scalar-function operator inventory (SURVEY.md §2.2 predicates + §2.8
string/date/array/json functions) exercised with DuckDB oracles.

Where the testdata lacks the reference's messy inputs (date shape soup,
blank variants, invalid md5 cells, multi-value strings), the query
synthesizes them *deterministically* from table columns — both the Spark
plan and the oracle build identical raw values, then apply the shared
expression under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tagminder_spark.functions.core import (
    MV_DELIM,
    album_root,
    blank_to_null,
    is_blank,
    md5_invalid,
    mv_tokens,
    truthy,
)
from tagminder_spark.functions.dates import normalize_date, normalize_year
from tagminder_spark.queries import QueryFn
from tagminder_spark.session import load_table

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# date normalization (step 20, scripts/pipeline/20-...py:95-221)
# --------------------------------------------------------------------------

_NORM_DATE_DUCK = """
CASE
  WHEN raw ~ '^[0-9]{{4}}$' THEN raw
  WHEN raw ~ '^[0-9]{{4}}-[0-9]{{2}}$' THEN substr(raw, 1, 4)
  WHEN regexp_replace(regexp_replace(raw,
         '^([0-9]{{4}})([0-9]{{2}})([0-9]{{2}})$', '\\1-\\2-\\3'),
         '^([0-9]{{4}})[/.]([0-9]{{2}})[/.]([0-9]{{2}})$', '\\1-\\2-\\3')
       ~ '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$'
  THEN regexp_replace(regexp_replace(raw,
         '^([0-9]{{4}})([0-9]{{2}})([0-9]{{2}})$', '\\1-\\2-\\3'),
         '^([0-9]{{4}})[/.]([0-9]{{2}})[/.]([0-9]{{2}})$', '\\1-\\2-\\3')
  ELSE NULL
END"""

_DATE_SQL = f"""
WITH raws AS (
  SELECT o_orderkey,
         CASE CAST(o_orderkey % 6 AS INT)
           WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d')
           WHEN 1 THEN strftime(o_orderdate, '%Y%m%d')
           WHEN 2 THEN strftime(o_orderdate, '%Y/%m/%d')
           WHEN 3 THEN strftime(o_orderdate, '%Y.%m.%d')
           WHEN 4 THEN strftime(o_orderdate, '%Y-%m')
           ELSE strftime(o_orderdate, '%Y')
         END AS raw
  FROM orders
)
SELECT o_orderkey, raw,
       {_NORM_DATE_DUCK.format()} AS norm_date,
       substr({_NORM_DATE_DUCK.format()}, 1, 4) AS norm_year
FROM raws
"""


@q("f_date_normalize", _DATE_SQL)
def f_date_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date canonicalization (step 20): every input shape the reference
    accepts (YYYYMMDD, YYYY/MM/DD, YYYY.MM.DD, YYYY-MM, YYYY) normalized
    to YYYY[-MM-DD] via the shared normalize_date/normalize_year
    expressions — regexp_replace + when chains, zero UDFs."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 6
    raw = (
        F.when(k == 0, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(k == 1, F.date_format("o_orderdate", "yyyyMMdd"))
        .when(k == 2, F.date_format("o_orderdate", "yyyy/MM/dd"))
        .when(k == 3, F.date_format("o_orderdate", "yyyy.MM.dd"))
        .when(k == 4, F.date_format("o_orderdate", "yyyy-MM"))
        .otherwise(F.date_format("o_orderdate", "yyyy"))
    )
    return o.select(
        "o_orderkey",
        raw.alias("raw"),
        normalize_date(raw).alias("norm_date"),
        normalize_year(raw).alias("norm_year"),
    )


# --------------------------------------------------------------------------
# album_root (src/tagminder/core/tm_album.py:30-47)
# --------------------------------------------------------------------------

_ROOT_SQL = """
WITH paths AS (
  SELECT doc_id,
         '/lib/' || source || '/album' || CAST(doc_id // 10 AS VARCHAR) ||
         CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN '/CD1' WHEN 1 THEN '/Disc 02'
           WHEN 2 THEN '/disc003' ELSE '' END AS path
  FROM documents
)
SELECT path,
       regexp_replace(path, '/(?:[Cc][Dd]|[Dd][Ii][Ss][Cc])\\s*0*[0-9]{1,3}$', '') AS root
FROM paths
"""


@q("f_album_root", _ROOT_SQL)
def f_album_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived grouping key of all album-level analytics: disc
    subfolders (CD1 / Disc 02 / disc003) roll up to the parent folder.
    One expression serves DataFrame and SQL use (the reference needed two
    implementations, scalar + vectorized)."""
    d = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 4).cast("int")
    suffix = (
        F.when(m == 0, F.lit("/CD1"))
        .when(m == 1, F.lit("/Disc 02"))
        .when(m == 2, F.lit("/disc003"))
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/lib/"),
        F.col("source"),
        F.lit("/album"),
        (F.col("doc_id") / 10).cast("long").cast("string"),
        suffix,
    )
    return d.select(path.alias("path"), album_root(path).alias("root"))


# --------------------------------------------------------------------------
# multi-value tokenizer (tm_polars.py:53-70; steps 17/04)
# --------------------------------------------------------------------------

_TOKENS_SQL = r"""
WITH t AS (
  SELECT doc_id, list_slice(string_split(text, ' '), 1, 8) AS toks FROM documents
), m AS (
  SELECT doc_id, list_concat(toks, [' ', toks[1]]) AS lst FROM t
), u AS (
  SELECT doc_id, trim(unnest(lst)) AS tok, generate_subscripts(lst, 1) AS ord FROM m
), f AS (
  SELECT doc_id, tok, MIN(ord) AS mo FROM u WHERE tok <> '' GROUP BY doc_id, tok
)
SELECT doc_id,
       STRING_AGG(tok, ', ' ORDER BY mo) AS toks_dedup,
       CAST(COUNT(*) AS INT) AS n_tokens
FROM f GROUP BY doc_id
"""


@q("f_tokens_dedup", _TOKENS_SQL)
def f_tokens_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-value cell codec (§1.1 key modeling decision): encode the
    first 8 words + a blank token + a duplicate into a ``\\\\``-delimited
    cell, then decode with mv_tokens — split → trim → drop-blank →
    order-preserving first-seen dedup (step 17's whole semantics,
    scripts/pipeline/17-dedupe-tags.py:74-93)."""
    d = load_table(spark, sf_dir, "documents")
    toks8 = F.slice(F.split(F.col("text"), " "), 1, 8)
    mv = F.concat_ws(
        MV_DELIM, F.concat(toks8, F.array(F.lit(" "), F.element_at(toks8, 1)))
    )
    arr = mv_tokens(mv)
    return d.select(
        "doc_id",
        F.array_join(arr, ", ").alias("toks_dedup"),
        F.size(arr).alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# string workhorse suite (§2.8)
# --------------------------------------------------------------------------

_STRING_SQL = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INT) AS name_len,
       regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_code,
       p_type || '|' || p_brand AS label,
       substr(p_name, 1, 5) AS name_head,
       translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
       CASE WHEN p_name LIKE 'small%' THEN 1 ELSE 0 END AS is_small,
       CASE WHEN contains(p_name, 'widget') THEN 1 ELSE 0 END AS has_widget
FROM part
"""


@q("f_string_suite", _STRING_SQL)
def f_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.8 string workhorses in one projection: regexp_extract,
    upper/length, suffix extraction, concat, substring, translate,
    startswith, contains — all codegen'd JVM expressions (the reference's
    pl.str.* surface)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_extract("p_brand", "([0-9]+)$", 1).alias("brand_code"),
        F.concat_ws("|", "p_type", "p_brand").alias("label"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_tr"),
        F.col("p_name").startswith("small").cast("int").alias("is_small"),
        F.col("p_name").contains("widget").cast("int").alias("has_widget"),
    )


# --------------------------------------------------------------------------
# JSON extraction (§2.8 map/json; 11-...py:253-266)
# --------------------------------------------------------------------------

_JSON_SQL = """
SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT) AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""


@q("f_json_extract", _JSON_SQL)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (the reference stores JSON arrays in TEXT cells,
    scripts/pipeline/11-...py:253-266): extract → type → derived bucket →
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k_bucket", F.floor(k / 10).cast("int"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# predicates: truthy, md5 validity, blank normalization (§2.2)
# --------------------------------------------------------------------------

_TRUTHY_SQL = """
WITH flags AS (
  SELECT event_type,
         CASE event_type WHEN 'click' THEN '1' WHEN 'view' THEN 'TRUE'
              WHEN 'signup' THEN 'Yes' WHEN 'purchase' THEN ' on '
              ELSE '' END AS flag_str
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CASE WHEN lower(trim(flag_str)) IN ('1','true','yes','y','t','on')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_truthy
FROM flags GROUP BY event_type
"""


@q("p_truthy_flags", _TRUTHY_SQL)
def p_truthy_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truthy flag parsing (P6, 92-library-insights.py:126-136): the
    compilation/live/bootleg/explicit text→0/1 rule over synthesized
    flag spellings."""
    ev = load_table(spark, sf_dir, "events")
    flag = (
        F.when(F.col("event_type") == "click", F.lit("1"))
        .when(F.col("event_type") == "view", F.lit("TRUE"))
        .when(F.col("event_type") == "signup", F.lit("Yes"))
        .when(F.col("event_type") == "purchase", F.lit(" on "))
        .otherwise(F.lit(""))
    )
    return (
        ev.withColumn("flag_str", flag)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(truthy(F.col("flag_str"))).alias("n_truthy"),
        )
    )


_MD5_SQL = """
WITH cells AS (
  SELECT source,
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN NULL WHEN 1 THEN '  ' WHEN 2 THEN '0'
           WHEN 3 THEN '0000-0000-' ELSE md5(text) END AS md5_cell
  FROM documents
)
SELECT source, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN md5_cell IS NULL OR trim(md5_cell) = '' OR trim(md5_cell) = '""'
                  OR regexp_replace(trim(md5_cell), '-', '', 'g') = '0'
                  OR regexp_matches(regexp_replace(trim(md5_cell), '-', '', 'g'), '^0+$')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
FROM cells GROUP BY source
"""


@q("p_md5_validity", _MD5_SQL)
def p_md5_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-signature validity predicate (P5, tm_polars.py:38-50) used by
    the duplicate reports 96/97: blank / '0' / all-zero-after-hyphen-strip
    cells are unusable."""
    d = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 5).cast("int")
    cell = (
        F.when(m == 0, F.lit(None).cast("string"))
        .when(m == 1, F.lit("  "))
        .when(m == 2, F.lit("0"))
        .when(m == 3, F.lit("0000-0000-"))
        .otherwise(F.md5("text"))
    )
    return (
        d.withColumn("md5_cell", cell)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(md5_invalid(F.col("md5_cell")).cast("int")).alias("n_invalid"),
        )
    )


_BLANK_SQL = """
WITH cells AS (
  SELECT source,
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN NULL WHEN 1 THEN '' WHEN 2 THEN '   '
           WHEN 3 THEN '""' ELSE lang END AS lang_cell
  FROM documents
)
SELECT source,
       CAST(SUM(CASE WHEN lang_cell IS NULL OR trim(lang_cell) = '' OR trim(lang_cell) = '""'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
       COUNT(CASE WHEN NOT (lang_cell IS NULL OR trim(lang_cell) = ''
                            OR trim(lang_cell) = '""') THEN 1 END) AS n_set
FROM cells GROUP BY source
"""


@q("p_blank_normalize", _BLANK_SQL)
def p_blank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blank-family normalization (P4, tm_changelog.py:65-82): NULL / '' /
    whitespace / literal '""' all canonicalize to NULL — the predicate
    every diff-audit compare runs through."""
    d = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 5).cast("int")
    cell = (
        F.when(m == 0, F.lit(None).cast("string"))
        .when(m == 1, F.lit(""))
        .when(m == 2, F.lit("   "))
        .when(m == 3, F.lit('""'))
        .otherwise(F.col("lang"))
    )
    return (
        d.withColumn("lang_cell", cell)
        .groupBy("source")
        .agg(
            F.sum(is_blank(F.col("lang_cell")).cast("int")).alias("n_blank"),
            F.count(blank_to_null(F.col("lang_cell"))).alias("n_set"),
        )
    )
